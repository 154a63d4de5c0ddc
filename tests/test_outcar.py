"""OUTCAR trajectory reader + cl.train/-r slicing (reference trains from
OUTCAR files directly, theforce/cl/README.md:330-337)."""

import textwrap

import numpy as np
import pytest

# Two ionic steps, 3 atoms (2 Cu + 1 O), realistic line shapes.
OUTCAR2 = textwrap.dedent(
    """\
     POTCAR:    PAW_PBE Cu 22Jun2005
     POTCAR:    PAW_PBE O 08Apr2002
     POTCAR:    PAW_PBE Cu 22Jun2005
     POTCAR:    PAW_PBE O 08Apr2002
       ions per type =               2   1

          direct lattice vectors                 reciprocal lattice vectors
         3.600000000  0.000000000  0.000000000     0.277777778  0.000000000  0.000000000
         0.000000000  3.600000000  0.000000000     0.000000000  0.277777778  0.000000000
         0.000000000  0.000000000  3.600000000     0.000000000  0.000000000  0.277777778

      in kB      10.0  20.0  30.0   1.0   2.0   3.0
     POSITION                                       TOTAL-FORCE (eV/Angst)
     -----------------------------------------------------------------------
          0.00000      0.00000      0.00000         0.10000      0.20000      0.30000
          1.80000      1.80000      0.00000        -0.05000     -0.10000     -0.15000
          1.80000      0.00000      1.80000        -0.05000     -0.10000     -0.15000
     -----------------------------------------------------------------------
      free  energy   TOTEN  =       -12.345678 eV

          direct lattice vectors                 reciprocal lattice vectors
         3.700000000  0.000000000  0.000000000     0.270270270  0.000000000  0.000000000
         0.000000000  3.700000000  0.000000000     0.000000000  0.270270270  0.000000000
         0.000000000  0.000000000  3.700000000     0.000000000  0.000000000  0.270270270

      in kB       5.0  15.0  25.0   0.5   1.5   2.5
     POSITION                                       TOTAL-FORCE (eV/Angst)
     -----------------------------------------------------------------------
          0.10000      0.00000      0.00000         0.01000      0.02000      0.03000
          1.85000      1.85000      0.00000        -0.00500     -0.01000     -0.01500
          1.85000      0.00000      1.85000        -0.00500     -0.01000     -0.01500
     -----------------------------------------------------------------------
      free  energy   TOTEN  =       -12.500000 eV
    """
)


@pytest.fixture
def outcar_path(tmp_path):
    p = tmp_path / "OUTCAR"
    p.write_text(OUTCAR2)
    return str(p)


def test_read_outcar_frames_two_steps(outcar_path):
    from autoforce_tpu.io.outcar import read_outcar_frames
    from autoforce_tpu.units import GPa

    frames = read_outcar_frames(outcar_path)
    assert len(frames) == 2
    s0, s1 = frames
    assert list(s0.numbers) == [29, 29, 8]
    assert np.allclose(s0.cell, np.eye(3) * 3.6)
    assert np.allclose(s1.cell, np.eye(3) * 3.7)
    assert s0.calc.results["energy"] == pytest.approx(-12.345678)
    assert s1.calc.results["energy"] == pytest.approx(-12.5)
    assert np.allclose(s0.calc.results["forces"][0], [0.1, 0.2, 0.3])
    assert np.allclose(s1.positions[0], [0.1, 0.0, 0.0])
    # stress belongs to its own step: XX YY ZZ XY YZ ZX -> Voigt
    assert s0.calc.results["stress"][0] == pytest.approx(-10.0 * 0.1 * GPa)
    assert s1.calc.results["stress"][0] == pytest.approx(-5.0 * 0.1 * GPa)
    assert s1.calc.results["stress"][3] == pytest.approx(-1.5 * 0.1 * GPa)


def test_read_outcar_frames_slice(outcar_path):
    from autoforce_tpu.io.outcar import parse_slice, read_outcar_frames

    last = read_outcar_frames(outcar_path, index=parse_slice("-1::"))
    assert len(last) == 1
    assert last[0].calc.results["energy"] == pytest.approx(-12.5)
    every2 = read_outcar_frames(outcar_path, index=parse_slice("0:2:2"))
    assert len(every2) == 1


def test_parse_slice_forms():
    from autoforce_tpu.io.outcar import parse_slice

    assert parse_slice("::") == slice(None, None, None)
    assert parse_slice("0:10:2") == slice(0, 10, 2)
    assert parse_slice(":-1:") == slice(None, -1, None)
    # bare integer = ONE frame index (reference -r 0 / -r -1 semantics,
    # theforce/cl/train.py:34-39 via ase.io.read)
    assert parse_slice("5") == 5
    assert parse_slice("-1") == -1
    assert parse_slice("0") == 0


def test_bare_int_index_selects_one_frame(outcar_path):
    from autoforce_tpu.io.outcar import parse_slice, read_outcar_frames

    first = read_outcar_frames(outcar_path, index=parse_slice("0"))
    assert len(first) == 1
    assert first[0].calc.results["energy"] == pytest.approx(-12.345678)
    last = read_outcar_frames(outcar_path, index=parse_slice("-1"))
    assert len(last) == 1
    assert last[0].calc.results["energy"] == pytest.approx(-12.5)


def test_repeated_species_blocks(tmp_path):
    """Legal repeated-species POSCARs (e.g. Cu O Cu) must not silently
    degrade to Z=1 training data."""
    from autoforce_tpu.io.outcar import read_outcar_frames

    head = ("POTCAR:    PAW_PBE Cu 22Jun2005\n"
            "POTCAR:    PAW_PBE O 08Apr2002\n"
            "POTCAR:    PAW_PBE Cu 22Jun2005\n")
    old_head = ("POTCAR:    PAW_PBE Cu 22Jun2005\n"
                "POTCAR:    PAW_PBE O 08Apr2002\n") * 2
    assert old_head in OUTCAR2
    text = OUTCAR2.replace(old_head, head + head).replace(
        "ions per type =               2   1",
        "ions per type =               1   1   1")
    p = tmp_path / "OUTCAR"
    p.write_text(text)
    frames = read_outcar_frames(str(p))
    assert list(frames[0].numbers) == [29, 8, 29]


def test_unresolvable_species_raises(tmp_path):
    """Species that cannot be resolved must error loudly, not train Z=1."""
    from autoforce_tpu.io.outcar import read_outcar_frames

    text = OUTCAR2.replace("ions per type =               2   1",
                           "ions per type =               1   1   1")
    p = tmp_path / "OUTCAR"
    p.write_text(text)
    with pytest.raises(ValueError, match="species"):
        read_outcar_frames(str(p))


def test_truncated_outcar_skips_incomplete_frame(outcar_path, tmp_path,
                                                 capsys):
    """A force table without its TOTEN (crashed run) is skipped, not
    emitted as an energy-less frame that breaks training later."""
    from autoforce_tpu.io.outcar import read_outcar_frames

    text = OUTCAR2[: OUTCAR2.rindex(" free  energy   TOTEN")]
    p = tmp_path / "OUTCAR.trunc"
    p.write_text(text)
    frames = read_outcar_frames(str(p))
    assert len(frames) == 1
    assert frames[0].calc.results["energy"] == pytest.approx(-12.345678)
    assert "incomplete" in capsys.readouterr().err


def test_cl_train_reads_outcar(outcar_path, tmp_path, monkeypatch):
    """cl.train -i OUTCAR trains on the parsed frames end to end."""
    monkeypatch.chdir(tmp_path)
    from autoforce_tpu import cl as cline
    from autoforce_tpu.cl.train import train

    cline.ARGS.clear()
    cline.ARGS.update(
        dict(
            kernel_kw=dict(cutoff=3.0, lmax=2, nmax=2),
            covariance=None,
            pckl="m.pckl",
            tape="m.sgpr",
            ediff=0.5,
        )
    )
    calc = train([outcar_path])
    ndata, m = calc.size
    assert ndata >= 1 and m >= 1
    # the stored targets drove the fit: prediction error is bounded
    from autoforce_tpu.cl.train import read_frames

    s = read_frames(outcar_path, index=slice(0, 1))[0]
    res = calc.calculate(s)
    assert np.isfinite(res["energy"])
    cline.ARGS.clear()
