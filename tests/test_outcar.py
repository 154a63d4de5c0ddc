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
    assert parse_slice("5") == slice(5, None, None)


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
