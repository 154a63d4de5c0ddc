"""Tape cross-compatibility against the REFERENCE's emission format.

``tests/fixtures/reference_format.sgpr`` is written in the exact format
the reference emits (constructed per theforce/io/sgprio.py:16-39 for
``local``/``params`` blocks and ASE's ``write_extxyz`` for ``atoms``
blocks, including the keys the repo writer does NOT emit: ``momenta``
columns and ``free_energy``); it also exercises recursive ``include:``
with a back-reference that must be deduped (sgprio.py:96-112).  The
writer-side test byte-checks this repo's emission against the
reference's format strings, so tapes flow BOTH ways.
"""

import os
import re

import numpy as np

from autoforce_tpu.io.tape import SgprTape

FIX = os.path.join(os.path.dirname(__file__), "fixtures",
                   "reference_format.sgpr")


def test_read_reference_format_fixture():
    data = SgprTape(FIX).read()
    kinds = [k for k, _ in data]
    # include: pulls reference_inc.sgpr (1 local) whose back-include of
    # the main tape is deduped — nothing appears twice
    assert kinds.count("params") == 1
    assert kinds.count("atoms") == 2
    assert kinds.count("local") == 2

    params = [o for k, o in data if k == "params"][0]
    assert params == {"ediff": 0.041, "fdiff": 0.082}

    frames = [o for k, o in data if k == "atoms"]
    s = frames[0]
    assert len(s) == 8 and set(s.numbers) == {29}
    # values parsed from the ASE-style comment line + body columns
    assert abs(s.calc.results["energy"] - (-7.63236357)) < 1e-8
    f = s.calc.results["forces"]
    assert f.shape == (8, 3)
    # forces column sits AFTER the momenta columns (Properties=
    # species:S:1:pos:R:3:momenta:R:3:forces:R:3) — a column-offset bug
    # would return momenta here
    assert abs(f[0, 0] - 0.11543135) < 1e-8
    assert abs(s.positions[0, 2] - 0.05123381) < 1e-8
    assert list(s.pbc) == [True, True, True]
    assert abs(np.asarray(s.cell)[0, 0] - 7.2) < 1e-8

    locs = [o for k, o in data if k == "local"]
    assert all(loc.number == 29 for loc in locs)
    assert locs[0].rvec.shape[1] == 3 and len(locs[0].numbers) >= 6


def test_include_tape_trains_from_reference_fixture(tmp_path, monkeypatch):
    """`include_tape` (the cl.build ingestion path) consumes the
    reference-format fixture end-to-end: FP frames become training data,
    local blocks become inducing LCEs, and the resulting model predicts
    finite energy/forces."""
    monkeypatch.chdir(tmp_path)
    from autoforce_tpu.calculator.active import ActiveCalculator

    calc = ActiveCalculator(
        covariance=None, calculator=None, logfile=None, pckl=None,
        tape=None, kernel_kw=dict(cutoff=5.0, lmax=3, nmax=3),
        noise_f=0.01,
    )
    calc.include_tape(FIX)
    ndata, m = calc.size
    # both frames replay through calculate(); the sampling policy may
    # veto near-duplicates (reference semantics), so >=1 data and the
    # fixture's explicit local blocks as inducing LCEs
    assert ndata >= 1
    assert m >= 2
    s = SgprTape(FIX).read()[1][1].copy()
    s.calc = calc
    e = s.get_potential_energy()
    f = s.get_forces()
    assert np.isfinite(e) and np.isfinite(f).all()


def test_writer_emits_reference_format(tmp_path):
    """Byte-level conformance of this repo's writer with the reference's
    emission rules (sgprio.py:16-21,70-88): block delimiters, the
    `{:4d}` species field and three `{:16.8f}` displacement fields per
    LCE line, and `key value` params lines."""
    from autoforce_tpu.calculator.oracles import LennardJones
    from autoforce_tpu.regression.sgpr import InducingEnv
    from autoforce_tpu.system import bulk_fcc

    path = str(tmp_path / "emit.sgpr")
    tape = SgprTape(path)
    rng = np.random.default_rng(0)
    rvec = rng.normal(0, 1.5, (5, 3))
    env = InducingEnv.from_arrays(29, rvec, np.full(5, 29))
    tape.write_params(ediff=0.05, fdiff=0.1)
    tape.write(env)
    from autoforce_tpu.system import SinglePointCalculator

    s = bulk_fcc("Cu", 3.6)
    s.calc = LennardJones(epsilon=0.15, sigma=2.3, rc=4.5)
    # production tape writes carry a SinglePointCalculator snapshot
    # (active.py:528,703) — replicate that here
    s.calc = SinglePointCalculator(
        s, energy=s.get_potential_energy(), forces=s.get_forces()
    )
    tape.write(s)

    text = open(path).read()
    # reference delimiters: blank line + start:/end: pairs
    assert "\nstart: params\nediff 0.05\nfdiff 0.1\nend: params\n" in text
    m = re.search(r"\nstart: local\n(.*?)end: local\n", text, re.S)
    assert m
    lines = m.group(1).splitlines()
    # first line: `{:4d}` central species
    assert lines[0] == f"{29:4d}"
    for ln, r in zip(lines[1:], rvec):
        assert ln == "{:4d} {:16.8f} {:16.8f} {:16.8f}".format(29, *r)
    # atoms block is extxyz the reference's ASE reader accepts
    m = re.search(r"\nstart: atoms\n(.*?)end: atoms\n", text, re.S)
    body = m.group(1).splitlines()
    assert int(body[0]) == len(s)
    assert "Properties=species:S:1:pos:R:3:forces:R:3" in body[1]
    assert 'Lattice="' in body[1] and "energy=" in body[1]

    # and the repo reader round-trips its own emission (both directions)
    back = SgprTape(path).read()
    assert [k for k, _ in back] == ["params", "local", "atoms"]
    np.testing.assert_allclose(back[1][1].rvec, rvec, atol=5e-8)


def test_include_tape_species_growth_mid_stream(tmp_path, monkeypatch):
    """ADVICE r4 (high): a tape that introduces a NEW species after
    inducing/data were already committed must flush the pending LCE
    batch at the OLD species table BEFORE growing it — staging pended
    LCEs post-growth while model.X/data cfgs are pre-growth raised a
    descriptor-dimension mismatch (or computed wrong kernel columns)."""
    monkeypatch.chdir(tmp_path)
    from autoforce_tpu.calculator.active import ActiveCalculator
    from autoforce_tpu.calculator.oracles import MixtureLennardJones
    from autoforce_tpu.io.tape import SgprTape
    from autoforce_tpu.regression.sgpr import InducingEnv
    from autoforce_tpu.system import SinglePointCalculator, bulk_fcc

    rng = np.random.default_rng(3)
    path = str(tmp_path / "grow.sgpr")
    tape = SgprTape(path)
    oracle = MixtureLennardJones(
        {(29, 29): 0.15, (47, 47): 0.12, (79, 79): 0.13},
        {(29, 29): 2.3, (47, 47): 2.6, (79, 79): 2.5}, rc=4.0,
    )

    def frame(numbers_patch):
        s = bulk_fcc("Cu", 3.6).repeat((2, 1, 1))
        for i, z in numbers_patch.items():
            s.numbers[i] = z
        s.rattle(0.06, seed=int(rng.integers(1000)))
        s.calc = oracle
        s.calc = SinglePointCalculator(
            s, energy=s.get_potential_energy(), forces=s.get_forces()
        )
        return s

    def env(z, nbr):
        rv = rng.normal(0, 1.4, (6, 3))
        return InducingEnv.from_arrays(z, rv, np.full(6, nbr))

    # stage 1: pure Cu inducing + data committed
    tape.write(env(29, 29))
    tape.write(env(29, 29))
    tape.write(frame({}))
    # stage 2: Ag appears in LCE blocks (grows the table mid-stream,
    # with a PENDING Cu LCE in the same batch)
    tape.write(env(29, 29))
    tape.write(env(47, 29))
    tape.write(frame({0: 47}))
    # stage 3: a third species (3+-species tapes were the ADVICE case)
    tape.write(env(79, 47))
    tape.write(frame({0: 47, 3: 79}))

    calc = ActiveCalculator(
        covariance=None, calculator=None, logfile=None, pckl=None,
        tape=None, kernel_kw=dict(cutoff=4.0, lmax=2, nmax=2),
        noise_f=0.01,
    )
    calc.include_tape(path)  # raised ValueError (shape mismatch) before
    assert sorted(calc.engine.species) == [29, 47, 79]
    ndata, m = calc.size
    assert ndata >= 2 and m >= 3
    # model serves finite physics on a 3-species probe
    s = frame({0: 47, 3: 79}).copy()
    s.calc = calc
    assert np.isfinite(s.get_potential_energy())
    assert np.isfinite(s.get_forces()).all()
