"""Coverage for the small aux modules: analysis/simplesim, analysis/
statsutil, profiling, calculator/vasp (OUTCAR parse + subprocess
round-trip), calculator/scripts, and cl/device_wrap's stepping loop."""

import os
import textwrap

import numpy as np
import pytest

from autoforce_tpu.analysis.simplesim import SimpleSim
from autoforce_tpu.analysis.statsutil import (
    OnlineCov,
    autocorrelation,
    block_error,
    moving_average,
)
from autoforce_tpu.profiling import Stopwatch
from autoforce_tpu.system import bulk_fcc


# ------------------------------------------------------------ simplesim
def test_simplesim_self_similarity_and_symmetry():
    s = bulk_fcc("Cu", 3.6).repeat((2, 2, 2))
    s.rattle(0.05, seed=0)
    sim = SimpleSim(s, cutoff=4.5)
    # normalized kernel: diagonal exactly 1, symmetric, in (0, 1]
    assert sim(0, 0) == pytest.approx(1.0)
    assert sim(0, 3) == pytest.approx(sim(3, 0))
    assert 0.0 < sim(0, 3) <= 1.0 + 1e-12


def test_simplesim_distinguishes_perturbed_environment():
    s = bulk_fcc("Cu", 3.6).repeat((2, 2, 2))
    ideal = SimpleSim(s, cutoff=4.5)
    # all environments identical in the perfect crystal
    assert ideal(0, 5) == pytest.approx(1.0, abs=1e-9)
    p = s.copy()
    p.positions[0] += [0.4, 0.0, 0.0]
    pert = SimpleSim(p, cutoff=4.5)
    assert pert(0, 5) < ideal(0, 5) - 1e-3


# ------------------------------------------------------------ statsutil
def test_moving_average_matches_convolution():
    x = np.arange(10.0)
    got = moving_average(x, 3)
    want = np.convolve(x, np.ones(3) / 3, mode="valid")
    assert np.allclose(got, want)


def test_online_cov_matches_numpy():
    rng = np.random.default_rng(0)
    ys = rng.normal(size=(200, 3))
    oc = OnlineCov()
    for y in ys:
        oc(y)
    want = np.cov(ys.T, bias=True)
    assert np.allclose(oc.mat, want, atol=1e-10)
    w, v = oc.eig
    assert np.all(w[:-1] <= w[1:] + 1e-12)


def test_block_error_uncorrelated_series():
    rng = np.random.default_rng(1)
    x = rng.normal(size=4000)
    se = block_error(x, nblocks=10)
    # for iid data the block SEM estimates sigma/sqrt(n)
    assert se == pytest.approx(x.std() / np.sqrt(len(x)), rel=0.8)


def test_autocorrelation_lag0_and_decay():
    rng = np.random.default_rng(2)
    x = rng.normal(size=1000)
    ac = autocorrelation(x, maxlag=10)
    assert ac[0] == pytest.approx(1.0)
    assert np.all(np.abs(ac[1:]) < 0.2)


# ------------------------------------------------------------ profiling
def test_stopwatch_accumulates_phases():
    sw = Stopwatch()
    with sw("a"):
        pass
    with sw("a"):
        pass
    with sw("b"):
        pass
    rep = sw.report()
    assert rep["a"]["calls"] == 2 and rep["b"]["calls"] == 1
    assert rep["a"]["total_s"] >= 0.0 and "mean_ms" in rep["a"]


# ------------------------------------------------------------ vasp
OUTCAR = textwrap.dedent(
    """\
      in kB      10.0  20.0  30.0   1.0   2.0   3.0
     POSITION                                       TOTAL-FORCE (eV/Angst)
     -----------------------------------------------------------------------
          0.0 0.0 0.0         0.10 0.20 0.30
          1.0 1.0 1.0        -0.10 -0.20 -0.30
     -----------------------------------------------------------------------
      free  energy   TOTEN  =       -12.345678 eV
    """
)


def test_read_outcar_parses_energy_forces_stress(tmp_path):
    from autoforce_tpu.calculator.vasp import read_outcar
    from autoforce_tpu.units import GPa

    path = tmp_path / "OUTCAR"
    path.write_text(OUTCAR)
    e, f, s = read_outcar(str(path))
    assert e == pytest.approx(-12.345678)
    assert f.shape == (2, 3)
    assert np.allclose(f[0], [0.1, 0.2, 0.3])
    # OUTCAR order XX YY ZZ XY YZ ZX (kB) -> Voigt xx yy zz yz zx xy, eV/A^3
    assert s[0] == pytest.approx(-10.0 * 1e-1 * GPa)
    assert s[3] == pytest.approx(-2.0 * 1e-1 * GPa)  # yz
    assert s[5] == pytest.approx(-1.0 * 1e-1 * GPa)  # xy


def test_vasp_calculator_subprocess_roundtrip(tmp_path, monkeypatch):
    """POSCAR write -> fake VASP command -> OUTCAR parse, end to end."""
    from autoforce_tpu.calculator.vasp import VaspCalculator

    monkeypatch.chdir(tmp_path)
    fake = tmp_path / "fake_vasp.py"
    fake.write_text(
        "import pathlib\n"
        "assert pathlib.Path('POSCAR').exists()\n"
        f"pathlib.Path('OUTCAR').write_text({OUTCAR!r})\n"
    )
    calc = VaspCalculator(directory=str(tmp_path / "run"),
                          command=f"python {fake}")
    s = bulk_fcc("Cu", 3.6)
    out = calc.calculate(s)
    assert out["energy"] == pytest.approx(-12.345678)
    assert out["forces"].shape == (2, 3)
    assert "stress" in out


# ------------------------------------------------------------ oracle scripts
@pytest.mark.parametrize("name", ["emt", "lj", "zero"])
def test_oracle_scripts_expose_working_calc(name):
    import importlib

    mod = importlib.import_module(f"autoforce_tpu.calculator.scripts.{name}")
    s = bulk_fcc("Cu", 3.6).repeat((2, 2, 2))
    s.rattle(0.02, seed=0)
    out = mod.calc.calculate(s)
    assert np.isfinite(out["energy"])
    assert np.asarray(out["forces"]).shape == (len(s), 3)


# ------------------------------------------------------------ device_wrap
def test_run_device_md_stepping_loop(monkeypatch):
    """The cl.md DEVICE dispatch: step accounting, frame cadence, and the
    replica branch's system fan-out (MD engines mocked out)."""
    from autoforce_tpu.cl import device_wrap

    calls = {"steps": [], "frames": 0, "systems": None}

    class FakeDyn:
        def __init__(self, atoms_or_systems, calc, dt, **kw):
            if isinstance(atoms_or_systems, list):
                calls["systems"] = atoms_or_systems
        def run(self, n):
            calls["steps"].append(n)

    monkeypatch.setattr(device_wrap, "DeviceMD", FakeDyn)
    import autoforce_tpu.md.replica_md as rmd
    monkeypatch.setattr(rmd, "ReplicaMD", FakeDyn)

    s = bulk_fcc("Cu", 3.6).repeat((2, 2, 2))
    s.calc = None

    def frame():
        calls["frames"] += 1

    # picos < 0 means -steps (reference cl/md.py convention)
    device_wrap.run_device_md(s, None, dt=2.0, temperature_K=300,
                              friction=0.02, picos=-120, write_frame=frame,
                              loginterval=50)
    assert sum(calls["steps"]) == 120
    assert calls["frames"] == len(calls["steps"])

    calls["steps"].clear()
    device_wrap.run_device_md(s, None, dt=2.0, temperature_K=300,
                              friction=0.02, picos=-60, write_frame=frame,
                              loginterval=25, replicas=3)
    assert sum(calls["steps"]) == 60
    assert len(calls["systems"]) == 3
    # replica copies are rattled: not bit-identical to the input
    assert not np.allclose(calls["systems"][1].positions, s.positions)
