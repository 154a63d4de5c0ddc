"""Device-resident FIRE relaxation: exact agreement with the host
opt/fire.FIRE optimizer (same schedule, convergence checked before the
step), plus active-learning trips mid-relaxation."""

import numpy as np
import pytest

from autoforce_tpu.calculator.active import ActiveCalculator
from autoforce_tpu.calculator.oracles import LennardJones
from autoforce_tpu.opt import FIRE
from autoforce_tpu.opt.device_fire import DeviceFIRE
from autoforce_tpu.regression.sgpr import DataRecord, SgprModel
from autoforce_tpu.system import bulk_fcc


def _frozen_calc(skin=0.3):
    """Deterministic model (no on-the-fly sampling): the NVT test-suite
    recipe (tests/test_neighbors_device.py)."""
    import sys

    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from test_engine import env_from_system, make_engine

    lj = LennardJones(epsilon=0.15, sigma=2.3, rc=3.2)
    eng = make_engine()
    model = SgprModel(eng)
    for seed in range(3):
        s = bulk_fcc("Cu", 3.6)
        s.rattle(0.08, seed=seed)
        model.add_inducing(env_from_system(eng, s, seed % 4), remake=False)
    for seed in (7, 8):
        s = bulk_fcc("Cu", 3.6)
        s.rattle(0.08, seed=seed)
        s.calc = lj
        model.add_data(DataRecord.from_system(s), remake=False)
    model.make_munu(optimize=True, noise_f=0.01)
    return ActiveCalculator(covariance=model, calculator=None, logfile=None,
                            pckl=None, tape=None, skin=skin)


def test_device_fire_matches_host(tmp_path, monkeypatch):
    """Short-horizon EXACT tracking (the step math is the host FIRE's,
    bit for bit while no branch sits on an fp knife edge), then full
    relaxations land in the same minimum.  Whole-trajectory step-count
    equality is deliberately NOT asserted: FIRE's vf>0 branch is binary,
    and the host predict path vs the chunk's fused forces differ at the
    ~1e-15 reduce-order level, which forks the schedule when vf crosses
    zero — both forks descend to the same minimum."""
    monkeypatch.chdir(str(tmp_path))
    calc = _frozen_calc(skin=0.8)
    s0 = bulk_fcc("Cu", 3.6).repeat((2, 2, 2))
    s0.rattle(0.12, seed=5)

    # 1) exact 12-step tracking
    host = s0.copy()
    host.calc = calc
    opt = FIRE(host, dt=0.05)
    for _ in range(12):
        opt.step(host.get_forces())
        opt.nsteps += 1
    dev = s0.copy()
    dev.calc = calc
    dopt = DeviceFIRE(dev, calc, dt=0.05, chunk=5, check_beta=False)
    dopt.run(fmax=1e-9, steps=12)
    assert dopt.nsteps == 12
    np.testing.assert_allclose(dev.positions, host.positions, atol=1e-10)
    np.testing.assert_allclose(dopt.dt_cur, opt.dt, rtol=1e-12)
    np.testing.assert_allclose(dopt.a, opt.a, rtol=1e-12)
    assert int(dopt.n_uphill) == opt.n_uphill

    # 2) full relaxations reach the same minimum
    conv_host = opt.run(fmax=0.02, steps=150)
    conv_dev = dopt.run(fmax=0.02, steps=150)
    assert conv_host and conv_dev
    f = dev.get_forces()  # host-evaluated forces at the device minimum
    assert np.sqrt((f * f).sum(axis=1).max()) < 0.02
    np.testing.assert_allclose(dev.positions, host.positions, atol=0.05)
    # the relaxation actually moved the structure
    assert np.abs(dev.positions - s0.positions).max() > 1e-3


def test_device_fire_chunked_matches_one_shot(tmp_path, monkeypatch):
    """Chunk boundaries (state chaining) do not perturb the path."""
    monkeypatch.chdir(str(tmp_path))
    calc = _frozen_calc()
    results = []
    for chunk in (64, 7):
        s = bulk_fcc("Cu", 3.6).repeat((2, 2, 2))
        s.rattle(0.12, seed=5)
        s.calc = calc
        dopt = DeviceFIRE(s, calc, dt=0.05, chunk=chunk, check_beta=False)
        dopt.run(fmax=0.02, steps=64)
        results.append((s.positions.copy(), dopt.nsteps))
    np.testing.assert_allclose(results[0][0], results[1][0], atol=1e-9)
    assert results[0][1] == results[1][1]


def test_device_fire_active_learning(tmp_path, monkeypatch):
    """On-the-fly learning during a device relaxation: uncertainty trips
    hand the exact geometry to the host sampler, the model grows, and
    the relaxation converges on the refined surface."""
    monkeypatch.chdir(str(tmp_path))
    lj = LennardJones(epsilon=0.15, sigma=2.3, rc=4.5)
    calc = ActiveCalculator(
        covariance=None, calculator=lj, logfile="active.log", pckl=None,
        tape=None, kernel_kw=dict(cutoff=4.5, lmax=2, nmax=2),
        ediff=0.05, fdiff=0.1, seed=0,
    )
    s = bulk_fcc("Cu", 3.6).repeat((2, 2, 2))
    s.rattle(0.1, seed=3)
    s.calc = calc
    dopt = DeviceFIRE(s, calc, dt=0.05, chunk=20)
    dopt.run(fmax=0.05, steps=150)
    assert calc.model.m > 0  # sampling happened
    assert np.isfinite(s.positions).all()
    f = s.get_forces()
    assert np.sqrt((f * f).sum(axis=1).max()) < 0.2  # relaxed on the model


def test_device_fire_cell_matches_host_filter(tmp_path, monkeypatch):
    """cell=True: the on-chip UnitCellFilter composition tracks the host
    FIRE + UnitCellFilter exactly over a short horizon, and full runs
    land on the same (positions, cell) minimum."""
    monkeypatch.chdir(str(tmp_path))
    from autoforce_tpu.opt import UnitCellFilter

    calc = _frozen_calc(skin=0.8)

    def fresh():
        s = bulk_fcc("Cu", 3.65).repeat((2, 2, 2))
        s.rattle(0.06, seed=4)
        s.calc = calc
        return s

    host = fresh()
    filt = UnitCellFilter(host)
    opt = FIRE(filt, dt=0.05)
    for _ in range(12):
        opt.step(filt.get_forces())
        opt.nsteps += 1

    dev = fresh()
    dopt = DeviceFIRE(dev, calc, dt=0.05, chunk=5, check_beta=False,
                      cell=True)
    dopt.run(fmax=1e-9, steps=12)
    assert dopt.nsteps == 12
    np.testing.assert_allclose(dev.positions, host.positions, atol=1e-9)
    np.testing.assert_allclose(np.asarray(dev.cell), np.asarray(host.cell),
                               atol=1e-10)
    np.testing.assert_allclose(dopt.deform, filt.deform, atol=1e-12)
    np.testing.assert_allclose(dopt.dt_cur, opt.dt, rtol=1e-12)

    # full runs: same minimum (cell relaxes toward equilibrium volume)
    conv_h = opt.run(fmax=0.02, steps=300)
    conv_d = dopt.run(fmax=0.02, steps=300)
    assert conv_h and conv_d
    np.testing.assert_allclose(np.asarray(dev.cell), np.asarray(host.cell),
                               atol=0.02)
    cell_start = np.asarray(bulk_fcc("Cu", 3.65).repeat((2, 2, 2)).cell)
    assert np.abs(np.asarray(dev.cell) - cell_start).max() > 1e-3


def test_device_fire_cell_inloop_rebuild(tmp_path, monkeypatch):
    """cell=True with a small skin: the moving cell breaches the Verlet
    bound repeatedly, the in-loop (pos+cell) rebuild serves them, and
    the relaxation reaches the same minimum as a no-breach run."""
    monkeypatch.chdir(str(tmp_path))
    results = {}
    for skin in (0.10, 0.8):
        calc = _frozen_calc(skin=skin)
        s = bulk_fcc("Cu", 3.52).repeat((2, 2, 2))  # compressed start
        s.rattle(0.05, seed=6)
        s.calc = calc
        dopt = DeviceFIRE(s, calc, dt=0.05, chunk=30, check_beta=False,
                          cell=True)
        conv = dopt.run(fmax=0.03, steps=400)
        assert conv
        results[skin] = np.asarray(s.cell).copy()
        assert np.isfinite(s.positions).all()
    # same minimum through many in-loop rebuilds vs none
    np.testing.assert_allclose(results[0.10], results[0.8], atol=5e-3)
    # the cell actually relaxed away from the compressed start
    start = np.asarray(bulk_fcc("Cu", 3.52).repeat((2, 2, 2)).cell)
    assert np.abs(results[0.8] - start).max() > 5e-3


def test_device_fire_refuses_meta(tmp_path, monkeypatch):
    """(BCM committees are SERVED on-device now — see
    tests/test_bcm_multitask.py — only a metadynamics bias refuses.)"""
    monkeypatch.chdir(str(tmp_path))
    calc = _frozen_calc()
    s = bulk_fcc("Cu", 3.6).repeat((2, 2, 2))
    from autoforce_tpu.calculator.meta import Meta

    calc.meta = Meta.__new__(Meta)
    try:
        with pytest.raises(NotImplementedError):
            DeviceFIRE(s, calc, dt=0.05)
    finally:
        calc.meta = None
