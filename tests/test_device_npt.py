"""Device-resident isotropic MTK NPT: exact agreement with the host
MTKNPT driver (same Trotter splitting, same NHC chains, virial from the
shared backward pass)."""

import os

import numpy as np
import pytest

from autoforce_tpu import units
from autoforce_tpu.calculator.active import ActiveCalculator
from autoforce_tpu.calculator.oracles import LennardJones
from autoforce_tpu.md import Langevin, MTKNPT
from autoforce_tpu.md.device_npt import DeviceNPT
from autoforce_tpu.system import bulk_fcc, maxwell_boltzmann_velocities


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("devnpt"))
    os.chdir(tmp)
    lj = LennardJones(epsilon=0.15, sigma=2.3, rc=4.5)
    calc = ActiveCalculator(
        covariance=None, calculator=lj, logfile=None, pckl=None, tape=None,
        kernel_kw=dict(cutoff=4.5, lmax=2, nmax=2),
        ediff=0.02, ediff_tot=0.05, fdiff=0.06, seed=0,
    )
    s = bulk_fcc("Cu", 3.6).repeat((2, 2, 2))
    s.rattle(0.05, seed=0)
    s.calc = calc
    maxwell_boltzmann_velocities(s, 300, seed=1)
    Langevin(s, 2 * units.fs, 300, friction=0.01, seed=2).run(20)
    calc._calc = None  # freeze learning: deterministic comparisons
    return calc, s


def test_device_npt_matches_host_mtk(trained):
    calc, s0 = trained
    v0 = s0.get_velocities()
    kw = dict(temperature_K=300, pressure_GPa=0.5, tdamp=50 * units.fs,
              pdamp=200 * units.fs)

    host = s0.copy()
    host.set_velocities(v0)
    host.calc = calc
    drv = MTKNPT(host, 2 * units.fs, isotropic=True, **kw)
    drv.run(10)

    dev = s0.copy()
    dev.set_velocities(v0)
    dev.calc = calc
    dyn = DeviceNPT(dev, calc, 2 * units.fs, chunk=10, check_beta=False,
                    isotropic=True, **kw)
    dyn.run(10)
    assert dyn.nsteps == 10
    np.testing.assert_allclose(dev.positions, host.positions, atol=1e-8)
    np.testing.assert_allclose(np.asarray(dev.cell), np.asarray(host.cell),
                               atol=1e-10)
    np.testing.assert_allclose(dev.get_velocities(), host.get_velocities(),
                               atol=1e-8)
    # the cell must actually have moved under 0.5 GPa (non-trivial check)
    assert np.abs(np.asarray(dev.cell) - np.asarray(s0.cell)).max() > 1e-6
    # chain state agrees too (chained across the host boundary)
    np.testing.assert_allclose(dyn.vg, np.trace(drv.vg) / 3.0, atol=1e-12)
    np.testing.assert_allclose(dyn.nhc_vxi, drv.chain.vxi, atol=1e-10)
    np.testing.assert_allclose(dyn.bch_vxi, drv.bchain.vxi, atol=1e-10)


def test_device_npt_chunked_matches_one_shot(trained):
    """Chunk boundaries (state chaining + host re-entry) do not perturb
    the trajectory."""
    calc, s0 = trained
    v0 = s0.get_velocities()
    kw = dict(temperature_K=400, pressure_GPa=0.0, tdamp=50 * units.fs,
              pdamp=200 * units.fs, bulk_modulus_GPa=140.0)
    results = []
    for chunk in (12, 3):
        s = s0.copy()
        s.set_velocities(v0)
        s.calc = calc
        dyn = DeviceNPT(s, calc, 2 * units.fs, chunk=chunk,
                        check_beta=False, **kw)
        dyn.run(12)
        results.append((s.positions.copy(), np.asarray(s.cell).copy()))
    np.testing.assert_allclose(results[0][0], results[1][0], atol=1e-9)
    np.testing.assert_allclose(results[0][1], results[1][1], atol=1e-11)


def test_device_npt_aniso_matches_host_mtk(trained):
    """Flexible-cell (isotropic=False) device NPT == host MTKNPT: the
    3x3 strain-rate propagation (expm via eigh), the mask gating, and
    the virial TENSOR from the shared backward pass all agree."""
    calc, s0 = trained
    v0 = s0.get_velocities()
    for mask in (None, (1, 1, 0)):
        kw = dict(temperature_K=300, pressure_GPa=0.3, tdamp=50 * units.fs,
                  pdamp=200 * units.fs, mask=mask)

        host = s0.copy()
        host.set_velocities(v0)
        host.calc = calc
        drv = MTKNPT(host, 2 * units.fs, isotropic=False, **kw)
        drv.run(10)

        dev = s0.copy()
        dev.set_velocities(v0)
        dev.calc = calc
        dyn = DeviceNPT(dev, calc, 2 * units.fs, chunk=4, check_beta=False,
                        isotropic=False, **kw)
        dyn.run(10)
        assert dyn.nsteps == 10
        np.testing.assert_allclose(dev.positions, host.positions, atol=1e-8)
        np.testing.assert_allclose(np.asarray(dev.cell),
                                   np.asarray(host.cell), atol=1e-10)
        np.testing.assert_allclose(dev.get_velocities(),
                                   host.get_velocities(), atol=1e-8)
        np.testing.assert_allclose(dyn.vg, drv.vg, atol=1e-12)
        np.testing.assert_allclose(dyn.bch_vxi, drv.bchain.vxi, atol=1e-10)
    # unmasked: the rattled crystal's shear stress must tilt the cell
    # (off-diagonal strain — the flexible-cell physics is exercised)
    cell = np.asarray(dev.cell)  # last iteration ran mask=(1,1,0)
    c0 = np.asarray(s0.cell)
    assert np.abs(cell - c0)[:2, :2].max() > 1e-8
    # masked axis frozen: row/col 2 strain gated out
    np.testing.assert_allclose(cell[2], c0[2], atol=1e-12)
    np.testing.assert_allclose(cell[:, 2], c0[:, 2], atol=1e-12)


def test_device_npt_inloop_rebuild_equivalence(tmp_path, monkeypatch):
    """Skin breaches handled INSIDE the NPT chunk (device MIC build from
    the current positions AND cell) give the same trajectory as the host
    rebuild path, with full step accounting (no early chunk exits).
    The model is built deterministically (no active learning — sampling
    order is process-state dependent) so both runs share one surface."""
    monkeypatch.chdir(str(tmp_path))
    from autoforce_tpu.neighbors_device import device_rebuild_ok
    from autoforce_tpu.regression.sgpr import DataRecord, SgprModel

    from test_engine import env_from_system, make_engine

    lj = LennardJones(epsilon=0.15, sigma=2.3, rc=3.2)
    eng = make_engine()  # rc=3.2: MIC gate passes for the 7.2 A box
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
    calc = ActiveCalculator(covariance=model, calculator=None,
                            logfile=None, pckl=None, tape=None, skin=0.10)

    s0 = bulk_fcc("Cu", 3.6).repeat((2, 2, 2))
    s0.rattle(0.04, seed=1)
    maxwell_boltzmann_velocities(s0, 400, seed=2)
    assert device_rebuild_ok(s0.cell, s0.pbc, eng.params.rc + 0.10)
    results = {}
    for inloop in (False, True):
        s = s0.copy()
        s.set_velocities(s0.get_velocities())
        s.calc = calc
        dyn = DeviceNPT(s, calc, 2 * units.fs, temperature_K=400,
                        pressure_GPa=0.0, tdamp=50 * units.fs,
                        pdamp=100 * units.fs, chunk=20, check_beta=False,
                        in_loop_rebuild=inloop)
        assert dyn.in_loop_rebuild is inloop
        dyn.run(40)
        assert dyn.nsteps == 40
        # the 0.10 skin must actually have been breached (a rebuild ran)
        disp = np.abs(s.positions - s0.positions).max()
        assert disp > 0.05, disp
        results[inloop] = (s.positions.copy(), np.asarray(s.cell).copy())
    # the two modes rebuild with different builders (device MIC in-loop
    # vs host KD-tree) — valid-superset tables, identical physics up to
    # force summation order
    np.testing.assert_allclose(results[True][0], results[False][0],
                               atol=1e-6)
    np.testing.assert_allclose(results[True][1], results[False][1],
                               atol=1e-8)


def test_device_npt_equilibrates_pressure(trained):
    """Longer run with skin breaches (host rebuild path): the barostat
    relaxes the LJ crystal toward its zero-pressure volume and the run
    completes through table rebuilds."""
    calc, s0 = trained
    s = s0.copy()
    maxwell_boltzmann_velocities(s, 300, seed=7)
    s.calc = calc
    p0 = -np.mean(s.get_stress()[:3])
    dyn = DeviceNPT(s, calc, 2 * units.fs, temperature_K=300,
                    pressure_GPa=0.0, tdamp=50 * units.fs,
                    pdamp=100 * units.fs, chunk=40, check_beta=False)
    dyn.run(150)
    assert dyn.nsteps == 150
    p1 = -np.mean(s.get_stress()[:3])
    assert np.isfinite(s.positions).all()
    assert abs(p1) < abs(p0) or abs(p1) < 0.02  # eV/A^3; relaxing
    # refuses committees / meta / multitask like the other device drivers
    from autoforce_tpu.calculator.meta import Meta

    calc.meta = Meta.__new__(Meta)  # any non-ActiveMeta bias
    try:
        with pytest.raises(NotImplementedError):
            DeviceNPT(s, calc, 2 * units.fs, temperature_K=300)
    finally:
        calc.meta = None
