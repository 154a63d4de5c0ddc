"""Device-resident MD: exact agreement with the host integrator."""

import os

import numpy as np
import pytest

from autoforce_tpu import units
from autoforce_tpu.calculator.active import ActiveCalculator
from autoforce_tpu.calculator.oracles import LennardJones
from autoforce_tpu.md import VelocityVerlet
from autoforce_tpu.md.device_md import DeviceMD
from autoforce_tpu.system import bulk_fcc, maxwell_boltzmann_velocities


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("devmd"))
    os.chdir(tmp)
    lj = LennardJones(epsilon=0.15, sigma=2.3, rc=4.5)
    calc = ActiveCalculator(
        covariance=None, calculator=lj, logfile=None, pckl=None, tape=None,
        kernel_kw=dict(cutoff=4.5, lmax=2, nmax=2),
        ediff=0.02, ediff_tot=0.05, fdiff=0.06,
    )
    s = bulk_fcc("Cu", 3.6).repeat((2, 2, 2))
    s.rattle(0.05, seed=0)
    s.calc = calc
    from autoforce_tpu.md import Langevin

    maxwell_boltzmann_velocities(s, 300, seed=1)
    Langevin(s, 2 * units.fs, 300, friction=0.01, seed=2).run(20)
    return calc, s


def test_nve_matches_host(trained):
    calc, s0 = trained
    # inference-only copies with identical initial state
    calc._calc = None  # freeze learning
    s_dev = s0.copy()
    s_host = s0.copy()
    v0 = s0.get_velocities()
    s_dev.set_velocities(v0)
    s_host.set_velocities(v0)

    s_host.calc = calc
    VelocityVerlet(s_host, 1 * units.fs).run(8)
    pos_host = s_host.positions.copy()

    s_dev.calc = calc
    dyn = DeviceMD(s_dev, calc, dt=1 * units.fs, temperature_K=None,
                   chunk=8, check_beta=False)
    dyn.run(8)
    np.testing.assert_allclose(s_dev.positions, pos_host, atol=1e-7)
    calc._calc = LennardJones(epsilon=0.15, sigma=2.3, rc=4.5)


def test_device_langevin_stable(trained):
    calc, s0 = trained
    calc._calc = None
    s = s0.copy()
    maxwell_boltzmann_velocities(s, 300, seed=5)
    s.calc = calc
    dyn = DeviceMD(s, calc, dt=2 * units.fs, temperature_K=300,
                   friction=0.02, chunk=25, check_beta=False)
    dyn.run(100)
    assert dyn.nsteps == 100
    T = s.get_temperature()
    assert 50 < T < 900, T
    assert np.isfinite(s.positions).all()
    calc._calc = LennardJones(epsilon=0.15, sigma=2.3, rc=4.5)


def test_device_nhc_matches_host_nose_hoover(tmp_path, monkeypatch):
    """DeviceMD(thermostat='nhc') integrates the exact NHC math of the
    host NoseHooverNVT driver: identical trajectories."""
    monkeypatch.chdir(tmp_path)
    import numpy as np

    from autoforce_tpu import units
    from autoforce_tpu.calculator.active import ActiveCalculator
    from autoforce_tpu.calculator.oracles import LennardJones
    from autoforce_tpu.md.device_md import DeviceMD
    from autoforce_tpu.md.nose_hoover import NoseHooverNVT
    from autoforce_tpu.regression.sgpr import DataRecord, SgprModel
    from autoforce_tpu.system import bulk_fcc, maxwell_boltzmann_velocities

    from test_engine import env_from_system, make_engine

    lj = LennardJones(epsilon=0.15, sigma=2.3, rc=3.2)

    def fresh():
        eng = make_engine()
        model = SgprModel(eng)
        for seed in range(3):
            s = bulk_fcc("Cu", 3.6)
            s.rattle(0.08, seed=seed)
            model.add_inducing(env_from_system(eng, s, seed), remake=False)
        for seed in (7, 8):
            s = bulk_fcc("Cu", 3.6)
            s.rattle(0.08, seed=seed)
            s.calc = lj
            model.add_data(DataRecord.from_system(s), remake=False)
        model.make_munu(optimize=True, noise_f=0.01)
        calc = ActiveCalculator(covariance=model, calculator=None,
                                logfile=None, pckl=None, tape=None, skin=0.6)
        s = bulk_fcc("Cu", 3.6).repeat((2, 2, 2))
        s.rattle(0.03, seed=1)
        s.calc = calc
        maxwell_boltzmann_velocities(s, 300, seed=2)
        return calc, s

    tdamp = 60 * units.fs
    calc1, s1 = fresh()
    DeviceMD(s1, calc1, dt=2 * units.fs, temperature_K=300, chunk=25,
             check_beta=False, thermostat="nhc", tdamp=tdamp).run(50)

    calc2, s2 = fresh()
    NoseHooverNVT(s2, 2 * units.fs, temperature_K=300, tdamp=tdamp).run(50)

    np.testing.assert_allclose(s1.positions, s2.positions, atol=1e-8)
    np.testing.assert_allclose(
        s1.get_velocities(), s2.get_velocities(), atol=1e-8
    )


def test_device_md_refuses_meta_and_multitask(trained, tmp_path, monkeypatch):
    """Meta bias / multi-task combination live in the host calculate();
    the device chunk would silently drop them — must refuse loudly."""
    monkeypatch.chdir(tmp_path)
    import pytest as _pytest

    calc, s0 = trained
    s = s0.copy()
    meta0 = calc.meta

    class _FakeMeta:
        def __call__(self, c):
            return 0.0, None

    calc.meta = _FakeMeta()
    try:
        with _pytest.raises(NotImplementedError, match="metadynamics"):
            DeviceMD(s, calc, dt=1 * units.fs, check_beta=False)
        from autoforce_tpu.md.replica_md import ReplicaMD

        with _pytest.raises(NotImplementedError, match="metadynamics"):
            ReplicaMD([s], calc, dt=1 * units.fs)
    finally:
        calc.meta = meta0

    from autoforce_tpu.calculator.multitask import MultiTaskCalculator
    from autoforce_tpu.calculator.oracles import LennardJones

    # DYNAMIC multi-task (per-step weight schedules / bond restraints)
    # stays host-path; static-weight multi-task is served (see
    # test_device_md_multitask_static below)
    mt = MultiTaskCalculator(
        [LennardJones(rc=4.0), LennardJones(epsilon=0.2, rc=4.0)],
        kernel_kw=dict(cutoff=4.0, lmax=2, nmax=2),
        logfile=None, pckl=None, tape=None, ij=[(0, 1)],
    )
    with _pytest.raises(NotImplementedError, match="multi-task"):
        DeviceMD(s, mt, dt=1 * units.fs, check_beta=False)
    mt2 = MultiTaskCalculator(
        [LennardJones(rc=4.0), LennardJones(epsilon=0.2, rc=4.0)],
        kernel_kw=dict(cutoff=4.0, lmax=2, nmax=2),
        logfile=None, pckl=None, tape=None, weights_sample=100,
    )
    with _pytest.raises(NotImplementedError, match="multi-task"):
        DeviceMD(s, mt2, dt=1 * units.fs, check_beta=False)


def test_device_md_active_meta_matches_host(trained, tmp_path, monkeypatch):
    """ActiveMeta (uncertainty-seeking bias) fused into the device chunk:
    NVE trajectory == host driver applying engine.meta_covloss_fn
    per step."""
    monkeypatch.chdir(tmp_path)
    from autoforce_tpu.calculator.meta import ActiveMeta

    calc, s0 = trained
    calc._calc = None  # freeze learning
    calc.meta = ActiveMeta(scale=0.05)
    try:
        v0 = s0.get_velocities()
        s_host = s0.copy()
        s_host.set_velocities(v0)
        s_host.calc = calc
        VelocityVerlet(s_host, 1 * units.fs).run(8)
        pos_host = s_host.positions.copy()

        s_dev = s0.copy()
        s_dev.set_velocities(v0)
        s_dev.calc = calc
        dyn = DeviceMD(s_dev, calc, dt=1 * units.fs, temperature_K=None,
                       chunk=8, check_beta=False)
        assert dyn.meta_scale == 0.05
        dyn.run(8)
        np.testing.assert_allclose(s_dev.positions, pos_host, atol=1e-7)
        # the bias must actually bend the trajectory (non-trivial check)
        s_ref = s0.copy()
        s_ref.set_velocities(v0)
        calc.meta = None
        s_ref.calc = calc
        VelocityVerlet(s_ref, 1 * units.fs).run(8)
        assert np.abs(s_ref.positions - pos_host).max() > 1e-6
    finally:
        calc.meta = None
        from autoforce_tpu.calculator.oracles import LennardJones

        calc._calc = LennardJones(epsilon=0.15, sigma=2.3, rc=4.5)
