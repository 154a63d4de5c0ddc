"""Active sampling UNDER the device NPT / FIRE / NEB drivers
(check_beta=True, the default): the uncertainty trip fires mid-chunk,
control returns to the host, the calculator samples, and the driver
resumes with its own state (barostat chains / FIRE clock) intact.

VERDICT r3 item #4: these mirror tests/test_device_active.py for the
three drivers that previously only ran with check_beta=False.  Reference
semantics: sampling gates live inside ``calculate``
(theforce/calculator/active.py:477-491) so ANY driver that calls back
into the calculator at the trip step samples at the exact step the host
driver would have.
"""

import numpy as np
import pytest

from autoforce_tpu import units
from autoforce_tpu.calculator.active import ActiveCalculator
from autoforce_tpu.system import bulk_fcc, maxwell_boltzmann_velocities

from test_multispecies import EPS, SIG, BinaryLJ, mixture


def _fresh_calc(oracle):
    return ActiveCalculator(
        covariance=None, calculator=oracle, logfile="active.log",
        pckl=None, tape=None,
        kernel_kw=dict(cutoff=4.5, lmax=3, nmax=3),
        ediff=0.02, ediff_tot=0.05, fdiff=0.08, noise_f=0.01,
    )


def test_active_device_npt(tmp_path, monkeypatch):
    """Uncertainty-trip sampling during device NPT: the model grows from
    seed, the run completes every step, and the thermostat/barostat
    chain state survives the host round trips."""
    monkeypatch.chdir(tmp_path)
    from autoforce_tpu.md.device_npt import DeviceNPT

    oracle = BinaryLJ(EPS, SIG)
    calc = _fresh_calc(oracle)
    s = mixture(11)
    s.calc = calc
    maxwell_boltzmann_velocities(s, 250, seed=12)
    dyn = DeviceNPT(s, calc, 2 * units.fs, temperature_K=250,
                    pressure_GPa=0.0, tdamp=25 * units.fs,
                    pdamp=100 * units.fs, chunk=15, isotropic=True)
    assert dyn.check_beta  # the default for an active calculator
    cell0 = np.asarray(s.cell).copy()
    dyn.run(60)
    assert dyn.nsteps == 60
    ndata, m = calc.size
    assert m >= 2 and ndata >= 1
    # several host re-entries (trips and/or chunk boundaries) happened
    assert calc.event_counts["calculate"] >= 2
    assert np.isfinite(s.positions).all()
    # barostat acted and its chain state is live (survived re-entries)
    assert not np.allclose(np.asarray(s.cell), cell0)
    assert abs(dyn.vg) > 0 or np.abs(dyn.nhc_vxi).max() > 0
    # accuracy vs oracle after on-the-fly learning under NPT
    tmp_s = s.copy()
    tmp_s.calc = oracle
    res = calc.calculate(s)
    f_mae = np.abs(res["forces"] - tmp_s.get_forces()).mean()
    assert f_mae < 0.3, f_mae
    log = open("active.log").read()
    assert "added indu" in log or "seed size" in log


def test_active_device_fire(tmp_path, monkeypatch):
    """Uncertainty-trip sampling during device FIRE relaxation: sampling
    fires on the early (far-from-data) configurations, the optimizer
    resumes with its adaptive dt/alpha state, and the relaxation makes
    progress."""
    monkeypatch.chdir(tmp_path)
    from autoforce_tpu.opt.device_fire import DeviceFIRE

    oracle = BinaryLJ(EPS, SIG)
    calc = _fresh_calc(oracle)
    s = mixture(17)
    s.rattle(0.08, seed=18)  # far from equilibrium -> forces to relax
    s.calc = calc
    dopt = DeviceFIRE(s, calc, dt=0.02, chunk=10)
    assert dopt.check_beta
    f0 = np.abs(np.asarray(s.get_forces())).max()
    dopt.run(fmax=1e-9, steps=40)
    assert dopt.nsteps == 40
    ndata, m = calc.size
    assert m >= 2 and ndata >= 1
    assert calc.event_counts["calculate"] >= 2
    assert np.isfinite(s.positions).all()
    # FIRE's adaptive clock advanced across host re-entries
    assert dopt.dt_cur != 0.02 or dopt.n_uphill > 0 or dopt.a != 0.1
    # relaxation really descended on the (learned) surface
    f1 = np.abs(np.asarray(s.get_forces())).max()
    assert f1 < f0
    log = open("active.log").read()
    assert "added indu" in log or "seed size" in log


def test_active_device_neb(tmp_path, monkeypatch):
    """Uncertainty-trip sampling during device NEB: any image can trip;
    the band resumes and every image stays finite while the model grows."""
    monkeypatch.chdir(tmp_path)
    from autoforce_tpu.opt.device_neb import DeviceNEB
    from autoforce_tpu.opt.neb import interpolate_images

    oracle = BinaryLJ(EPS, SIG)
    calc = _fresh_calc(oracle)
    first = mixture(21)
    last = mixture(21)
    last.rattle(0.10, seed=22)
    for im in (first, last):
        im.calc = calc
    images = interpolate_images(first, last, 4)
    for im in images:
        im.calc = calc
    dopt = DeviceNEB(images, calc, k=0.1, dt=0.02, chunk=8)
    assert dopt.check_beta
    dopt.run(fmax=1e-9, steps=24)
    assert dopt.nsteps == 24
    ndata, m = calc.size
    assert m >= 2 and ndata >= 1
    assert calc.event_counts["calculate"] >= len(images)  # host band evals
    for im in images:
        assert np.isfinite(im.positions).all()
    log = open("active.log").read()
    assert "added indu" in log or "seed size" in log
