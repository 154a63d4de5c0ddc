"""Device-resident NEB: exact agreement with the host opt/neb.NEB +
opt/fire.FIRE loop (improved tangents, springs, climbing image, band
FIRE), plus chunk chaining."""

import numpy as np

from autoforce_tpu.opt import FIRE, NEB
from autoforce_tpu.opt.device_neb import DeviceNEB
from autoforce_tpu.opt.neb import interpolate_images
from autoforce_tpu.system import bulk_fcc

from test_device_fire import _frozen_calc


def _band(calc, nimages=5):
    first = bulk_fcc("Cu", 3.6).repeat((2, 2, 2))
    first.rattle(0.10, seed=1)
    last = bulk_fcc("Cu", 3.6).repeat((2, 2, 2))
    last.rattle(0.10, seed=2)
    for im in (first, last):
        im.calc = calc
    images = interpolate_images(first, last, nimages)
    for im in images:
        im.calc = calc
    return images


def test_device_neb_matches_host(tmp_path, monkeypatch):
    """Short-horizon EXACT tracking of the host band (projection +
    tangent + spring + climb + FIRE, bit for bit), then full runs land
    on the same path.  Whole-run step-count equality is not asserted
    (binary FIRE branches fork on ~1e-15 reduce-order differences)."""
    monkeypatch.chdir(str(tmp_path))
    calc = _frozen_calc(skin=0.8)
    for climb in (False, True):
        images_h = _band(calc)
        band = NEB(images_h, k=0.1, climb=climb)
        opt = FIRE(band, dt=0.05, maxstep=0.1)
        for _ in range(10):
            opt.step(band.get_forces())
            opt.nsteps += 1

        images_d = _band(calc)
        dopt = DeviceNEB(images_d, calc, k=0.1, climb=climb, dt=0.05,
                         maxstep=0.1, chunk=4, check_beta=False)
        dopt.run(fmax=1e-9, steps=10)
        assert dopt.nsteps == 10
        for h, d in zip(images_h, images_d):
            np.testing.assert_allclose(d.positions, h.positions, atol=1e-9)
        np.testing.assert_allclose(dopt.dt_cur, opt.dt, rtol=1e-12)
        np.testing.assert_allclose(dopt.a, opt.a, rtol=1e-12)
        assert int(dopt.n_uphill) == opt.n_uphill


def test_device_neb_converges_same_barrier(tmp_path, monkeypatch):
    monkeypatch.chdir(str(tmp_path))
    calc = _frozen_calc(skin=0.8)
    images_h = _band(calc)
    band = NEB(images_h, k=0.1)
    FIRE(band, dt=0.05, maxstep=0.1).run(fmax=0.05, steps=300)
    b_host = band.barrier()

    images_d = _band(calc)
    dopt = DeviceNEB(images_d, calc, k=0.1, dt=0.05, maxstep=0.1,
                     chunk=50, check_beta=False)
    conv = dopt.run(fmax=0.05, steps=300)
    assert conv
    b_dev = dopt.barrier()
    np.testing.assert_allclose(b_dev, b_host, atol=5e-3)
    # endpoints never move
    ref = _band(calc)
    np.testing.assert_allclose(images_d[0].positions, ref[0].positions,
                               atol=1e-12)
    np.testing.assert_allclose(images_d[-1].positions, ref[-1].positions,
                               atol=1e-12)


def test_device_neb_active_learning(tmp_path, monkeypatch):
    """Uncertainty trips during a device band relaxation sample through
    the full calculator (every image, host _compute semantics)."""
    monkeypatch.chdir(str(tmp_path))
    from autoforce_tpu.calculator.active import ActiveCalculator
    from autoforce_tpu.calculator.oracles import LennardJones

    lj = LennardJones(epsilon=0.15, sigma=2.3, rc=4.5)
    calc = ActiveCalculator(
        covariance=None, calculator=lj, logfile=None, pckl=None, tape=None,
        kernel_kw=dict(cutoff=4.5, lmax=2, nmax=2),
        ediff=0.05, fdiff=0.1, seed=0,
    )
    images = _band(calc)
    m0 = calc.model.m
    dopt = DeviceNEB(images, calc, k=0.1, dt=0.05, maxstep=0.1, chunk=15)
    dopt.run(fmax=0.08, steps=120)
    assert calc.model.m >= m0 and calc.model.m > 0
    for im in images:
        assert np.isfinite(im.positions).all()
