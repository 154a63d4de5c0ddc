"""Device-resident MD with active learning: the covloss early-exit hands
control back to the host exactly when sampling is needed."""

import numpy as np
import pytest

from autoforce_tpu import units
from autoforce_tpu.calculator.active import ActiveCalculator
from autoforce_tpu.md.device_md import DeviceMD
from autoforce_tpu.system import bulk_fcc, maxwell_boltzmann_velocities

from test_multispecies import EPS, SIG, BinaryLJ, mixture


def test_active_device_md(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    oracle = BinaryLJ(EPS, SIG)
    calc = ActiveCalculator(
        covariance=None, calculator=oracle, logfile="active.log",
        pckl=None, tape="model.sgpr",
        kernel_kw=dict(cutoff=4.5, lmax=3, nmax=3),
        ediff=0.02, ediff_tot=0.05, fdiff=0.08, noise_f=0.01,
    )
    s = mixture(7)
    s.calc = calc
    maxwell_boltzmann_velocities(s, 250, seed=8)
    dyn = DeviceMD(s, calc, dt=2 * units.fs, temperature_K=250,
                   friction=0.02, chunk=20, seed=9)  # check_beta defaults on
    assert dyn.check_beta
    dyn.run(60)
    assert dyn.nsteps == 60
    ndata, m = calc.size
    assert m >= 2 and ndata >= 1
    assert np.isfinite(s.positions).all()
    # accuracy vs oracle after on-the-fly learning
    tmp_s = s.copy()
    tmp_s.calc = oracle
    res = calc.calculate(s)
    f_mae = np.abs(res["forces"] - tmp_s.get_forces()).mean()
    assert f_mae < 0.25, f_mae
    # log shows device-run interleaving with sampling
    log = open("active.log").read()
    assert "added indu" in log or "seed size" in log
