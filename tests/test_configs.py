"""BASELINE.json config analogs runnable without DFT."""

import os

import numpy as np
import pytest

from autoforce_tpu import units
from autoforce_tpu.calculator.active import ActiveCalculator
from autoforce_tpu.calculator.oracles import LennardJones
from autoforce_tpu.md import Langevin
from autoforce_tpu.system import bulk_fcc, maxwell_boltzmann_velocities

# argon LJ parameters (eV / Angstrom)
AR_EPS = 0.0104
AR_SIG = 3.4


def test_lj_argon_108_melt(tmp_path, monkeypatch):
    """Config 2: LJ argon 108-atom melt with on-the-fly SGPR."""
    monkeypatch.chdir(tmp_path)
    lj = LennardJones(epsilon=AR_EPS, sigma=AR_SIG, rc=8.0)
    calc = ActiveCalculator(
        covariance=None, calculator=lj, logfile="active.log",
        pckl=None, tape="model.sgpr",
        kernel_kw=dict(cutoff=8.0, lmax=3, nmax=3),
        ediff=0.002, ediff_tot=0.01, fdiff=0.01, noise_f=0.002, seed=0,
    )
    # fcc argon a=5.26: 3x3x3 conventional cells = 108 atoms
    s = bulk_fcc("Ar", 5.26).repeat((3, 3, 3))
    s.rattle(0.1, seed=1)
    s.calc = calc
    maxwell_boltzmann_velocities(s, 120, seed=2)  # above melting
    dyn = Langevin(s, 5 * units.fs, temperature_K=120, friction=0.02, seed=3)
    dyn.run(40)
    assert len(s) == 108
    tmp_s = s.copy()
    tmp_s.calc = lj
    res = calc.calculate(s)
    f_ref = tmp_s.get_forces()
    f_mae = np.abs(res["forces"] - f_ref).mean()
    f_scale = np.abs(f_ref).mean()
    assert f_mae < max(0.25 * f_scale, 0.01), (f_mae, f_scale)
    e_err = abs(res["energy"] - tmp_s.get_potential_energy()) / len(s)
    assert e_err < 0.003, e_err


def test_include_tape_roundtrip(tmp_path, monkeypatch):
    """Train a model, then retrain a fresh model from the tape with
    include_tape (reference active.py:1007-1063)."""
    monkeypatch.chdir(tmp_path)
    lj = LennardJones(epsilon=0.15, sigma=2.3, rc=4.5)
    calc = ActiveCalculator(
        covariance=None, calculator=lj, logfile=None, pckl=None,
        tape="a.sgpr", kernel_kw=dict(cutoff=4.5, lmax=2, nmax=2),
        ediff=0.02, ediff_tot=0.05, fdiff=0.06, seed=4,
    )
    s = bulk_fcc("Cu", 3.6).repeat((2, 2, 1))
    s.rattle(0.05, seed=5)
    s.calc = calc
    maxwell_boltzmann_velocities(s, 300, seed=6)
    Langevin(s, 2 * units.fs, 300, friction=0.02, seed=7).run(20)
    n1, m1 = calc.size
    assert m1 > 0

    calc2 = ActiveCalculator(
        covariance=None, calculator=None, logfile=None, pckl=None,
        tape="b.sgpr", kernel_kw=dict(cutoff=4.5, lmax=2, nmax=2),
        ediff=0.02, ediff_tot=0.05, fdiff=0.06, seed=8,
    )
    calc2.include_tape("a.sgpr")
    assert calc2.size[1] > 0
    # retrained model predicts close to the original
    r1 = calc.calculate(s.copy())
    r2 = calc2.calculate(s.copy())
    assert np.abs(r1["forces"] - r2["forces"]).mean() < 0.3


def test_water_dimer_relax_neb(tmp_path, monkeypatch):
    """Config 3 analog: molecular relax + NEB with a pre-trained model on a
    multi-species toy oracle."""
    monkeypatch.chdir(tmp_path)
    from autoforce_tpu.calculator.parametric import (
        ParametricCalculator,
        get_lj_terms,
    )
    from autoforce_tpu.opt import FIRE, LBFGS, NEB
    from autoforce_tpu.opt.neb import interpolate_images
    from autoforce_tpu.system import System

    oracle = ParametricCalculator(
        get_lj_terms([(8, 8), (8, 1), (1, 1)], epsilon=0.25, sigma=1.6,
                     rc=6.0, trainable=False),
        rc=6.0,
    )
    calc = ActiveCalculator(
        covariance=None, calculator=oracle, logfile=None, pckl=None,
        tape=None, kernel_kw=dict(cutoff=6.0, lmax=3, nmax=3),
        ediff=0.005, ediff_tot=0.02, fdiff=0.02, seed=12,
    )
    dimer = System(
        symbols=["O", "H", "H", "O", "H", "H"],
        positions=[
            [0, 0, 0], [1.7, 0.3, 0], [-0.3, 1.7, 0],
            [3.6, 0, 0], [4.9, 1.0, 0], [4.9, -1.0, 0],
        ],
    )
    dimer.calc = calc
    LBFGS(dimer, maxstep=0.1).run(fmax=0.05, steps=150)
    e_ml = dimer.get_potential_energy()
    check = dimer.copy()
    check.calc = oracle
    assert abs(e_ml - check.get_potential_energy()) < 0.12

    # NEB: slide molecule B sideways around molecule A (no coincidences)
    last = dimer.copy()
    last.positions = last.positions + np.array(
        3 * [[0.0, 0.0, 0.0]] + 3 * [[0.0, 3.0, 0.0]]
    )
    images = interpolate_images(dimer, last, 5)
    for im in images:
        im.calc = calc
    band = NEB(images, k=1.0, climb=False)
    FIRE(band, dt=0.05, maxstep=0.1).run(fmax=0.15, steps=60)
    barrier_ml = band.barrier()
    assert np.isfinite(barrier_ml) and barrier_ml >= 0
    # the model is accurate where it was trained (the endpoints); barrier-
    # region extrapolation continues to improve with sampling and is not a
    # pass/fail criterion here
    for im in (images[0], images[-1]):
        t = im.copy()
        t.calc = oracle
        assert abs(im.get_potential_energy() - t.get_potential_energy()) < 0.15
