"""Metadynamics, Steinhardt Ql, KDE, RDF, trajectory analysis, log parsing."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from autoforce_tpu.analysis.kde import GaussianKDE
from autoforce_tpu.analysis.rdf import rdf
from autoforce_tpu.analysis.trajectory import TrajAnalyser, arrhenius_fit
from autoforce_tpu.descriptor.ql import steinhardt_ql
from autoforce_tpu.system import bulk_fcc


def test_ql_vs_scipy():
    from scipy.special import sph_harm_y

    rng = np.random.default_rng(0)
    xyz = rng.uniform(0.5, 1.5, (5, 3))
    lmax = 6
    rc = 6.0
    q1 = np.asarray(steinhardt_ql(jnp.asarray(xyz), lmax, rc))
    r = np.linalg.norm(xyz, axis=1)
    theta = np.arccos(xyz[:, 2] / r)
    phi = np.arctan2(xyz[:, 1], xyz[:, 0])
    cut = (1 - r / rc) ** 2
    for l in range(lmax + 1):
        s = 0.0
        for m in range(-l, l + 1):
            ylm = sph_harm_y(l, abs(m), theta, phi)
            if m < 0:
                ylm = (-1) ** m * np.conj(ylm)
            qlm = (ylm * cut).sum() / cut.sum()
            s += abs(qlm) ** 2
        q2 = np.sqrt(4 * np.pi / (2 * l + 1) * s)
        np.testing.assert_allclose(q1[l], q2, rtol=1e-8)


def test_kde():
    kde = GaussianKDE(0.1)
    rng = np.random.default_rng(1)
    xs = rng.normal(0.0, 0.5, 200)
    for x in xs:
        kde.count(np.array([x]))
    assert kde.total == 200
    # density at the center should exceed density in the tail
    assert kde(np.array([0.0]), density=True) > kde(np.array([2.0]), density=True)
    pts, w = kde.histogram()
    assert w.sum() == 200


def test_rdf_fcc():
    s = bulk_fcc("Cu", 3.6).repeat((3, 3, 3))
    r, g = rdf([s], rmax=5.0, bins=200)
    pair = (29, 29)
    # first peak at a/sqrt(2) = 2.546
    peak_r = r[np.argmax(g[pair])]
    assert abs(peak_r - 3.6 / np.sqrt(2)) < 0.05
    # g ~ 0 below the first shell
    assert g[pair][r < 2.0].max() == 0.0


def test_traj_analyser():
    frames = []
    base = bulk_fcc("Cu", 3.6).repeat((2, 2, 2))
    drift = np.array([0.05, 0.0, 0.0])
    for t in range(20):
        f = base.copy()
        f.positions = f.positions + t * drift
        frames.append(f)
    ta = TrajAnalyser(frames)
    msd = ta.msd()
    # ballistic drift: MSD = (0.05 t)^2
    np.testing.assert_allclose(msd[10], (0.5) ** 2, rtol=1e-6)
    Ea, D0 = arrhenius_fit([300, 600, 1200], [1e-7, 1e-6, 3e-6])
    assert Ea > 0


def test_meta_md(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from autoforce_tpu import units
    from autoforce_tpu.calculator.active import ActiveCalculator
    from autoforce_tpu.calculator.meta import Meta, Posvar
    from autoforce_tpu.calculator.oracles import LennardJones
    from autoforce_tpu.md import Langevin
    from autoforce_tpu.system import maxwell_boltzmann_velocities

    lj = LennardJones(epsilon=0.15, sigma=2.3, rc=4.0)
    meta = Meta(Posvar(0), sigma=0.2, w=0.05)
    calc = ActiveCalculator(
        covariance=None, calculator=lj, logfile="active.log",
        pckl=None, tape=None, kernel_kw=dict(cutoff=4.0, lmax=2, nmax=2),
        ediff=0.05, fdiff=0.1,
    )
    calc.meta = meta
    s = bulk_fcc("Cu", 3.6)
    s.rattle(0.03, seed=0)
    s.calc = calc
    maxwell_boltzmann_velocities(s, 200, seed=1)
    dyn = Langevin(s, 2 * units.fs, 200, friction=0.02, seed=2)
    dyn.attach(meta.update)
    dyn.run(10)
    assert meta.kde.total >= 10
    assert os.path.isfile("meta.hist")
    assert np.isfinite(s.get_forces()).all()

    # parse the produced log
    from autoforce_tpu.analysis.logs import log_to_figure, parse_logfile

    d = parse_logfile("active.log")
    assert len(d["energy"]) >= 10
    fig = log_to_figure("active.log", save="dash.png")
    assert os.path.isfile("dash.png")
