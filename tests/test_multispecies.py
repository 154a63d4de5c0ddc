"""Multi-species behavior: wildcard species-table growth mid-run,
species-pair radii, and a binary-mixture active run."""

import numpy as np
import pytest

from autoforce_tpu import units
from autoforce_tpu.calculator.active import ActiveCalculator
from autoforce_tpu.md import Langevin
from autoforce_tpu.system import System, bulk_fcc, maxwell_boltzmann_velocities


from autoforce_tpu.calculator.oracles import (  # noqa: E402
    MixtureLennardJones as BinaryLJ,
)


def mixture(seed=0):
    s = bulk_fcc("Cu", 3.7).repeat((2, 2, 2))
    rng = np.random.default_rng(seed)
    sub = rng.choice(len(s), 8, replace=False)
    s.numbers[sub] = 47  # Ag
    s.rattle(0.05, seed=seed)
    return s


EPS = {(29, 29): 0.15, (47, 47): 0.12, (29, 47): 0.13}
SIG = {(29, 29): 2.3, (47, 47): 2.6, (29, 47): 2.45}


def test_binary_active_learning(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    oracle = BinaryLJ(EPS, SIG)
    calc = ActiveCalculator(
        covariance=None, calculator=oracle, logfile="active.log",
        pckl=None, tape=None,
        kernel_kw=dict(cutoff=4.5, lmax=3, nmax=3),
        ediff=0.02, ediff_tot=0.05, fdiff=0.08, noise_f=0.01,
    )
    s = mixture(0)
    s.calc = calc
    maxwell_boltzmann_velocities(s, 250, seed=1)
    dyn = Langevin(s, 2 * units.fs, 250, friction=0.02, seed=2)
    dyn.run(40)
    assert set(calc.engine.species) == {29, 47}
    # both species got inducing environments
    counts = calc.model.indu_counts
    assert counts.get(29, 0) >= 1 and counts.get(47, 0) >= 1, counts
    # accuracy vs the oracle
    tmp = s.copy()
    tmp.calc = oracle
    res = calc.calculate(s)
    f_mae = np.abs(res["forces"] - tmp.get_forces()).mean()
    assert f_mae < 0.2, f_mae


def test_species_growth_midrun(tmp_path, monkeypatch):
    """A new species appearing mid-run grows the table; kernel values for
    existing environments are preserved (zero-block embedding)."""
    monkeypatch.chdir(tmp_path)
    oracle = BinaryLJ(EPS, SIG)
    calc = ActiveCalculator(
        covariance=None, calculator=oracle, logfile=None, pckl=None, tape=None,
        kernel_kw=dict(cutoff=4.5, lmax=2, nmax=2),
        ediff=0.02, ediff_tot=0.05, fdiff=0.08,
    )
    s_pure = bulk_fcc("Cu", 3.7).repeat((2, 2, 2))
    s_pure.rattle(0.05, seed=3)
    s_pure.calc = calc
    s_pure.get_potential_energy()
    assert calc.engine.species == [29]
    M_before = calc.model.M.copy()

    s_mix = mixture(4)
    s_mix.calc = calc
    s_mix.get_potential_energy()
    assert calc.engine.species == [29, 47]
    m0 = M_before.shape[0]
    # the old inducing block of M is unchanged by the table growth
    np.testing.assert_allclose(calc.model.M[:m0, :m0], M_before, atol=1e-9)
    # descriptors restaged to the new dimensionality
    assert calc.model.X[0].desc.shape[0] == calc.engine.dim
