"""EMT oracle: autodiff consistency + physical sanity."""

import numpy as np

from autoforce_tpu.calculator.emt import EMT
from autoforce_tpu.opt import LBFGS, UnitCellFilter
from autoforce_tpu.system import bulk_fcc


def test_forces_match_fd():
    s = bulk_fcc("Cu", 3.6).repeat((2, 1, 1))
    s.rattle(0.05, seed=0)
    s.calc = EMT()
    f = s.get_forces()
    eps = 1e-5
    for (a, b) in [(0, 0), (3, 2), (5, 1)]:
        sp = s.copy()
        sp.calc = EMT()
        pp = s.positions.copy()
        pp[a, b] += eps
        sp.set_positions(pp)
        ep = sp.get_potential_energy()
        pp[a, b] -= 2 * eps
        sp.set_positions(pp)
        em = sp.get_potential_energy()
        fd = -(ep - em) / (2 * eps)
        np.testing.assert_allclose(f[a, b], fd, rtol=1e-5, atol=1e-8)


def test_stress_matches_fd():
    s = bulk_fcc("Cu", 3.55)
    s.calc = EMT()
    st = s.get_stress()
    eps = 1e-6
    # xx component via isotropic-x strain
    for i, (a, b) in enumerate([(0, 0), (1, 1)]):
        e1 = np.zeros((3, 3))
        e1[a, b] = eps
        sp = s.copy()
        sp.calc = EMT()
        sp.set_cell(s.cell @ (np.eye(3) + e1), scale_atoms=True)
        ep = sp.get_potential_energy()
        sp2 = s.copy()
        sp2.calc = EMT()
        sp2.set_cell(s.cell @ (np.eye(3) - e1), scale_atoms=True)
        em = sp2.get_potential_energy()
        fd = (ep - em) / (2 * eps) / s.volume
        np.testing.assert_allclose(st[i], fd, rtol=1e-4, atol=1e-8)


def test_cu_lattice_constant():
    """EMT Cu should relax to a lattice constant near 3.6 A."""
    s = bulk_fcc("Cu", 3.7)
    s.calc = EMT()
    opt = LBFGS(UnitCellFilter(s), maxstep=0.05)
    assert opt.run(fmax=1e-3, steps=200)
    a = s.cell[0, 0]
    assert 3.5 < a < 3.75, a
    # cohesive-reference energy ~ 0 at equilibrium (our normalization)
    assert abs(s.get_potential_energy() / len(s)) < 0.05


def test_alloy_runs():
    s = bulk_fcc("Cu", 3.7)
    s.numbers[0] = 47  # one Ag substitution
    s.calc = EMT()
    e = s.get_potential_energy()
    f = s.get_forces()
    assert np.isfinite(e) and np.isfinite(f).all()
