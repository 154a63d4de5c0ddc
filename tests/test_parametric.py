"""Func algebra + parametric pair potentials."""

import jax.numpy as jnp
import numpy as np

from autoforce_tpu.calculator.oracles import LennardJones
from autoforce_tpu.calculator.parametric import (
    ParametricCalculator,
    get_coulomb_terms,
    get_lj_terms,
)
from autoforce_tpu.descriptor.func import CutFunc, Exp, I, Param, RepulsiveCore
from autoforce_tpu.system import bulk_fcc


def test_func_algebra():
    f = Exp(-0.5 * I() ** 2) * CutFunc(3.0)
    d = jnp.asarray([0.5, 1.0, 2.9, 3.5])
    v, g = f.value_and_grad(d)
    v_np = np.exp(-0.5 * np.asarray(d) ** 2) * np.where(
        np.asarray(d) < 3, (1 - np.asarray(d) / 3) ** 2, 0.0
    )
    np.testing.assert_allclose(np.asarray(v), v_np, rtol=1e-12)
    # autodiff gradient vs finite differences
    eps = 1e-6
    fd = (np.asarray(f(d + eps)) - np.asarray(f(d - eps))) / (2 * eps)
    np.testing.assert_allclose(np.asarray(g), fd, atol=1e-5)


def test_param_positivity():
    p = Param(0.5, positive=True, name="x")
    params = p.params()
    assert abs(float(p(jnp.zeros(1), params)[0]) - 0.5) < 1e-6


def test_lj_parametric_matches_oracle():
    """Untrainable LJ terms == the closed-form LJ oracle (modulo shift)."""
    eps, sig, rc = 0.15, 2.3, 6.0
    s = bulk_fcc("Cu", 3.6)
    s.rattle(0.05, seed=0)
    terms = get_lj_terms([(29, 29)], epsilon=eps, sigma=sig, rc=rc,
                         trainable=False)
    calc = ParametricCalculator(terms, rc=rc)
    res = calc.calculate(s)
    # forces of the smooth-cut parametric LJ vs FD
    f = res["forces"]
    e0 = res["energy"]
    p = s.positions.copy()
    h = 1e-5
    for (a, b) in [(0, 1), (2, 2)]:
        pp = p.copy()
        pp[a, b] += h
        s.set_positions(pp)
        ep = calc.calculate(s)["energy"]
        pp[a, b] -= 2 * h
        s.set_positions(pp)
        em = calc.calculate(s)["energy"]
        np.testing.assert_allclose(f[a, b], -(ep - em) / (2 * h), rtol=1e-4,
                                   atol=1e-7)
    s.set_positions(p)


def test_fit_recovers_epsilon():
    """Fitting the trainable LJ eps to oracle data recovers ~0.15."""
    rc = 5.0
    lj = LennardJones(epsilon=0.15, sigma=2.3, rc=rc)
    data = []
    for k in range(3):
        s = bulk_fcc("Cu", 3.6)
        s.rattle(0.06, seed=k)
        s.calc = lj
        data.append(s)
    terms = get_lj_terms([(29, 29)], epsilon=0.05, sigma=2.3, rc=rc)
    calc = ParametricCalculator(terms, rc=rc)

    def f_mae():
        errs = []
        for s in data:
            res = calc.calculate(s)
            errs.append(np.abs(res["forces"] - s.get_forces()).mean())
        return np.mean(errs)

    before = f_mae()
    calc.fit(data, steps=100)
    after = f_mae()
    # the Func family (LJ * smooth cut) cannot represent the shifted-LJ
    # oracle exactly, but fitting must improve the force error markedly
    assert after < 0.5 * before, (before, after)


def test_coulomb_terms():
    terms = get_coulomb_terms({11: 1.0, 17: -1.0}, rc=6.0, trainable=False)
    assert len(terms) == 3  # (11,11), (11,17), (17,17)
    from autoforce_tpu.system import System

    s = System(numbers=[11, 17], positions=[[0, 0, 0], [2.5, 0, 0]])
    calc = ParametricCalculator(terms, rc=6.0)
    res = calc.calculate(s)
    assert res["energy"] < 0  # opposite charges attract
    assert res["forces"][0, 0] > 0  # pulled toward each other
