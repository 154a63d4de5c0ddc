"""Composable base-kernel algebra (reference regression/kernel.py):
state roundtrip, autodiff-vs-FD gradients (kernel.py:509-574 analog),
White diagonal semantics, and full-SGPR learning with a composite."""

import jax
import numpy as np

from autoforce_tpu.kernelalgebra import (
    RBF,
    Add,
    Const,
    DotProd,
    Exp,
    Mul,
    Positive,
    Pow,
    SqD,
    White,
    from_state,
)

from test_engine import env_from_system, make_engine, make_system
from test_sgpr import lj_setup


def test_state_roundtrip():
    exprs = [
        DotProd() ** 4,
        DotProd() ** 4 + 0.01 * White(),
        Exp(Mul(Const(-0.5), SqD())),
        RBF(0.7),
        Mul(Positive(2.0), DotProd() ** 2) + White(0.1, True),
    ]
    for e in exprs:
        assert from_state(e.state).state == e.state, e.state


def test_value_shapes_and_equivalences():
    t = np.linspace(-1, 1, 7)
    np.testing.assert_allclose(
        np.asarray((DotProd() ** 4).value(t, xp=np)), t**4
    )
    # RBF(l) == exp((t-1)/l^2) on unit-norm descriptors
    ell = 0.7
    np.testing.assert_allclose(
        np.asarray(RBF(ell).value(t, xp=np)),
        np.exp((t - 1.0) / ell**2),
        rtol=1e-12,
    )
    # White never contributes off-diagonal
    e = DotProd() + 0.3 * White()
    np.testing.assert_allclose(np.asarray(e.value(t, xp=np)), t)
    assert abs(float(e.white_diag(xp=np)) - 0.3) < 1e-12


def test_gradients_vs_fd():
    """jax.grad through trainable Positive/White params == finite
    difference (the reference's test_kernel_gradients analog)."""
    expr = Mul(Positive(1.7), DotProd() ** 2) + White(0.25, True)
    p0 = np.array(expr.params())
    t = np.array([0.3, -0.5, 0.9])

    def f(params):
        return expr.value_with_params(t, tuple(params), xp=jax.numpy).sum()

    g = jax.grad(lambda p: f([p[0], p[1]]))(jax.numpy.asarray(p0))
    eps = 1e-6
    for i in range(len(p0)):
        pp = p0.copy()
        pp[i] += eps
        pm = p0.copy()
        pm[i] -= eps
        fd = (float(f(pp)) - float(f(pm))) / (2 * eps)
        np.testing.assert_allclose(float(g[i]), fd, rtol=1e-5, atol=1e-8)

    # with_params roundtrip: rebuilding with own params is identity
    np.testing.assert_allclose(
        np.array(expr.with_params(p0).params()), p0, rtol=1e-10
    )


def test_expr_matches_builtin_dot_kind():
    """kernel=DotProd()**zeta must reproduce the built-in 'dot' path in
    the fused predict (same cov, energy, forces, beta)."""
    eng, lj, model, systems = lj_setup(nstruct=2)
    for i in range(3):
        model.add_inducing(env_from_system(eng, systems[0], i), remake=False)
    rng = np.random.default_rng(0)
    model.mu = rng.normal(size=3)
    model.choli = np.linalg.inv(np.linalg.cholesky(model.M + 1e-8 * np.eye(3)))
    model._model_arrays = None
    cfg = eng.make_config(systems[1])
    ma = model.full_model_arrays()
    vs = np.ones(cfg.npad)
    e0, f0, w0, cov0, b0 = eng.predict(cfg, ma, vs)

    eng.kernel_kind = DotProd() ** eng.exponent
    e1, f1, w1, cov1, b1 = eng.predict(cfg, ma, vs)
    np.testing.assert_allclose(float(e1), float(e0), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f0), atol=1e-10)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b0), atol=1e-10)


def test_white_on_true_diagonal_only():
    eng, lj, model, systems = lj_setup(nstruct=2)
    eng.kernel_kind = DotProd() ** 4 + 0.02 * White()
    env1 = env_from_system(eng, systems[0], 0)
    env2 = env_from_system(eng, systems[0], 1)
    model.stage_env(env1)
    model.stage_env(env2)
    k11 = model.kern_env_env(env1, env1)
    k12 = model.kern_env_env(env1, env2)
    base11 = float(np.dot(env1.desc, env1.desc)) ** 4
    base12 = float(np.dot(env1.desc, env2.desc)) ** 4
    np.testing.assert_allclose(k11, base11 + 0.02, rtol=1e-10)
    np.testing.assert_allclose(k12, base12, rtol=1e-10)
    # gram_self: white on the diagonal, not off it
    cfg = eng.make_config(systems[0])
    k = np.asarray(eng.gram_self(cfg))
    n = len(systems[0])
    np.testing.assert_allclose(np.diag(k)[:n], np.full(n, 1.02), rtol=1e-6)


def test_composite_kernel_learns_lj(tmp_path, monkeypatch):
    """A reference-style composite (DotProd**4 + White) trains end-to-end
    and roundtrips through the model folder (VERDICT r1 #7)."""
    monkeypatch.chdir(tmp_path)
    from autoforce_tpu.io.model_io import load_model, save_model
    from autoforce_tpu.regression.sgpr import DataRecord

    eng, lj, model, systems = lj_setup()
    eng.kernel_kind = DotProd() ** 4 + 0.001 * White()
    for k in range(4):
        for i in range(4):
            model.add_inducing(env_from_system(eng, systems[k], i), remake=False)
    for s in systems[:4]:
        model.add_data(DataRecord.from_system(s), remake=False)
    model.make_munu(optimize=True, noise_f=0.002)
    assert model.stats["f_mae"] < 0.1, model.stats
    assert model.stats["r2"] > 0.99

    save_model(model, "m.pckl")
    model2 = load_model("m.pckl")
    assert model2.engine.kernel_kind.state == eng.kernel_kind.state
    # identical prediction after roundtrip
    cfg = eng.make_config(systems[5])
    vs = model.vscale_for(np.asarray(cfg.numbers))
    e1, f1, *_ = eng.predict(cfg, model.full_model_arrays(), vs)
    e2, f2, *_ = model2.engine.predict(
        model2.engine.make_config(systems[5]),
        model2.full_model_arrays(), vs,
    )
    np.testing.assert_allclose(float(e1), float(e2), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), atol=1e-10)


def test_active_learning_with_expr_kernel(tmp_path, monkeypatch):
    """Full on-the-fly learning with a composite kernel (incl. White):
    exercises the host beta normalization (_host_alpha) and the
    normalized duplicate guard for unnormalized k(x,x) != 1 kernels."""
    monkeypatch.chdir(tmp_path)
    from autoforce_tpu import units
    from autoforce_tpu.calculator.active import ActiveCalculator
    from autoforce_tpu.calculator.oracles import LennardJones
    from autoforce_tpu.md import Langevin
    from autoforce_tpu.system import bulk_fcc, maxwell_boltzmann_velocities

    lj = LennardJones(epsilon=0.15, sigma=2.3, rc=4.0)
    calc = ActiveCalculator(
        covariance=None, calculator=lj, logfile=None, pckl=None, tape=None,
        kernel_kw=dict(cutoff=4.0, lmax=2, nmax=2),
        ediff=0.02, ediff_tot=0.05, fdiff=0.08, seed=0,
    )
    calc.engine.kernel_kind = DotProd() ** 4 + 0.01 * White()
    s = bulk_fcc("Cu", 3.6).repeat((2, 2, 1))
    s.rattle(0.05, seed=1)
    s.calc = calc
    maxwell_boltzmann_velocities(s, 300, seed=2)
    Langevin(s, 2 * units.fs, 300, friction=0.02, seed=3).run(25)
    assert calc.size[0] >= 1 and calc.size[1] >= 2, calc.size
    res = calc.calculate(s)
    tmp = s.copy()
    tmp.calc = lj
    f_mae = np.abs(res["forces"] - tmp.get_forces()).mean()
    assert f_mae < 0.2, f_mae
