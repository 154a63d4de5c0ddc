"""Kernel-hyperparameter optimization over the composable kernel algebra.

Counterpart of the reference's marginal-likelihood training of kernel
parameters (theforce/regression/gppotential.py:352-371 ``loss`` +
torch-autograd backward; gradient self-checks kernel.py:509-574).  Here
the objective is the exact-GP log marginal likelihood over ENERGY
targets, expressed through precomputed descriptor dot matrices — the
descriptors themselves do not depend on kernel hyperparameters, so the
whole objective is one jitted, ``jax.grad``-differentiable function of
the flat parameter vector (softplus free form,
``KernelExpr.value_with_params``).  A scipy L-BFGS loop on host drives
it, mirroring the reference's scipy-on-host noise optimization
(gppotential.py:1282-1303).

After the hyperparameters move, the SGPR covariance blocks are stale;
``SgprModel.rebuild_kernel_matrices`` re-derives M/Ke/Kf/Kv from the
stored raw data (the reference's full ``set_data`` build,
gppotential.py:485-509) and re-solves.
"""

from __future__ import annotations

import numpy as np


def collect_dot_data(engine, records):
    """Stack per-structure descriptors for the LML objective.

    Returns (P (S, n_pad, D), Z (S, n_pad), mask (S, n_pad)); the target
    vector (energies minus the model mean) is assembled by the caller.
    """
    descs = []
    for rec in records:
        if rec.cfg is None:
            rec.cfg = engine.make_config(rec.system)
        p, lone = engine.descriptors(rec.cfg)
        n = rec.natoms
        descs.append((np.asarray(p, dtype=np.float64)[:n],
                      np.asarray(rec.system.numbers)))
    S = len(descs)
    n_pad = max(p.shape[0] for p, _ in descs)
    D = descs[0][0].shape[1]
    P = np.zeros((S, n_pad, D))
    Z = np.zeros((S, n_pad), dtype=np.int32)
    mask = np.zeros((S, n_pad), dtype=bool)
    for i, (p, z) in enumerate(descs):
        P[i, : len(z)] = p
        Z[i, : len(z)] = z
        mask[i, : len(z)] = True
    return P, Z, mask


def make_energy_lml(expr, P, Z, mask, y, noise_e=1e-3):
    """Jitted (negative LML, grad) of the energy-target exact GP as a
    function of the flat kernel parameter vector.

    C[a, b] = sum_{i in a, j in b} delta(z_i, z_j) f(p_i . p_j)
              (+ same-LCE White variance on the diagonal)
    """
    import jax
    import jax.numpy as jnp

    P = jnp.asarray(P)
    y = jnp.asarray(np.asarray(y, dtype=np.float64))
    T = jnp.einsum("and,bmd->abnm", P, P)
    same = (
        (Z[:, None, :, None] == Z[None, :, None, :])
        & mask[:, None, :, None]
        & mask[None, :, None, :]
    )
    same = jnp.asarray(same)
    natoms = jnp.asarray(mask.sum(axis=1).astype(np.float64))
    S = P.shape[0]

    from ..engine import precise_sum

    def neg_lml(params):
        p = list(params)
        K = expr.value_with_params(T, tuple(p), xp=jnp) * same
        # reductions over (elementwise of) matmul products must stay in
        # true f32 on TPU (engine.precise_sum; CLAUDE.md numerics rule)
        C = precise_sum(K.reshape(S, S, -1), axis=-1)
        # same-environment White variance: each LCE with itself
        white = expr._white(list(params), jnp)
        C = C + jnp.diag(white * natoms)
        C = C + noise_e**2 * jnp.eye(S)
        L = jnp.linalg.cholesky(C)
        alpha = jax.scipy.linalg.cho_solve((L, True), y)
        logdet = 2.0 * jnp.log(jnp.diag(L)).sum()
        return 0.5 * (precise_sum(y * alpha) + logdet
                      + S * jnp.log(2.0 * jnp.pi))

    return jax.jit(jax.value_and_grad(lambda q: neg_lml(tuple(q))))


def optimize_expr(expr, P, Z, mask, y, noise_e=1e-3, maxiter=60):
    """L-BFGS over the expression's trainable parameters; returns
    (optimized expr, scipy result).  No-op for parameter-free exprs."""
    from scipy.optimize import minimize

    x0 = np.asarray(expr.params(), dtype=np.float64)
    if x0.size == 0:
        return expr, None
    vg = make_energy_lml(expr, P, Z, mask, y, noise_e=noise_e)

    def f(x):
        v, g = vg(tuple(float(t) for t in x))
        return float(v), np.asarray(g, dtype=np.float64)

    res = minimize(f, x0, jac=True, method="L-BFGS-B",
                   options=dict(maxiter=maxiter))
    return expr.with_params(res.x.tolist()), res


def optimize_kernel_params(model, noise_e=1e-3, maxiter=60, min_data=3):
    """Optimize the engine's KernelExpr hyperparameters on the model's
    training energies (mean-subtracted); returns True if they moved.

    The caller owns the follow-up ``rebuild_kernel_matrices`` (all K
    blocks are stale once the kernel changes); the ActiveCalculator
    ``kernel_hpo`` hook does both.
    """
    from ..kernelalgebra import KernelExpr

    expr = getattr(model.engine, "kernel_kind", "dot")
    if not isinstance(expr, KernelExpr) or not expr.params():
        return False
    if model.ndata < min_data:
        return False
    if any(np.ndim(rec.e) != 0 for rec in model.data):
        # multi-task records carry per-task energy vectors; the energy-LML
        # objective is single-task (like the reference's loss)
        return False
    P, Z, mask = collect_dot_data(model.engine, model.data)
    energies = np.array([rec.e for rec in model.data], dtype=np.float64)
    means = np.array(
        [model.mean_energy(rec.system.numbers) for rec in model.data]
    )
    new, res = optimize_expr(expr, P, Z, mask, energies - means,
                             noise_e=noise_e, maxiter=maxiter)
    if res is None or not res.success and not np.isfinite(res.fun):
        return False
    moved = not np.allclose(new.params(), expr.params(), rtol=1e-6, atol=1e-8)
    if moved:
        model.engine.kernel_kind = new
    return moved
