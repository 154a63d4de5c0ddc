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


def make_ef_lml(expr, engine, records, means, noise_e=1e-3, noise_f=0.05,
                Y=None):
    """Jitted (negative LML, grad) of the exact GP over [energy; FORCE]
    targets as a function of the flat kernel parameter vector — the
    reference's full marginal likelihood (gppotential.py:344-371 builds
    Y from energies AND forces/virials).  With one energy and 3N forces
    per structure, the force rows dominate the information content;
    gradient-bearing hyperparameters (e.g. an RBF length scale over
    descriptors) are unidentifiable from energies alone on near-isomeric
    data but pinned sharply by forces (tests/test_hpo.py).

    The covariance blocks are the (ee, ef, fe, ff) derivative chain of
    exactgp.cross_kernel_blocks, re-derived here with the kernel
    parameters TRACED (cross_kernel_blocks bakes them static), so one
    ``jax.grad`` serves the scipy L-BFGS loop.  O((sum 1+3N)^3) — meant
    for the offline HPO surface at modest data counts.

    ``Y``: optional (total, R) matrix of R INDEPENDENT target
    realizations sharing the covariance (rows in record order:
    [e_i; f_i...] per record, mean already removed).  The objective is
    then the mean per-realization negative LML, whose minimizer's
    sampling variance shrinks ~1/R — the statistically stable way to
    test/calibrate hyperparameter identifiability (a single draw's MLE
    of a length scale scatters tens of percent at small row counts).
    When omitted, the records' own (e, f) targets form the single
    realization, matching the reference objective exactly."""
    import jax
    import jax.numpy as jnp

    from ..engine import precise_sum

    natoms = [rec.natoms for rec in records]
    sizes = [1 + 3 * n for n in natoms]
    ofs = np.concatenate([[0], np.cumsum(sizes)]).astype(int)
    total = int(ofs[-1])
    y = np.zeros(total)
    noise = np.zeros(total)
    for i, rec in enumerate(records):
        o = ofs[i]
        y[o] = float(rec.e) - float(means[i])
        y[o + 1: o + 1 + 3 * natoms[i]] = np.asarray(rec.f).reshape(-1)
        noise[o] = noise_e ** 2 * natoms[i]
        noise[o + 1: o + 1 + 3 * natoms[i]] = noise_f ** 2
    if Y is None:
        y_j = jnp.asarray(y)
        nreal = 1
    else:
        Y = np.asarray(Y, dtype=np.float64)
        if Y.shape[0] != total:
            raise ValueError(
                f"Y rows ({Y.shape[0]}) != target rows ({total})"
            )
        y_j = jnp.asarray(Y.reshape(total, -1))
        nreal = y_j.shape[1]
    noise_j = jnp.asarray(noise)
    cov = ef_covariance_fn(expr, engine, records)

    def neg_lml(qvec):
        C = cov(qvec) + jnp.diag(noise_j)
        L = jnp.linalg.cholesky(C)
        alpha = jax.scipy.linalg.cho_solve((L, True), y_j)
        logdet = 2.0 * jnp.log(jnp.diag(L)).sum()
        return 0.5 * (precise_sum(y_j * alpha) / nreal + logdet
                      + total * jnp.log(2.0 * jnp.pi))

    return jax.jit(jax.value_and_grad(lambda q: neg_lml(tuple(q))))


def ef_covariance_fn(expr, engine, records):
    """The [E; F] covariance C(qvec) of make_ef_lml as a standalone
    (non-jitted) function of the flat kernel parameter vector — the
    (ee, ef, fe, ff) derivative chain with TRACED parameters."""
    import jax
    import jax.numpy as jnp

    from ..engine import _config_descriptors, precise_sum

    radii = engine.radii_table()
    sp = engine.params
    cfgs = []
    for rec in records:
        if rec.cfg is None:
            rec.cfg = engine.make_config(rec.system)
        cfgs.append(rec.cfg)
    natoms = [rec.natoms for rec in records]
    sizes = [1 + 3 * n for n in natoms]
    ofs = np.concatenate([[0], np.cumsum(sizes)]).astype(int)
    total = int(ofs[-1])
    S = len(records)

    def cov(qvec):
        def summed_kernel(c1, c2):
            def g(pos1, pos2):
                p1, l1 = _config_descriptors(pos1, c1.cell, c1, radii, sp)
                p2, l2 = _config_descriptors(pos2, c2.cell, c2, radii, sp)
                dot = p1 @ p2.T
                same = (c1.numbers[:, None] == c2.numbers[None, :])
                m = (c1.atom_mask[:, None] & c2.atom_mask[None, :])
                k = expr.value_with_params(dot, tuple(qvec), xp=jnp)
                k = k * same * m
                k = k + (l1[:, None] & l2[None, :]) * same * m
                return precise_sum(k)

            return g

        C = jnp.zeros((total, total))
        for i in range(S):
            for j in range(i, S):
                g = summed_kernel(cfgs[i], cfgs[j])
                pi, pj = cfgs[i].positions, cfgs[j].positions
                ee = g(pi, pj)
                fe = -jax.grad(g, argnums=0)(pi, pj)
                ef = -jax.grad(g, argnums=1)(pi, pj)
                ff = -jax.jacfwd(
                    lambda p2: -jax.grad(g, argnums=0)(pi, p2)
                )(pj)
                ni, nj = natoms[i], natoms[j]
                blk = jnp.zeros((sizes[i], sizes[j]))
                blk = blk.at[0, 0].set(ee)
                blk = blk.at[0, 1:].set(ef[:nj].reshape(-1))
                blk = blk.at[1:, 0].set(fe[:ni].reshape(-1))
                blk = blk.at[1:, 1:].set(
                    ff[:ni, :, :nj, :].reshape(3 * ni, 3 * nj)
                )
                C = C.at[ofs[i]:ofs[i + 1], ofs[j]:ofs[j + 1]].set(blk)
                if j > i:
                    C = C.at[ofs[j]:ofs[j + 1], ofs[i]:ofs[i + 1]].set(
                        blk.T
                    )
        # same-LCE White variance contributes to the ENERGY diagonal
        # only (position-independent, so its derivative blocks vanish)
        white = expr._white(list(qvec), jnp)
        for i in range(S):
            C = C.at[ofs[i], ofs[i]].add(white * natoms[i])
        return C

    return cov


def optimize_expr_ef(expr, engine, records, means, noise_e=1e-3,
                     noise_f=0.05, maxiter=60, Y=None):
    """L-BFGS on the force-aware LML (see make_ef_lml; ``Y`` forwards
    the optional multi-realization target matrix)."""
    from scipy.optimize import minimize

    x0 = np.asarray(expr.params(), dtype=np.float64)
    if x0.size == 0:
        return expr, None
    vg = make_ef_lml(expr, engine, records, means, noise_e=noise_e,
                     noise_f=noise_f, Y=Y)

    def f(x):
        v, g = vg(tuple(float(t) for t in x))
        return float(v), np.asarray(g, dtype=np.float64)

    res = minimize(f, x0, jac=True, method="L-BFGS-B",
                   options=dict(maxiter=maxiter))
    return expr.with_params(res.x.tolist()), res


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


def optimize_kernel_params(model, noise_e=1e-3, maxiter=60, min_data=3,
                           forces="auto", noise_f=0.05, ef_row_cap=400):
    """Optimize the engine's KernelExpr hyperparameters on the model's
    training targets; returns True if they moved.

    ``forces``: 'auto' uses the force-aware LML (make_ef_lml — the
    reference's full marginal likelihood over [E; F],
    gppotential.py:344-371) whenever the stacked target count
    sum(1 + 3N) fits ``ef_row_cap`` (the objective is O(rows^3) dense);
    True forces it; False keeps the energy-only objective.

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
    means = np.array(
        [model.mean_energy(rec.system.numbers) for rec in model.data]
    )
    rows = sum(1 + 3 * rec.natoms for rec in model.data)
    use_f = forces is True or (forces == "auto" and rows <= ef_row_cap)
    if use_f:
        new, res = optimize_expr_ef(expr, model.engine, model.data, means,
                                    noise_e=noise_e, noise_f=noise_f,
                                    maxiter=maxiter)
    else:
        P, Z, mask = collect_dot_data(model.engine, model.data)
        energies = np.array([rec.e for rec in model.data],
                            dtype=np.float64)
        new, res = optimize_expr(expr, P, Z, mask, energies - means,
                                 noise_e=noise_e, maxiter=maxiter)
    if res is None or not res.success and not np.isfinite(res.fun):
        return False
    moved = not np.allclose(new.params(), expr.params(), rtol=1e-6, atol=1e-8)
    if moved:
        model.engine.kernel_kind = new
    return moved
