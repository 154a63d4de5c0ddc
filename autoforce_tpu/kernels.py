"""Kernel (covariance) Gram blocks between local chemical environments.

The default AutoForce kernel between two LCEs with descriptors p, q and
central atomic numbers z_p, z_q is

    k(p, q) = delta(z_p, z_q) * (p . q)^zeta          (universal.py:109-122)

plus the lone-atom correction: two neighborless LCEs of the same species
have k = 1 (similarity.py:94-103).  On normalized descriptors the diagonal
k(x,x) is exactly 1 (including lone atoms).

Everything here is dense-matmul-shaped (MXU-friendly); species selection is
a mask, not control flow.
"""

import jax
import jax.numpy as jnp

from .kernelalgebra import KernelExpr


def precise_sum(x, axis=None):
    """Sum that defeats XLA's reduce-of-dot rewrite on TPU.

    ``(cov @ mu).sum()`` gets algebraically folded by XLA into a single
    synthesized contraction that IGNORES the session matmul-precision
    override and accumulates in bfloat16: measured 0.69 abs error at
    |E| ~ 190 eV (1008 atoms, f32) vs 0.009 for matvec + true f32 reduce;
    ``jnp.einsum(precision='highest')`` still loses 0.19.  The
    optimization barrier materializes the operand, so the reduce that
    follows is a real f32 reduction (plain f32 vector sums measured exact
    to 5e-6).  Apply to every reduction whose operand is (elementwise of)
    a matmul product and whose result carries physics (energies, Ke,
    covloss).
    """
    return jax.lax.optimization_barrier(x).sum(axis=axis)


def base_kernel(dot, exponent, kind="dot", lengthscale=1.0):
    """Base-kernel algebra on normalized-descriptor dot products
    (reference regression/kernel.py): 'dot' -> (p.q)^zeta (DotProd**zeta),
    'rbf' -> exp((p.q - 1)/l^2)  (= RBF on unit-norm descriptors, since
    ||p-q||^2 = 2 - 2 p.q), 'normed' -> plain p.q (Normed/DotProd) — or
    any composable :class:`~autoforce_tpu.kernelalgebra.KernelExpr`
    (e.g. ``DotProd()**4 + 0.01*White()``), the full reference algebra."""
    if isinstance(kind, KernelExpr):
        return kind.value(dot)
    if kind == "dot":
        return dot**exponent
    if kind == "rbf":
        return jnp.exp((dot - 1.0) / lengthscale**2)
    if kind == "normed":
        return dot
    raise ValueError(f"unknown kernel kind {kind}")


def gram(p1, z1, lone1, p2, z2, lone2, exponent, chem=None, kind="dot",
         lengthscale=1.0):
    """Kernel block between two sets of LCEs.

    Args:
        p1: (n, D) descriptors;  z1: (n,) central atomic numbers;
        lone1: (n,) bool, True for environments with zero neighbors.
        p2/z2/lone2: (m, ...) likewise.
        exponent: static int zeta.
        chem: optional (Zmax, Zmax) alchemical central-species factor
            (chi table); None -> Dirac delta (universal.py:17-29).
    Returns:
        (n, m) kernel matrix.
    """
    dtype = p1.dtype
    dot = p1 @ p2.T
    if chem is None:
        same = (z1[:, None] == z2[None, :]).astype(dtype)
    else:
        same = chem[z1[:, None], z2[None, :]].astype(dtype)
    k = base_kernel(dot, exponent, kind, lengthscale) * same
    # lone-atom correction stays a strict same-species rule
    eq = (z1[:, None] == z2[None, :]).astype(dtype)
    k = k + (lone1[:, None] & lone2[None, :]).astype(dtype) * eq * (
        same if chem is not None else 1.0
    )
    return k


def covloss_beta(choli, cov, vscale_atom, m_mask, alpha=None):
    """Per-atom uncertainty beta (reference active.py:781-804).

    beta_i = sqrt(max(0, 1 - ||choli @ k_i||^2 / k(x_i,x_i)))
             * sqrt(vscale(z_i))

    alpha is the kernel diagonal k(x_i, x_i); None means normalized (=1).
    """
    b = (choli * m_mask[None, :]) @ (cov * m_mask[None, :]).T  # (M, n)
    # reduce-of-dot: keep the reduction in true f32 (see precise_sum —
    # beta feeds threshold comparisons, a bf16-folded sum adds a ~0.02
    # noise floor near c = 1)
    c = precise_sum(b * b, axis=0)
    if alpha is not None:
        c = c / alpha
    beta = jnp.sqrt(jnp.clip(1.0 - c, 0.0, None))
    return beta * jnp.sqrt(vscale_atom)
