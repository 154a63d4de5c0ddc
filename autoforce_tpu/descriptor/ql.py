"""Steinhardt bond-order parameters Q_l (counterpart of
theforce/descriptor/ql.py), used as metadynamics collective variables.

    q_lm = sum_j w(r_j) Y_lm(r_j) / sum_j w(r_j)
    Q_l  = sqrt( 4 pi / (2l+1) * sum_m |q_lm|^2 )

with the PolyCut weight w.  Differentiable (jax).
"""

import math

import jax.numpy as jnp

from .harmonics import m_weights, solid_harmonics


def steinhardt_ql(rvec, lmax, cutoff, cut_n=2):
    """Q_l for l=0..lmax from neighbor displacement vectors (k, 3)."""
    d = jnp.sqrt((rvec * rvec).sum(-1))
    w = jnp.where(d < cutoff, (1.0 - d / cutoff) ** cut_n, 0.0)
    r = jnp.where(d[:, None] > 0, rvec / d[:, None], 0.0)
    Yr, Yi = solid_harmonics(r, lmax)  # unit vectors -> plain Ylm
    qr = (w[:, None, None] * Yr).sum(0) / w.sum()
    qi = (w[:, None, None] * Yi).sum(0) / w.sum()
    mw = m_weights(lmax, dtype=rvec.dtype)
    q2 = jnp.einsum("lm,lm->l", qr * qr + qi * qi, mw)
    coeff = 4.0 * math.pi / (2.0 * jnp.arange(lmax + 1) + 1.0)
    return jnp.sqrt(coeff * q2)
