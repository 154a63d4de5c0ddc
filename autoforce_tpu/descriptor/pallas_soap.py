"""Pallas TPU kernels for the SOAP expansion-coefficient hot path.

The heaviest part of the descriptor is the per-neighbor pipeline
(radials + solid harmonics + species-masked reduction over K neighbors):
it produces ~20 intermediate (N, K)-shaped arrays that XLA streams
through HBM.  These kernels keep the whole pipeline in VMEM per atom
block and emit only the (N, CH) coefficient matrices:

    cR[i, (s, n, l, m)] = sum_k 1[sidx=s] f_n(d_k) * Re[r^l Ylm](x_k)
    cI likewise,

plus a hand-derived backward kernel (cRbar, cIbar) -> rvec_bar built on
the closed-form derivatives of the polynomial recursion
(descriptor/harmonics.py): dC_m = m*C_{m-1}, dS_m = m*S_{m-1} (etc.) and
the recursive partials of the scaled associated Legendre functions.

The surrounding contraction (power spectrum, nnl, normalization) stays in
XLA — it is tiny einsum work that XLA fuses well.  Exposed through
``sesoap_coefficients_pl`` with a jax.custom_vjp, drop-in compatible with
``soap.sesoap_coefficients`` (modulo the flattened channel axis).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .harmonics import _coeff_tables

_Y00 = math.sqrt(1.0 / (4.0 * math.pi))


def _lm_list(lmax):
    return [(l, m) for l in range(lmax + 1) for m in range(l + 1)]


def _radial_parts(xs, ys, zs, unit, fmask, rc, cut_n, nmax):
    """Shared forward intermediates on (BN, K) tiles."""
    d2 = xs * xs + ys * ys + zs * zs
    d = jnp.sqrt(d2)
    dphys = d * unit
    t = 1.0 - dphys / rc
    inside = (dphys < rc).astype(xs.dtype)
    cut = inside * t**cut_n
    dcut = inside * (-cut_n / rc) * t ** (cut_n - 1)  # d cut / d dphys
    expf = jnp.exp(-0.5 * d2)
    g = cut * expf * fmask
    f = [g * d ** (2 * n) for n in range(nmax + 1)]
    return d, d2, cut, dcut, expf, g, f


def _harmonics_parts(xs, ys, zs, d2, lmax, with_derivs=False):
    """P~[l][m] (+ partials) and C/S on (BN, K) tiles."""
    A, B, C, D = _coeff_tables(lmax)
    one = jnp.ones_like(xs)
    zero = jnp.zeros_like(xs)
    L = lmax + 1
    P = [[_Y00 * one]]
    dP = [[(zero, zero, zero)]] if with_derivs else None
    for l in range(1, L):
        row = []
        drow = []
        for m in range(l - 1):
            val = A[(l, m)] * (zs * P[l - 1][m] + d2 * B[(l, m)] * P[l - 2][m])
            row.append(val)
            if with_derivs:
                p1x, p1y, p1z = dP[l - 1][m]
                p2x, p2y, p2z = dP[l - 2][m]
                b = B[(l, m)]
                drow.append((
                    A[(l, m)] * (zs * p1x + b * (2 * xs * P[l - 2][m] + d2 * p2x)),
                    A[(l, m)] * (zs * p1y + b * (2 * ys * P[l - 2][m] + d2 * p2y)),
                    A[(l, m)] * (P[l - 1][m] + zs * p1z
                                 + b * (2 * zs * P[l - 2][m] + d2 * p2z)),
                ))
        # m = l-1: c_l * z * P[l-1][l-1]
        row.append(C[l] * zs * P[l - 1][l - 1])
        if with_derivs:
            px, py, pz = dP[l - 1][l - 1]
            drow.append((C[l] * zs * px, C[l] * zs * py,
                         C[l] * (P[l - 1][l - 1] + zs * pz)))
        # m = l: constant
        row.append(D[l] * P[l - 1][l - 1])
        if with_derivs:
            px, py, pz = dP[l - 1][l - 1]
            drow.append((D[l] * px, D[l] * py, D[l] * pz))
        P.append(row)
        if with_derivs:
            dP.append(drow)
    # C_m, S_m and their closed-form partials
    Cm = [one]
    Sm = [zero]
    for m in range(1, L):
        Cm.append(xs * Cm[-1] - ys * Sm[-1])
        Sm.append(ys * Cm[-2] + xs * Sm[-1])
    return P, dP, Cm, Sm


def _fwd_kernel(rvec_ref, sidx_ref, mask_ref, radii_ref, cr_ref, ci_ref,
                *, lmax, nmax, nspecies, rc, cut_n):
    xs0 = rvec_ref[:, :, 0]
    ys0 = rvec_ref[:, :, 1]
    zs0 = rvec_ref[:, :, 2]
    sidx = sidx_ref[:, :]
    fmask = mask_ref[:, :]
    # masked entries -> inert dummy far outside the cutoff
    keep = fmask != 0.0
    xs0 = jnp.where(keep, xs0, 2.0 * rc)
    ys0 = jnp.where(keep, ys0, 0.0)
    zs0 = jnp.where(keep, zs0, 0.0)
    unit = jnp.ones_like(xs0)
    for s in range(nspecies):
        unit = jnp.where(sidx == s, radii_ref[0, s], unit)
    xs, ys, zs = xs0 / unit, ys0 / unit, zs0 / unit
    d, d2, cut, dcut, expf, g, f = _radial_parts(
        xs, ys, zs, unit, fmask, rc, cut_n, nmax
    )
    P, _, Cm, Sm = _harmonics_parts(xs, ys, zs, d2, lmax)
    lm = _lm_list(lmax)
    L = lmax + 1
    crs = []
    cis = []
    for s in range(nspecies):
        sm = (sidx == s).astype(xs.dtype) * fmask
        for n in range(nmax + 1):
            base = f[n] * sm
            for l in range(L):
                for m in range(L):
                    if m <= l:
                        crs.append(jnp.sum(base * P[l][m] * Cm[m], axis=1,
                                           keepdims=True))
                        cis.append(jnp.sum(base * P[l][m] * Sm[m], axis=1,
                                           keepdims=True))
                    else:
                        crs.append(jnp.zeros_like(base[:, :1]))
                        cis.append(jnp.zeros_like(base[:, :1]))
    cr_ref[:, :] = jnp.concatenate(crs, axis=1)
    ci_ref[:, :] = jnp.concatenate(cis, axis=1)


def _bwd_kernel(rvec_ref, sidx_ref, mask_ref, radii_ref, crb_ref, cib_ref,
                out_ref, *, lmax, nmax, nspecies, rc, cut_n):
    xs0 = rvec_ref[:, :, 0]
    ys0 = rvec_ref[:, :, 1]
    zs0 = rvec_ref[:, :, 2]
    sidx = sidx_ref[:, :]
    fmask = mask_ref[:, :]
    keep = fmask != 0.0
    xs0 = jnp.where(keep, xs0, 2.0 * rc)
    ys0 = jnp.where(keep, ys0, 0.0)
    zs0 = jnp.where(keep, zs0, 0.0)
    unit = jnp.ones_like(xs0)
    for s in range(nspecies):
        unit = jnp.where(sidx == s, radii_ref[0, s], unit)
    xs, ys, zs = xs0 / unit, ys0 / unit, zs0 / unit
    d, d2, cut, dcut, expf, g, f = _radial_parts(
        xs, ys, zs, unit, fmask, rc, cut_n, nmax
    )
    P, dP, Cm, Sm = _harmonics_parts(xs, ys, zs, d2, lmax, with_derivs=True)
    L = lmax + 1
    gx = jnp.zeros_like(xs)
    gy = jnp.zeros_like(xs)
    gz = jnp.zeros_like(xs)
    inv_d = 1.0 / jnp.maximum(d, 1e-30)
    # d g / d x_a = [dcut * unit * (x_a/d)] * expf - cut * expf * x_a, masked
    dg_common = (dcut * unit * inv_d) * expf - cut * expf
    ch = 0
    for s in range(nspecies):
        sm = (sidx == s).astype(xs.dtype) * fmask
        for n in range(nmax + 1):
            # f_n = g * d^{2n}; df_n/dx_a = dg/dx_a d^{2n} + g 2n d^{2n-2} x_a
            dn = d ** (2 * n)
            if n > 0:
                dfn_over_xa = dg_common * dn + g * (2.0 * n) * d ** (2 * n - 2)
            else:
                dfn_over_xa = dg_common * dn
            fn = f[n] * sm
            dfn_over_xa = dfn_over_xa * sm
            for l in range(L):
                for m in range(L):
                    if m > l:
                        ch += 1
                        continue
                    crb = crb_ref[:, ch][:, None]
                    cib = cib_ref[:, ch][:, None]
                    ch += 1
                    Y_r = P[l][m] * Cm[m]
                    Y_i = P[l][m] * Sm[m]
                    # radial part: (df/dxa) * Y  with dxa = x_a * (...)
                    w = crb * (dfn_over_xa * Y_r) + cib * (dfn_over_xa * Y_i)
                    gx = gx + w * xs
                    gy = gy + w * ys
                    gz = gz + w * zs
                    # angular part: f * dY/dxa
                    px, py, pz = dP[l][m]
                    if m > 0:
                        dCx = m * Cm[m - 1]
                        dCy = -m * Sm[m - 1]
                        dSx = m * Sm[m - 1]
                        dSy = m * Cm[m - 1]
                    else:
                        dCx = dCy = dSx = dSy = jnp.zeros_like(xs)
                    dYr = (px * Cm[m] + P[l][m] * dCx,
                           py * Cm[m] + P[l][m] * dCy,
                           pz * Cm[m])
                    dYi = (px * Sm[m] + P[l][m] * dSx,
                           py * Sm[m] + P[l][m] * dSy,
                           pz * Sm[m])
                    gx = gx + fn * (crb * dYr[0] + cib * dYi[0])
                    gy = gy + fn * (crb * dYr[1] + cib * dYi[1])
                    gz = gz + fn * (crb * dYr[2] + cib * dYi[2])
    # scaled coords -> physical rvec: d/d rvec = (1/unit) d/dx ; kill padding
    scale = fmask / unit
    out_ref[:, :, 0] = gx * scale
    out_ref[:, :, 1] = gy * scale
    out_ref[:, :, 2] = gz * scale


def _channels(nspecies, nmax, lmax):
    return nspecies * (nmax + 1) * (lmax + 1) * (lmax + 1)


@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def sesoap_coefficients_pl(rvec, sidx, mask, radii, params, interpret=False):
    """(cR, cI) of shape (N, S*(nmax+1)*L*L); Pallas fwd + handwritten bwd."""
    cr, ci = _fwd(rvec, sidx, mask, radii, params, interpret)
    return cr, ci


def _block_n(n):
    return 8 if n % 8 == 0 else n


def _fwd(rvec, sidx, mask, radii, params, interpret):
    n, k, _ = rvec.shape
    S = radii.shape[0]
    CH = _channels(S, params.nmax, params.lmax)
    bn = _block_n(n)
    kern = partial(
        _fwd_kernel, lmax=params.lmax, nmax=params.nmax, nspecies=S,
        rc=params.rc, cut_n=params.cut_n,
    )
    dtype = rvec.dtype
    cr, ci = pl.pallas_call(
        kern,
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec((bn, k, 3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bn, CH), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, CH), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, CH), dtype),
            jax.ShapeDtypeStruct((n, CH), dtype),
        ],
        interpret=interpret,
    )(
        rvec,
        sidx.astype(jnp.int32),
        mask.astype(dtype),
        radii.astype(dtype).reshape(1, S),
    )
    return cr, ci


def _fwd_rule(rvec, sidx, mask, radii, params, interpret):
    out = _fwd(rvec, sidx, mask, radii, params, interpret)
    return out, (rvec, sidx, mask, radii)


def _bwd_rule(params, interpret, res, cots):
    rvec, sidx, mask, radii = res
    crb, cib = cots
    n, k, _ = rvec.shape
    S = radii.shape[0]
    CH = _channels(S, params.nmax, params.lmax)
    bn = _block_n(n)
    kern = partial(
        _bwd_kernel, lmax=params.lmax, nmax=params.nmax, nspecies=S,
        rc=params.rc, cut_n=params.cut_n,
    )
    dtype = rvec.dtype
    rbar = pl.pallas_call(
        kern,
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec((bn, k, 3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, CH), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, CH), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bn, k, 3), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, k, 3), dtype),
        interpret=interpret,
    )(
        rvec,
        sidx.astype(jnp.int32),
        mask.astype(dtype),
        radii.astype(dtype).reshape(1, S),
        crb.astype(dtype),
        cib.astype(dtype),
    )
    return rbar, None, None, None


sesoap_coefficients_pl.defvjp(_fwd_rule, _bwd_rule)


def sesoap_descriptors_pl(rvec, sidx, mask, radii, params, interpret=False):
    """Drop-in sesoap_descriptors built on the Pallas coefficient kernels."""
    from .harmonics import m_weights
    from .soap import _nnl_table

    S = radii.shape[0]
    L = params.lmax + 1
    nmax = params.nmax
    cr, ci = sesoap_coefficients_pl(rvec, sidx, mask, radii, params, interpret)
    n = rvec.shape[0]
    cR = cr.reshape(n, S, nmax + 1, L, L)
    cI = ci.reshape(n, S, nmax + 1, L, L)
    dtype = cR.dtype
    w = m_weights(params.lmax, dtype=dtype)
    p = jnp.einsum("xaulm,xbvlm,lm->xabuvl", cR, cR, w) + jnp.einsum(
        "xaulm,xbvlm,lm->xabuvl", cI, cI, w
    )
    nnl = jnp.asarray(_nnl_table(nmax, params.lmax), dtype=dtype)
    p = (p * nnl).reshape(n, -1)
    if params.normalize:
        eps = jnp.finfo(dtype).eps
        norm = jnp.sqrt((p * p).sum(axis=-1, keepdims=True) + eps * eps)
        p = p / norm
    return p
