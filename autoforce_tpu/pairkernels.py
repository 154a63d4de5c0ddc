"""Two-body (pair) similarity kernels, composable with the SOAP kernel.

Counterpart of the reference's PairSimilarityKernel family
(theforce/similarity/pair.py:11-240): kernels between LCEs built from
species-pair-selected interatomic distances,

    k(P, Q) = sum_{pairs d in P} sum_{pairs d' in Q}
              kappa(psi(d), psi(d')) * fac(d) * fac(d')

with psi = identity (DistanceKernel) or log (LogDistanceKernel),
kappa = RBF, and fac = 1 | PolyCut (PairKernel w/ factor) | repulsive
core * PolyCut (RepulsiveCoreKernel).  Pairs are deduplicated like the
reference's ``Local.select`` (pair.py:28-34): within a configuration each
physical pair belongs to exactly one LCE (j > i, or the lexicographic
offset rule for self-image pairs).

The Gram contraction runs as a chunked map over the inducing axis so the
(n, m, K, K') tensor never materializes.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class PairTerm:
    a: int  # species pair (atomic numbers)
    b: int
    kind: str = "rbf"  # 'rbf' (distance) | 'logrbf' (log distance)
    lengthscale: float = 1.0
    signal: float = 1.0
    factor: str | None = "polycut"  # None | 'polycut' | 'repulsive'
    rc: float = 6.0
    factor_n: int = 2
    eta: int = 1


def _psi(d, term: PairTerm):
    if term.kind == "logrbf":
        return jnp.log(jnp.maximum(d, 1e-12))
    return d


def _factor(d, term: PairTerm):
    if term.factor is None:
        return jnp.ones_like(d)
    t = 1.0 - d / term.rc
    cut = jnp.where(d < term.rc, t**term.factor_n, 0.0)
    if term.factor == "repulsive":
        return cut / jnp.maximum(d, 1e-6) ** term.eta
    return cut


def _lex3(off):
    """First-nonzero-positive rule for self-image pairs (atoms.py:25-33)."""
    o0, o1, o2 = off[..., 0], off[..., 1], off[..., 2]
    return jnp.where(
        o0 != 0, o0 > 0, jnp.where(o1 != 0, o1 > 0, jnp.where(o2 != 0, o2 > 0, True))
    )


def config_pair_mask(term: PairTerm, numbers, nbr_numbers, nbr_idx, nbr_off,
                     nbr_mask, own_idx=None):
    """Species selection + dedup for all LCEs of a configuration.

    ``own_idx``: global atom index of each table row (sharded row blocks
    where ``nbr_idx`` holds global indices); None = rows are 0..n-1.
    """
    zi = numbers[:, None]
    zj = nbr_numbers
    sel = ((zi == term.a) & (zj == term.b)) | ((zi == term.b) & (zj == term.a))
    if own_idx is None:
        row = jnp.arange(numbers.shape[0])[:, None]
    else:
        row = own_idx[:, None]
    dedup = (nbr_idx > row) | ((nbr_idx == row) & _lex3(nbr_off))
    return sel & nbr_mask & dedup


def env_pair_mask(term: PairTerm, number, nbr_numbers, nbr_mask):
    """Species selection for a detached env (central j=0, all kept)."""
    sel = ((number == term.a) & (nbr_numbers == term.b)) | (
        (number == term.b) & (nbr_numbers == term.a)
    )
    return sel & nbr_mask


def pair_gram(d1, m1, d2, m2, term: PairTerm, chunk=16):
    """(n, m) Gram block between pair-distance sets.

    d1 (n, K), m1 (n, K) bool; d2 (m, K2), m2 (m, K2) bool.
    """
    x1 = _psi(d1, term)
    f1 = _factor(d1, term) * m1
    x2 = _psi(d2, term)
    f2 = _factor(d2, term) * m2
    ell2 = 2.0 * term.lengthscale**2
    s2 = term.signal**2

    mtot = x2.shape[0]
    if mtot == 0:
        return jnp.zeros((x1.shape[0], 0), dtype=d1.dtype)

    def one(args):
        x2r, f2r = args  # (K2,)
        diff = x1[:, :, None] - x2r[None, None, :]
        k = jnp.exp(-(diff**2) / ell2)
        w = f1[:, :, None] * f2r[None, None, :]
        return s2 * (k * w).sum(axis=(1, 2))  # (n,)

    out = jax.lax.map(one, (x2, f2), batch_size=min(chunk, mtot))  # (m, n)
    return out.T


def pair_diag(d, m, term: PairTerm):
    """k(P, P) for each LCE (needed for covloss normalization)."""
    x = _psi(d, term)
    f = _factor(d, term) * m
    ell2 = 2.0 * term.lengthscale**2
    diff = x[:, :, None] - x[:, None, :]
    k = jnp.exp(-(diff**2) / ell2)
    w = f[:, :, None] * f[:, None, :]
    return term.signal**2 * (k * w).sum(axis=(1, 2))


def env_pair_counts(env, terms):
    """Per-term selected-pair counts (for buffer sizing)."""
    out = []
    for term in terms:
        sel = ((env.number == term.a) & (env.numbers == term.b)) | (
            (env.number == term.b) & (env.numbers == term.a)
        )
        out.append(int(sel.sum()))
    return out


def stage_env_pairs(env, terms, kx):
    """Host: padded (T, kx) distances + masks for an InducingEnv."""
    T = len(terms)
    d = np.zeros((T, kx))
    m = np.zeros((T, kx), dtype=bool)
    dist = np.linalg.norm(env.rvec, axis=1) if len(env.numbers) else np.zeros(0)
    for t, term in enumerate(terms):
        sel = ((env.number == term.a) & (env.numbers == term.b)) | (
            (env.number == term.b) & (env.numbers == term.a)
        )
        c = int(sel.sum())
        if c > kx:
            raise ValueError("pair buffer overflow; increase kx")
        d[t, :c] = dist[sel]
        m[t, :c] = True
    return d, m


def _np_psi(d, term):
    return np.log(np.maximum(d, 1e-12)) if term.kind == "logrbf" else d


def _np_factor(d, term):
    if term.factor is None:
        return np.ones_like(d)
    cut = np.where(d < term.rc, (1.0 - d / term.rc) ** term.factor_n, 0.0)
    if term.factor == "repulsive":
        return cut / np.maximum(d, 1e-6) ** term.eta
    return cut


def env_pair_list(env, term):
    """Selected pair distances of a detached env (host numpy)."""
    if len(env.numbers) == 0:
        return np.zeros(0)
    sel = ((env.number == term.a) & (env.numbers == term.b)) | (
        (env.number == term.b) & (env.numbers == term.a)
    )
    return np.linalg.norm(env.rvec[sel], axis=1)


def pair_kernel_env_vs_stage_np(env, d2, m2, terms):
    """(m,) pair-kernel column of one env against staged (T, m, kx)
    distance/mask arrays — the vectorized form of the per-env
    pair_kernel_envs_np loop (reference pair.py forward over LocalsData)."""
    out = np.zeros(d2.shape[1])
    for t, term in enumerate(terms):
        d1 = env_pair_list(env, term)
        if d1.size == 0:
            continue
        x1 = _np_psi(d1, term)[:, None, None]
        f1 = _np_factor(d1, term)[:, None, None]
        x2 = _np_psi(d2[t], term)[None]
        f2 = (_np_factor(d2[t], term) * m2[t])[None]
        k = np.exp(-((x1 - x2) ** 2) / (2 * term.lengthscale**2))
        out += term.signal**2 * (k * f1 * f2).sum(axis=(0, 2))
    return out


def pair_cols_config_np(positions, cell, numbers, nl, rc, env, terms,
                        chunk=2048):
    """(N,) pair-kernel column of every LCE of a configuration against one
    detached env — vectorized over atoms (replaces the O(N) python
    extract_env loop in the sampling path)."""
    n = len(numbers)
    out = np.zeros(n)
    have = [env_pair_list(env, term) for term in terms]
    if all(d.size == 0 for d in have):
        return out
    idx = nl.idx
    off = nl.off
    msk = nl.mask
    for lo in range(0, n, chunk):
        sl = slice(lo, min(lo + chunk, n))
        r = (
            positions[idx[sl]]
            - positions[sl][:, None, :]
            + off[sl] @ cell
        )
        d = np.linalg.norm(r, axis=-1)
        within = msk[sl] & (d <= rc)
        zi = numbers[sl][:, None]
        zj = numbers[idx[sl]]
        for t, term in enumerate(terms):
            d1 = have[t]
            if d1.size == 0:
                continue
            sel = ((zi == term.a) & (zj == term.b)) | (
                (zi == term.b) & (zj == term.a)
            )
            f = _np_factor(d, term) * (sel & within)
            x = _np_psi(d, term)
            x2 = _np_psi(d1, term)[None, None, :]
            f2 = _np_factor(d1, term)[None, None, :]
            k = np.exp(
                -((x[:, :, None] - x2) ** 2) / (2 * term.lengthscale**2)
            )
            out[sl] += term.signal**2 * (
                k * f[:, :, None] * f2
            ).sum(axis=(1, 2))
    return out


def pair_kernel_envs_np(env1, env2, terms):
    """Host kernel between two envs, summed over pair terms."""
    total = 0.0
    for term in terms:
        d1 = _np_psi(env_pair_list(env1, term), term)
        d2 = _np_psi(env_pair_list(env2, term), term)
        if d1.size == 0 or d2.size == 0:
            continue
        f1 = _np_factor(env_pair_list(env1, term), term)
        f2 = _np_factor(env_pair_list(env2, term), term)
        k = np.exp(-((d1[:, None] - d2[None, :]) ** 2) / (2 * term.lengthscale**2))
        total += term.signal**2 * (k * (f1[:, None] * f2[None, :])).sum()
    return float(total)
