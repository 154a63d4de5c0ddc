"""On-device neighbor-table rebuild (minimum-image convention).

The host Verlet-skin rebuild (neighbors.py + the table upload) costs
0.5-3 s over the remote-TPU tunnel; for diffusive systems (liquids, the
reference's flagship Li10GeP2S12 superionic conductor) rebuilds fire
every ~10-100 steps and dominate wall time.  This module rebuilds the
padded table ON the device from the current device positions, so
device-resident MD (md/device_md.py) never leaves the chip for a skin
breach.

Method: chunked brute-force MIC.  For each row block of B atoms, the
fractional pair deltas g = f_j - f_i give the image shift
``off = -rint(g)`` and displacement ``rvec = (g + off) @ cell``; pairs
with d <= cutoff are compacted left into the fixed K slots with a
cumsum + scatter (no sort).  O(N^2) flops are trivial next to the MD
step itself (the N x N work is matmul/elementwise; a rebuild at 10k
atoms is ~15 ms vs ~500 ms host + upload), and the row blocks bound
memory at B x N.

Valid when every perpendicular cell width is >= 2 * cutoff (the MIC
uniqueness condition — no self-images within the cutoff) and the system
is fully periodic; callers must check :func:`device_rebuild_ok` and fall
back to the host path otherwise (DeviceMD does).

Semantics match ``neighbors.neighbor_table`` row-wise as a SET: same
(j, off) pairs per atom (order may differ; every consumer is
order-invariant, and the pair-kernel dedup uses (idx, off) values, not
positions in the row).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def device_rebuild_ok(cell, pbc, cutoff):
    """Host-side gate: MIC brute-force validity for this box."""
    pbc = np.asarray(pbc, dtype=bool)
    if not pbc.all():
        return False
    cell = np.asarray(cell, dtype=float)
    if abs(np.linalg.det(cell)) < 1e-12:
        return False
    inv = np.linalg.inv(cell)
    widths = 1.0 / np.linalg.norm(inv, axis=0)  # perpendicular widths
    return bool((widths >= 2.0 * cutoff).all())


@partial(jax.jit, static_argnames=("kpad", "block"))
def device_neighbor_table(positions, cell, atom_mask, cutoff, kpad,
                          block=512, row_ids=None, row_mask=None):
    """Rebuild the padded neighbor table on device.

    Args:
        positions: (N, 3) current (possibly padded) positions.
        cell: (3, 3) rows = lattice vectors.
        atom_mask: (N,) bool; padded rows produce/receive no pairs.
        cutoff: scalar (rc + skin).
        kpad: static neighbor-slot count of the existing table bucket.
        block: static row-block size.
        row_ids: optional (n,) i32 GLOBAL atom ids to build rows for —
            the mesh shards' in-loop rebuild (each device owns a block
            of rows; candidates j still span all N replicated
            positions).  Default: all N rows.
        row_mask: (n,) bool validity of the row_ids rows (defaults to
            ``atom_mask[row_ids]``).
    Returns:
        (idx (n, kpad) i32, off (n, kpad, 3) i8, mask (n, kpad) bool,
         kmax (scalar i32), off_over (scalar bool)) — callers must check
        kmax <= kpad AND not off_over on host and fall back otherwise
        (bucket overflow drops slots silently; off_over means some image
        offset exceeded the int8 range — positions drifted >127 boxes
        apart, host path wraps and handles it).  ``idx`` entries are
        GLOBAL atom indices; empty slots self-point at the row's id.
    """
    N = positions.shape[0]
    dtype = positions.dtype
    inv = jnp.linalg.inv(cell)
    frac = positions @ inv  # (N, 3) possibly unwrapped
    cut2 = cutoff * cutoff

    if row_ids is None:
        row_ids = jnp.arange(N, dtype=jnp.int32)
        row_mask = atom_mask
    elif row_mask is None:
        row_mask = atom_mask[row_ids]
    nrow = row_ids.shape[0]
    nblk = -(-nrow // block)
    npad = nblk * block
    rows = jnp.arange(N, dtype=jnp.int32)  # candidate (j) ids, global
    fpad = jnp.pad(frac[row_ids], ((0, npad - nrow), (0, 0)))
    rpad = jnp.pad(row_ids, (0, npad - nrow))
    mpad = jnp.pad(row_mask, (0, npad - nrow))

    def one_block(args):
        fi, ri, mi = args  # (B, 3), (B,), (B,)
        g = frac[None, :, :] - fi[:, None, :]  # (B, N, 3) f_j - f_i
        off = -jnp.rint(g)
        w = g + off  # in [-0.5, 0.5)
        rvec = w @ cell.astype(dtype)
        d2 = (rvec * rvec).sum(-1)  # (B, N)
        self_pair = (rows[None, :N] == ri[:, None]) & (off == 0).all(-1)
        valid = (
            (d2 <= cut2)
            & ~self_pair
            & atom_mask[None, :]
            & mi[:, None]
        )
        # left-compaction into kpad slots (order: ascending j, stable);
        # invalid entries and slots past kpad scatter out-of-bounds and
        # are dropped (overflow is reported through the returned count)
        slot = jnp.cumsum(valid, axis=1) - 1  # (B, N)
        count = valid.sum(axis=1)
        off_over = (jnp.abs(off) > 127.0).any(-1) & valid
        slot_c = jnp.where(valid & (slot < kpad), slot, kpad)
        brows = jnp.arange(fi.shape[0])[:, None]
        j = jnp.broadcast_to(rows[None, :N], valid.shape).astype(jnp.int32)
        idx_b = jnp.zeros((fi.shape[0], kpad), dtype=jnp.int32)
        off_b = jnp.zeros((fi.shape[0], kpad, 3), dtype=jnp.int8)
        msk_b = jnp.zeros((fi.shape[0], kpad), dtype=bool)
        idx_b = idx_b.at[brows, slot_c].set(j, mode="drop")
        off_b = off_b.at[brows, slot_c].set(off.astype(jnp.int8), mode="drop")
        msk_b = msk_b.at[brows, slot_c].set(True, mode="drop")
        idx_b = jnp.where(msk_b, idx_b, ri[:, None])
        off_b = jnp.where(msk_b[..., None], off_b, 0)
        return idx_b, off_b, msk_b, count, off_over.any()

    fblk = fpad.reshape(nblk, block, 3)
    rblk = rpad.reshape(nblk, block)
    mblk = mpad.reshape(nblk, block)
    idx, off, mask, count, off_over = jax.lax.map(
        one_block, (fblk, rblk, mblk)
    )
    idx = idx.reshape(npad, kpad)[:nrow]
    off = off.reshape(npad, kpad, 3)[:nrow]
    mask = mask.reshape(npad, kpad)[:nrow]
    kmax = count.reshape(npad)[:nrow].max()
    return idx, off, mask, kmax, off_over.any()


@partial(jax.jit, static_argnames=("block",))
def reverse_slots(idx, off, mask, block=64):
    """Reverse-slot table: ``rev[j, k'] = i * K + k`` (flat) such that
    ``idx[i, k] == j`` and ``off[i, k] == -off[j, k']`` where
    ``i = idx[j, k']``; ``-1`` on masked slots.

    Neighbor tables are symmetric (every (i, j, off) pair appears as
    (j, i, -off)), so the transpose of the table is a permutation of its
    slots.  This turns the scatter-add in the force VJP — the single most
    expensive op of the MD step on TPU (XLA lowers scatter poorly) — into
    a plain gather (see engine._nbr_gather_rev); the reference pays
    neither because torch CPU scatter is cheap (its cost lives in the
    per-atom python loops instead, atoms.py:405-410).

    Offset matching (not just pair matching) keeps multiple periodic
    images of the same pair distinct, including self-images i == j.

    Precondition: the table carries NO duplicate (j, off) entries within a
    row.  Duplicates would make argmax map two forward slots onto the same
    reverse slot (one contribution double-counted, one dropped).  Both
    builders (neighbors.neighbor_table, device_neighbor_table) emit each
    (pair, image) exactly once, so this holds by construction.
    """
    N, K = idx.shape
    nblk = -(-N // block)
    npad = nblk * block
    idx_p = jnp.pad(idx, ((0, npad - N), (0, 0)))
    off_p = jnp.pad(off, ((0, npad - N), (0, 0), (0, 0)))
    mask_p = jnp.pad(mask, ((0, npad - N), (0, 0)))
    rows = jnp.arange(npad, dtype=jnp.int32)

    def one_block(args):
        idx_b, off_b, mask_b, rows_b = args  # (B, K), (B, K, 3), (B, K), (B,)
        i = idx_b  # (B, K) candidate rows
        cand_idx = idx_p[i]  # (B, K, K)
        cand_off = off_p[i]  # (B, K, K, 3)
        cand_mask = mask_p[i]  # (B, K, K)
        match = (
            (cand_idx == rows_b[:, None, None])
            & (cand_off == -off_b[:, :, None, :]).all(-1)
            & cand_mask
        )
        rev_k = jnp.argmax(match, axis=-1).astype(jnp.int32)
        found = match.any(axis=-1) & mask_b
        return jnp.where(found, i * K + rev_k, -1)

    rev = jax.lax.map(
        one_block,
        (
            idx_p.reshape(nblk, block, K),
            off_p.reshape(nblk, block, K, 3),
            mask_p.reshape(nblk, block, K),
            rows.reshape(nblk, block),
        ),
    )
    return rev.reshape(npad, K)[:N]
