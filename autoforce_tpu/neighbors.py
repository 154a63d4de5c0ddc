"""Neighbor tables as padded arrays.

Replaces the reference's per-atom ``ase.neighborlist.NeighborList`` +
``Local`` objects (reference: theforce/descriptor/atoms.py:348-382) with a
single padded table for the whole configuration:

    idx  (N, K) int32   neighbor atom index j
    off  (N, K, 3) int32  integer PBC image of j
    mask (N, K) bool    True for real neighbors

Displacement vectors are *not* stored; they are recomputed inside jit as
``r_ij = pos[j] - pos[i] + off @ cell`` so that energies stay differentiable
w.r.t. positions and cell (forces + stress from one autodiff pass).

Construction runs on host with a periodic-image KD-tree (scipy), full
("bothways") lists like the reference.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from scipy.spatial import cKDTree


@dataclass
class NeighborTable:
    idx: np.ndarray  # (N, K) int32
    off: np.ndarray  # (N, K, 3) int32
    mask: np.ndarray  # (N, K) bool
    cutoff: float

    @property
    def kmax(self):
        return self.idx.shape[1]

    def pad_to(self, kpad):
        """Re-pad the K axis to ``kpad`` columns (kpad >= current K)."""
        n, k = self.idx.shape
        if kpad < k:
            raise ValueError(f"kpad {kpad} < current K {k}")
        if kpad == k:
            return self
        idx = np.zeros((n, kpad), dtype=np.int32)
        off = np.zeros((n, kpad, 3), dtype=np.int32)
        mask = np.zeros((n, kpad), dtype=bool)
        idx[:, :k] = self.idx
        off[:, :k] = self.off
        mask[:, :k] = self.mask
        # padding rows point at the atom itself; masked out downstream
        idx[:, k:] = np.arange(n, dtype=np.int32)[:, None]
        return NeighborTable(idx, off, mask, self.cutoff)


def _cell_heights(cell):
    """Distance between opposite cell faces along each axis."""
    v = abs(np.linalg.det(cell))
    if v < 1e-12:
        return np.full(3, np.inf)
    h = np.empty(3)
    for i in range(3):
        a, b = cell[(i + 1) % 3], cell[(i + 2) % 3]
        cross = np.cross(a, b)
        h[i] = v / np.linalg.norm(cross)
    return h


def round_up(x, m):
    return int(-(-x // m) * m)


def neighbor_table(positions, cell, pbc, cutoff, kpad_multiple=8):
    """Build the full (bothways) neighbor table within ``cutoff``.

    Matches the reference's bothways NeighborList with skin=0
    (theforce/descriptor/atoms.py:348-363), pairs at d <= cutoff.
    """
    positions = np.asarray(positions, dtype=np.float64)
    cell = np.asarray(cell, dtype=np.float64)
    pbc = np.asarray(pbc, dtype=bool)
    n = len(positions)
    if n == 0:
        e = np.zeros((0, 0), dtype=np.int32)
        return NeighborTable(e, e.reshape(0, 0, 3), e.astype(bool), cutoff)

    if pbc.any():
        h = _cell_heights(cell)
        reps = [
            int(np.ceil(cutoff / h[i])) if pbc[i] and np.isfinite(h[i]) else 0
            for i in range(3)
        ]
    else:
        reps = [0, 0, 0]

    offsets = np.array(
        [
            (i, j, k)
            for i in range(-reps[0], reps[0] + 1)
            for j in range(-reps[1], reps[1] + 1)
            for k in range(-reps[2], reps[2] + 1)
        ],
        dtype=np.int32,
    )
    n_img = len(offsets)
    shifts = offsets.astype(np.float64) @ cell  # (n_img, 3)
    # image cloud: images[m*n + a] = positions[a] + shifts[m]
    images = (positions[None, :, :] + shifts[:, None, :]).reshape(-1, 3)
    tree = cKDTree(images)
    # query pairs: for each base atom i, all image points within cutoff
    lists = tree.query_ball_point(positions, cutoff + 1e-12)

    counts = np.zeros(n, dtype=np.int64)
    for i, lst in enumerate(lists):
        counts[i] = len(lst)
    kmax = int(counts.max()) if n else 0  # includes self once
    kpad = max(kpad_multiple, round_up(max(kmax - 1, 1), kpad_multiple))

    idx = np.tile(np.arange(n, dtype=np.int32)[:, None], (1, kpad))
    off = np.zeros((n, kpad, 3), dtype=np.int32)
    mask = np.zeros((n, kpad), dtype=bool)
    for i, lst in enumerate(lists):
        arr = np.asarray(lst, dtype=np.int64)
        img = arr // n
        j = arr % n
        keep = ~((j == i) & (img == n_img // 2))  # drop self at zero offset
        j = j[keep]
        img = img[keep]
        c = len(j)
        if c > kpad:
            raise RuntimeError("neighbor overflow (should not happen)")
        idx[i, :c] = j.astype(np.int32)
        off[i, :c] = offsets[img]
        mask[i, :c] = True
    return NeighborTable(idx, off, mask, cutoff)


def displacements(positions, cell, table):
    """Host-side displacement vectors r_ij (N, K, 3) for verification."""
    r = positions[table.idx] - positions[:, None, :] + table.off @ cell
    return r
