"""Neighbor tables: brute-force oracle over periodic images."""

import numpy as np

from autoforce_tpu.neighbors import displacements, neighbor_table
from autoforce_tpu.system import System, bulk_fcc


def brute_force_pairs(positions, cell, pbc, rc):
    """All (i, j, offset) pairs with 0 < |r| <= rc, searching a wide image range."""
    n = len(positions)
    reps = [3 if p else 0 for p in pbc]
    out = set()
    for i in range(n):
        for j in range(n):
            for a in range(-reps[0], reps[0] + 1):
                for b in range(-reps[1], reps[1] + 1):
                    for c in range(-reps[2], reps[2] + 1):
                        off = np.array([a, b, c])
                        r = positions[j] - positions[i] + off @ cell
                        d = np.linalg.norm(r)
                        if d < 1e-12:
                            continue
                        if d <= rc + 1e-12:
                            out.add((i, j, a, b, c))
    return out


def table_pairs(t):
    out = set()
    for i in range(t.idx.shape[0]):
        for k in range(t.idx.shape[1]):
            if t.mask[i, k]:
                out.add((i, int(t.idx[i, k]), *[int(x) for x in t.off[i, k]]))
    return out


def test_fcc_neighbors():
    s = bulk_fcc("Cu", 3.6).repeat((2, 2, 2))
    rc = 3.0
    t = neighbor_table(s.positions, s.cell, s.pbc, rc)
    # fcc first shell at a/sqrt(2) = 2.546: 12 neighbors each
    assert (t.mask.sum(axis=1) == 12).all()
    assert table_pairs(t) == brute_force_pairs(s.positions, s.cell, s.pbc, rc)


def test_random_triclinic():
    rng = np.random.default_rng(11)
    cell = np.array([[6.0, 0, 0], [1.2, 5.5, 0], [-0.7, 0.9, 6.2]])
    pos = rng.uniform(0, 1, (12, 3)) @ cell
    rc = 3.4
    t = neighbor_table(pos, cell, (True, True, True), rc)
    assert table_pairs(t) == brute_force_pairs(pos, cell, (True, True, True), rc)
    # displacement vectors agree with index/offset reconstruction
    r = displacements(pos, cell, t)
    d = np.linalg.norm(r, axis=-1)
    assert (d[t.mask] <= rc + 1e-9).all()


def test_nonperiodic_and_mixed():
    rng = np.random.default_rng(4)
    pos = rng.uniform(0, 8, (15, 3))
    cell = np.eye(3) * 8.0
    for pbc in [(False, False, False), (True, False, True)]:
        t = neighbor_table(pos, cell, pbc, 3.0)
        assert table_pairs(t) == brute_force_pairs(pos, cell, pbc, 3.0)


def test_symmetry():
    """Full (bothways) list: pair (i,j,off) implies (j,i,-off)."""
    s = bulk_fcc("Cu", 3.6)
    s.rattle(0.05, seed=1)
    t = neighbor_table(s.positions, s.cell, s.pbc, 4.0)
    pairs = table_pairs(t)
    for (i, j, a, b, c) in pairs:
        assert (j, i, -a, -b, -c) in pairs
