"""Model compression (shrink/sparsify) and structure utilities."""

import numpy as np

from autoforce_tpu.regression.compress import shrink, sparsify
from autoforce_tpu.regression.sgpr import DataRecord
from autoforce_tpu.utils import (
    average_positions,
    generate_random_cluster,
    make_cell_upper_triangular,
    voronoi_neighbors,
)

from test_engine import env_from_system
from test_sgpr import lj_setup


def build_model():
    eng, lj, model, systems = lj_setup(nstruct=6)
    for k in range(5):
        for i in range(4):
            model.add_inducing(env_from_system(eng, systems[k], i), remake=False)
    for s in systems[:4]:
        model.add_data(DataRecord.from_system(s), remake=False)
    model.make_munu()
    return model


def test_shrink():
    model = build_model()
    m0 = model.m
    r2_before = model.stats["r2"]
    shrink(model, target_m=m0 - 6, candidates=8)
    assert model.m == m0 - 6
    model.make_munu()
    # redundancy in 20 similar fcc LCEs: force fit barely degrades
    assert model.stats["r2"] > r2_before - 0.02, (r2_before, model.stats["r2"])


def test_sparsify():
    model = build_model()
    m0 = model.m
    keep = sparsify(model, sweeps=1.0, seed=0)
    assert model.m == len(keep) <= m0
    model.make_munu()
    assert model.stats["r2"] > 0.99


def test_random_cluster():
    c = generate_random_cluster(50, 1.0, seed=0)
    d = np.linalg.norm(c[None] - c[:, None], axis=-1)
    d += np.eye(50) * 100
    np.testing.assert_allclose(d.min(axis=1), 1.0, rtol=1e-8)


def test_upper_triangular():
    from autoforce_tpu.system import System

    cell = np.array([[3.0, 1.0, 0.5], [0.2, 4.0, 0.3], [0.1, 0.4, 5.0]])
    s = System(numbers=[29, 29], positions=[[0, 0, 0], [1, 1, 1]], cell=cell,
               pbc=True)
    d0 = np.linalg.norm(s.positions[1] - s.positions[0])
    v0 = s.volume
    make_cell_upper_triangular(s)
    assert abs(s.cell[1, 0]) < 1e-10
    assert abs(s.cell[2, 0]) < 1e-10 and abs(s.cell[2, 1]) < 1e-10
    np.testing.assert_allclose(s.volume, v0, rtol=1e-10)
    np.testing.assert_allclose(
        np.linalg.norm(s.positions[1] - s.positions[0]), d0, rtol=1e-10
    )


def test_voronoi():
    # octahedral cage: all 6 are Voronoi neighbors; a far atom behind one is not
    r = np.array(
        [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1],
         [2.5, 0, 0]],
        dtype=float,
    )
    v = voronoi_neighbors(r)
    assert set(v) == set(range(6))


def test_average_positions():
    from autoforce_tpu.system import bulk_fcc

    frames = []
    for k in range(4):
        s = bulk_fcc("Cu", 3.6)
        s.positions = s.positions + (-1) ** k * 0.1
        frames.append(s)
    avg = average_positions(frames)
    np.testing.assert_allclose(avg.positions, bulk_fcc("Cu", 3.6).positions,
                               atol=1e-12)
