"""Optimizers, cell filter, NEB."""

import numpy as np

from autoforce_tpu.calculator.oracles import LennardJones
from autoforce_tpu.opt import FIRE, LBFGS, NEB, UnitCellFilter
from autoforce_tpu.opt.neb import interpolate_images
from autoforce_tpu.system import System, bulk_fcc


def lj_cluster(seed=0):
    rng = np.random.default_rng(seed)
    s = System(
        numbers=[29] * 4,
        positions=[
            [0, 0, 0],
            [2.5, 0, 0],
            [0, 2.5, 0],
            [0, 0, 2.5],
        ],
    )
    s.positions = s.positions + rng.normal(0, 0.1, (4, 3))
    s.calc = LennardJones(epsilon=1.0, sigma=2.2, rc=8.0)
    return s


def test_fire_relax():
    s = lj_cluster(0)
    opt = FIRE(s, dt=0.05)
    assert opt.run(fmax=1e-3, steps=500)
    # tetrahedral LJ cluster: all bonds at r_min = 2^(1/6) sigma
    d01 = np.linalg.norm(s.positions[0] - s.positions[1])
    np.testing.assert_allclose(d01, 2 ** (1 / 6) * 2.2, rtol=1e-3)


def test_lbfgs_relax():
    s = lj_cluster(1)
    opt = LBFGS(s)
    assert opt.run(fmax=1e-4, steps=300)
    d01 = np.linalg.norm(s.positions[0] - s.positions[1])
    np.testing.assert_allclose(d01, 2 ** (1 / 6) * 2.2, rtol=1e-4)


def test_cell_relax():
    s = bulk_fcc("Cu", 3.7)
    s.calc = LennardJones(epsilon=0.4, sigma=2.3, rc=6.5)
    ucf = UnitCellFilter(s)
    opt = LBFGS(ucf, maxstep=0.05)
    assert opt.run(fmax=5e-3, steps=300)
    st = s.get_stress()
    assert np.abs(st[:3]).max() < 6e-4, st


class DoubleWell:
    """E = (x^2-1)^2 on atom 0's x coordinate; y,z harmonic."""

    def calculate(self, system):
        x, y, z = system.positions[0]
        e = (x * x - 1) ** 2 + 0.5 * (y * y + z * z)
        f = np.zeros((len(system), 3))
        f[0] = [-4 * x * (x * x - 1), -y, -z]
        return {"energy": e, "forces": f, "stress": np.zeros(6)}


def test_neb_barrier():
    first = System(numbers=[1], positions=[[-1.0, 0, 0]])
    last = System(numbers=[1], positions=[[1.0, 0, 0]])
    images = interpolate_images(first, last, 7)
    for im in images:
        im.calc = DoubleWell()
    neb = NEB(images, k=1.0, climb=True)
    opt = FIRE(neb, dt=0.05, maxstep=0.1)
    opt.run(fmax=1e-3, steps=500)
    # barrier of (x^2-1)^2 between minima is exactly 1 at x=0
    np.testing.assert_allclose(neb.barrier(), 1.0, atol=1e-3)
