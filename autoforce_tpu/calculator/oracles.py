"""Cheap 'ab initio' oracle calculators for tests and examples.

Counterparts of the reference's fake/cheap backends used to exercise the
active-learning machinery without DFT (theforce/calculator/zero.py,
theforce/calculator/emt.py): a Lennard-Jones potential and a zero
calculator.  An EMT implementation lives in emt.py.
"""

from __future__ import annotations

import numpy as np

from ..neighbors import displacements, neighbor_table


class ZeroCalculator:
    """Returns zeros; 'Only for quick tests!' (reference zero.py:5-24)."""

    def calculate(self, system):
        n = len(system)
        return {
            "energy": 0.0,
            "forces": np.zeros((n, 3)),
            "stress": np.zeros(6),
        }


class LennardJones:
    """Pairwise 12-6 potential with energy-shifted cutoff."""

    def __init__(self, epsilon=1.0, sigma=1.0, rc=None):
        self.epsilon = float(epsilon)
        self.sigma = float(sigma)
        self.rc = float(rc) if rc is not None else 3.0 * self.sigma
        s6 = (self.sigma / self.rc) ** 6
        self.shift = 4.0 * self.epsilon * (s6 * s6 - s6)

    def calculate(self, system):
        n = len(system)
        t = neighbor_table(system.positions, system.cell, system.pbc, self.rc)
        r = displacements(system.positions, system.cell, t)  # (n, k, 3)
        d = np.linalg.norm(r, axis=-1)
        d = np.where(t.mask, d, 1.0)
        s6 = (self.sigma / d) ** 6
        phi = 4.0 * self.epsilon * (s6 * s6 - s6) - self.shift
        dphi = 4.0 * self.epsilon * (-12.0 * s6 * s6 + 6.0 * s6) / d  # dphi/dd
        phi = np.where(t.mask, phi, 0.0)
        dphi = np.where(t.mask, dphi, 0.0)
        energy = 0.5 * phi.sum()
        rhat = r / d[..., None]
        forces = (dphi[..., None] * rhat).sum(axis=1)
        vir = 0.5 * np.einsum("nk,nka,nkb->ab", dphi / d, r, r)
        try:
            volume = system.volume
            stress = vir[[0, 1, 2, 1, 0, 0], [0, 1, 2, 2, 2, 1]] / volume
        except ValueError:
            stress = np.zeros(6)
        return {"energy": energy, "forces": forces, "stress": stress}
