"""Trajectory statistics (counterpart of theforce/analysis/analysis.py):
displacements, mean-squared displacement, diffusion, Arrhenius fits."""

from __future__ import annotations

import numpy as np

from .. import units


class TrajAnalyser:
    def __init__(self, frames):
        """frames: list of Systems (same atom count/order)."""
        self.frames = frames
        self.numbers = frames[0].numbers

    def __len__(self):
        return len(self.frames)

    def select(self, species=None):
        if species is None:
            return np.arange(len(self.numbers))
        return np.flatnonzero(self.numbers == species)

    def positions(self, species=None):
        i = self.select(species)
        return np.stack([f.positions[i] for f in self.frames])  # (T, n, 3)

    def displacements(self, species=None, unwrap=True):
        """Unwrapped displacements from the first frame (minimum-image
        increments accumulated along the trajectory)."""
        pos = self.positions(species)
        if not unwrap:
            return pos - pos[0]
        out = np.zeros_like(pos)
        for t in range(1, len(pos)):
            d = pos[t] - pos[t - 1]
            cell = self.frames[t].cell
            if self.frames[t].pbc.any():
                frac = np.linalg.solve(cell.T, d.reshape(-1, 3).T).T
                frac -= np.round(frac)
                d = (frac @ cell).reshape(d.shape)
            out[t] = out[t - 1] + d
        return out

    def msd(self, species=None):
        """Mean-squared displacement vs frame index."""
        disp = self.displacements(species)
        return (disp**2).sum(axis=-1).mean(axis=-1)

    def diffusion_constant(self, dt_fs, species=None, fit_from=0.5):
        """D in A^2/fs from the slope of MSD = 6 D t."""
        m = self.msd(species)
        t = np.arange(len(m)) * dt_fs
        i0 = int(len(m) * fit_from)
        if len(m) - i0 < 2:
            i0 = 0
        slope = np.polyfit(t[i0:], m[i0:], 1)[0]
        return slope / 6.0

    def temperatures(self):
        return np.array([f.get_temperature() for f in self.frames])

    def energies(self):
        return np.array(
            [f.calc.results.get("energy", np.nan) if f.calc else np.nan
             for f in self.frames]
        )


def arrhenius_fit(temperatures, diffusions):
    """ln D = ln D0 - Ea/(kB T): returns (Ea [eV], D0)."""
    x = 1.0 / (units.kB * np.asarray(temperatures, dtype=float))
    y = np.log(np.asarray(diffusions, dtype=float))
    slope, intercept = np.polyfit(x, y, 1)
    return -slope, float(np.exp(intercept))
