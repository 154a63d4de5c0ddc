"""Metadynamics (counterpart of theforce/calculator/meta.py and the
kernel-space Meta/ActiveMeta of calculator/active.py:1152-1186).

``Meta`` deposits Gaussians on collective variables (CVs) accumulated in a
sparse-grid KDE; the bias energy and its exact forces are evaluated with
jax autodiff through the CV functions.  CVs: ``Posvar`` (position),
``Qlvar`` (Steinhardt bond order), ``Catvar`` (concatenation).

``SoapMeta``/``ActiveMeta`` bias directly in kernel space using the
calculator's covariance row block.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import units
from ..analysis.kde import GaussianKDE
from ..descriptor.ql import steinhardt_ql


class Meta:
    def __init__(self, colvar, sigma=0.1, w=0.01, tem=None, hist="meta.hist"):
        """colvar(numbers, positions, cell, pbc, nl) -> jnp array of CVs.
        sigma: Gaussian width; w: height*dt (eV); tem: well-tempered T (K)."""
        self.colvar = colvar
        self.kde = GaussianKDE(sigma)
        self.w = w
        self.tem = tem
        self.hist = hist
        if hist:
            with open(hist, "w") as f:
                f.write(f"# {sigma}\n")
        self._cv = None

    def __call__(self, calc):
        system = calc.system
        numbers = jnp.asarray(system.numbers)
        cell = jnp.asarray(system.cell)
        nl = calc._nl

        centers, weights = (
            self.kde.centers_near(self._cv)
            if self._cv is not None
            else (np.zeros((0, 1)), np.zeros(0))
        )
        sigma = self.kde.sigma

        def bias(pos):
            cv = self.colvar(numbers, pos, cell, system.pbc, nl)
            cv = jnp.atleast_1d(cv)
            if len(weights) == 0:
                e = jnp.zeros(())
            else:
                d2 = (((cv[None] - centers) / sigma) ** 2).sum(axis=-1)
                kde = (jnp.exp(-0.5 * d2) * weights).sum() / (
                    np.sqrt(2 * np.pi) ** cv.shape[0]
                )
                e = self.w * kde
                if self.tem is not None:
                    gamma = 1.0 / (units.kB * self.tem)
                    e = jnp.log(1.0 + e * gamma) / gamma
            return e, cv

        (e, cv), g = jax.value_and_grad(bias, has_aux=True)(
            jnp.asarray(system.positions)
        )
        self._cv = np.asarray(cv)
        return {"energy": float(e), "forces": -np.asarray(g)}

    def update(self):
        """Deposit the current CV (called by the MD driver each step)."""
        if self._cv is not None:
            self.kde.count(self._cv)
            if self.hist:
                with open(self.hist, "a") as f:
                    f.write(" ".join(f"{float(v)}" for v in self._cv) + "\n")


class Posvar:
    """Relative position of one atom w.r.t. the (selected) centroid
    (meta.py:63-78)."""

    def __init__(self, index, select=None):
        self.index = index
        self.select = select

    def __call__(self, numbers, positions, cell, pbc, nl):
        keep = jnp.ones(len(numbers), bool).at[self.index].set(False)
        if self.select is not None:
            keep = keep & (numbers == self.select)
        w = keep.astype(positions.dtype)
        centroid = (w[:, None] * positions).sum(0) / w.sum()
        return positions[self.index] - centroid


class Qlvar:
    """Steinhardt Q_l of one atom's environment (meta.py:81-108)."""

    def __init__(self, i, j, index=None, cutoff=4.0, l=(6,)):
        self.i = i
        self.j = j
        self.index = index
        self.cutoff = cutoff
        self.l = list(l)
        self.lmax = max(self.l)

    def __call__(self, numbers, positions, cell, pbc, nl):
        numbers_h = np.asarray(numbers)
        if self.index is None:
            self.index = int(np.flatnonzero(numbers_h == self.i)[0])
        i = self.index
        mask = nl.mask[i]
        j = nl.idx[i][mask]
        env = numbers_h[j] == self.j
        jj = j[env]
        off = jnp.asarray(nl.off[i][mask][env], dtype=positions.dtype)
        r = positions[jj] - positions[i] + off @ cell
        ql = steinhardt_ql(r, self.lmax, self.cutoff)
        return ql[jnp.asarray(self.l)]


class Catvar:
    def __init__(self, *var):
        self.var = var

    def __call__(self, *args):
        return jnp.concatenate([jnp.atleast_1d(v(*args)).reshape(-1) for v in self.var])


class SoapMeta:
    """Kernel-space metadynamics (reference active.py:1152-1167): the bias
    potential lives on the inducing set and grows along the visited
    covariance directions."""

    def __init__(self, scale=1e-2):
        self.scale = scale
        self.pot = None

    def __call__(self, calc):
        model = calc.model
        cov = calc._cov  # (n, m) host
        m = model.m
        if self.pot is None:
            self.pot = np.zeros(m)
        elif len(self.pot) < m:
            self.pot = np.concatenate([self.pot, np.zeros(m - len(self.pot))])
        Mi = model.choli.T @ model.choli
        nu = Mi @ cov.T
        norm = float(np.sqrt((cov @ nu).sum()))
        mu = nu.sum(axis=1) / max(norm, 1e-30)
        self.pot = self.pot + self.scale * mu
        # energy + forces via a device pass with mu := pot/norm
        ma = model.full_model_arrays()
        mcap = ma.mu.shape[0]
        mu_bias = np.zeros(mcap)
        mu_bias[:m] = self.pot / max(norm, 1e-30)
        ma2 = ma._replace(mu=jnp.asarray(mu_bias, dtype=ma.mu.dtype))
        vs = model.vscale_for(np.asarray(calc.cfg.numbers))
        e, f, *_ = calc.engine.predict(calc.cfg, ma2, vs)
        return {
            "energy": float(e),
            "forces": np.asarray(f)[: len(calc.system)],
        }

    def update(self):
        pass


class ActiveMeta:
    """Uncertainty-seeking bias (reference active.py:1170-1186):
    E = -scale * sum_i beta_i sqrt(vscale)."""

    def __init__(self, scale=1e-2):
        self.scale = scale

    def __call__(self, calc):
        from ..engine import meta_covloss_fn

        model = calc.model
        ma = model.full_model_arrays()
        vs = model.vscale_for(np.asarray(calc.cfg.numbers))
        e, g = meta_covloss_fn(
            calc.cfg, ma, calc.engine.radii_table(),
            jnp.asarray(vs, dtype=calc.cfg.positions.dtype),
            calc.engine.params, calc.engine.exponent, self.scale,
        )
        return {
            "energy": float(e),
            "forces": -np.asarray(g)[: len(calc.system)],
        }

    def update(self):
        pass
