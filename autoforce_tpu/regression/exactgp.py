"""Exact (non-sparse) Gaussian-process potential.

Counterpart of the reference's full-covariance path
(theforce/regression/gppotential.py:274-305 ``forward`` without inducing,
``loss``): the covariance over [energies; forces] targets is built from
the kernel and its first and second position derivatives,

    ee = k(P, Q)            ef = -d k / d pos_Q        (energy_forces)
    fe = -d k / d pos_P     ff = d^2 k / d pos_P d pos_Q  (forces_forces)

where the reference hand-assembles leftgrad/rightgrad/gradgrad chains
(similarity/heterosoap.py:123-149), we differentiate the jitted cross-
structure kernel with ``jax.grad`` / ``jax.jacfwd`` — including the
"gradgrad" second derivative the reference only supports for fixed-species
kernels.

Supports marginal-likelihood evaluation (model selection / HPO) and exact
GP prediction; intended for small data sets (it is O((N_targets)^3)).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..engine import ConfigArrays, _config_descriptors, _env_rvec, precise_sum
from ..kernels import gram
from . import solver


@partial(jax.jit, static_argnames=("params", "exponent", "kind"))
def cross_kernel_blocks(cfg1: ConfigArrays, cfg2: ConfigArrays, radii, params,
                        exponent, kind="dot"):
    """(ee, ef, fe, ff) covariance blocks between two configurations.

    ee: scalar; ef: (N2, 3); fe: (N1, 3); ff: (N1, 3, N2, 3).
    ``kind`` accepts the composable kernel algebra too (kernelalgebra.py).
    """

    def g(pos1, pos2):
        p1, lone1 = _config_descriptors(pos1, cfg1.cell, cfg1, radii, params)
        p2, lone2 = _config_descriptors(pos2, cfg2.cell, cfg2, radii, params)
        cov = gram(p1, cfg1.numbers, lone1, p2, cfg2.numbers, lone2, exponent,
                   kind=kind)
        cov = cov * (cfg1.atom_mask[:, None] & cfg2.atom_mask[None, :])
        # reduce-of-dot must not fold into a synthesized bf16 contraction
        # on TPU (engine.precise_sum)
        return precise_sum(cov)

    ee = g(cfg1.positions, cfg2.positions)
    fe = -jax.grad(g, argnums=0)(cfg1.positions, cfg2.positions)
    ef = -jax.grad(g, argnums=1)(cfg1.positions, cfg2.positions)
    ff = jax.jacfwd(lambda p2: -jax.grad(g, argnums=0)(cfg1.positions, p2))(
        cfg2.positions
    )
    # ff[i, a, j, b] = d^2 k / d pos1[i,a] d pos2[j,b]
    return ee, ef, fe, -ff


class ExactGP:
    """Full GP over [energy; force] targets of a set of structures."""

    def __init__(self, engine, noise_e=1e-3, noise_f=1e-3):
        self.engine = engine
        self.noise_e = noise_e
        self.noise_f = noise_f
        self.data = []
        self._C = None
        self.alpha = None

    def add_data(self, record):
        if record.cfg is None:
            record.cfg = self.engine.make_config(record.system)
        self.data.append(record)
        self._C = None

    def _blocks(self, cfg1, cfg2):
        eng = self.engine
        ee, ef, fe, ff = cross_kernel_blocks(
            cfg1, cfg2, eng.radii_table(), eng.params, eng.exponent,
            kind=getattr(eng, "kernel_kind", "dot"),
        )
        return (np.asarray(ee), np.asarray(ef), np.asarray(fe), np.asarray(ff))

    def covariance(self):
        if self._C is not None:
            return self._C
        n = len(self.data)
        sizes = [1 + 3 * rec.natoms for rec in self.data]
        total = sum(sizes)
        C = np.zeros((total, total))
        ofs = np.concatenate([[0], np.cumsum(sizes)])
        for i, ri in enumerate(self.data):
            for j, rj in enumerate(self.data):
                if j < i:
                    continue
                ee, ef, fe, ff = self._blocks(ri.cfg, rj.cfg)
                ni, nj = ri.natoms, rj.natoms
                blk = np.zeros((sizes[i], sizes[j]))
                blk[0, 0] = ee
                blk[0, 1:] = ef[:nj].reshape(-1)
                blk[1:, 0] = fe[:ni].reshape(-1)
                blk[1:, 1:] = ff[:ni, :, :nj, :].reshape(3 * ni, 3 * nj)
                C[ofs[i]:ofs[i + 1], ofs[j]:ofs[j + 1]] = blk
                if j > i:
                    C[ofs[j]:ofs[j + 1], ofs[i]:ofs[i + 1]] = blk.T
        self._C = C
        self._sizes = sizes
        self._ofs = ofs
        return C

    def targets(self):
        y = []
        for rec in self.data:
            y.append([rec.e - self.mean(rec)])
            y.append(rec.f.reshape(-1))
        return np.concatenate([np.atleast_1d(v) for v in y])

    def mean(self, rec):
        return 0.0

    def noise_diag(self):
        d = []
        for rec in self.data:
            d.append([self.noise_e**2 * rec.natoms])
            d.append(np.full(3 * rec.natoms, self.noise_f**2))
        return np.concatenate([np.atleast_1d(v) for v in d])

    def fit(self):
        C = self.covariance() + np.diag(self.noise_diag())
        L, ridge = solver.jitter_cholesky(C)
        y = self.targets()
        self.alpha = np.linalg.solve(L.T, np.linalg.solve(L, y))
        self._L = L
        return self

    def log_marginal_likelihood(self):
        """log N(Y; 0, C + noise) (reference loss, gppotential.py:352-371)."""
        if self.alpha is None:
            self.fit()
        y = self.targets()
        logdet = 2.0 * np.log(np.diag(self._L)).sum()
        n = len(y)
        return float(
            -0.5 * y @ self.alpha - 0.5 * logdet - 0.5 * n * np.log(2 * np.pi)
        )

    def predict(self, system, return_var=False):
        """(energy, forces) for a new configuration; with
        ``return_var=True`` also the PREDICTIVE VARIANCE of the energy
        and the per-component force variances — the posterior
        distribution the reference's exact forward exposes
        (gppotential.py:274-305: mean + covariance of the joint
        [E; F] Gaussian conditioned on the data):

            var = diag(K_** - K_*X (K_XX + noise)^-1 K_X*)
        """
        if self.alpha is None:
            self.fit()
        cfg = self.engine.make_config(system)
        n = len(system)
        k_row = np.zeros((1 + 3 * n, len(self.alpha)))
        for j, rj in enumerate(self.data):
            ee, ef, fe, ff = self._blocks(cfg, rj.cfg)
            nj = rj.natoms
            o = self._ofs[j]
            k_row[0, o] = ee
            k_row[0, o + 1 : o + 1 + 3 * nj] = ef[:nj].reshape(-1)
            k_row[1:, o] = fe[:n].reshape(-1)
            k_row[1:, o + 1 : o + 1 + 3 * nj] = ff[:n, :, :nj, :].reshape(
                3 * n, 3 * nj
            )
        pred = k_row @ self.alpha
        energy, forces = float(pred[0]), pred[1:].reshape(n, 3)
        if not return_var:
            return energy, forces
        # prior self-covariance diagonal of the probe's [E; F] block
        ee_s, _ef_s, _fe_s, ff_s = self._blocks(cfg, cfg)
        prior = np.concatenate(
            [[ee_s],
             np.einsum("iaia->ia", ff_s[:n, :, :n, :]).reshape(-1)]
        )
        # explained variance: rows through the SAME noisy Cholesky the
        # mean used (so var >= 0 up to roundoff by construction)
        w = np.linalg.solve(self._L, k_row.T)
        explained = (w * w).sum(axis=0)
        var = np.clip(prior - explained, 0.0, None)
        return energy, forces, float(var[0]), var[1:].reshape(n, 3)
