"""Closed-form parametric pair potentials as a calculator.

Counterpart of theforce/calculator/parametric.py: per-species-pair radial
terms built from the Func algebra (LJ, Coulomb, repulsive cores, ...),
served through the calculator protocol with autodiff forces/stress, and
fittable to reference data by least squares over the Func parameters.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..descriptor.func import CutFunc, Exp, I, Param, RepulsiveCore
from ..neighbors import neighbor_table


class PairPot:
    """One radial term g(d) applied to species pair (a, b)."""

    def __init__(self, a, b, radial):
        self.a = int(a)
        self.b = int(b)
        self.radial = radial

    def params(self):
        return self.radial.params()


def get_lj_terms(pairs, epsilon=1.0, sigma=1.0, rc=6.0, trainable=True):
    """4 eps ((sig/d)^12 - (sig/d)^6), smoothly cut (parametric.py LJ)."""
    terms = []
    for (a, b) in pairs:
        eps = Param(epsilon, name=f"lj_eps_{a}_{b}") if trainable else epsilon
        s6 = sigma**6
        g = (
            4.0 * eps * (s6 * s6 * RepulsiveCore(12) + (-1.0) * s6 * RepulsiveCore(6))
        ) * CutFunc(rc)
        terms.append(PairPot(a, b, g))
    return terms


def get_coulomb_terms(charges, rc=6.0, trainable=True):
    """q_a q_b / d with smooth cutoff (parametric.py Coulomb)."""
    terms = []
    ke = 14.399645  # e^2/(4 pi eps0) in eV*A
    zs = sorted(charges.keys())
    qparams = {
        z: Param(abs(charges[z]), name=f"q_{z}") if trainable else abs(charges[z])
        for z in zs
    }
    for i, a in enumerate(zs):
        for b in zs[i:]:
            sign = np.sign(charges[a] * charges[b])
            g = (sign * ke) * qparams[a] * qparams[b] * RepulsiveCore(1) * CutFunc(rc)
            terms.append(PairPot(a, b, g))
    return terms


class ParametricCalculator:
    def __init__(self, terms, rc=6.0):
        self.terms = list(terms)
        self.rc = float(rc)
        self.param_values = {}
        for t in self.terms:
            self.param_values.update(t.params())

    def params(self):
        return dict(self.param_values)

    def _energy(self, pos, eps, cell, nbr_idx, nbr_off, masks, params):
        one = jnp.eye(3) + eps
        posd = pos @ one
        celld = cell @ one
        r = posd[nbr_idx] - posd[:, None, :] + nbr_off.astype(pos.dtype) @ celld
        d = jnp.sqrt((r * r).sum(-1) + 1e-30)
        e = 0.0
        for t, m in zip(self.terms, masks):
            g = t.radial(d, params)
            e = e + 0.5 * (jnp.where(m, g, 0.0)).sum()
        return e

    def _prepare(self, system):
        t = neighbor_table(system.positions, system.cell, system.pbc, self.rc)
        zi = system.numbers[:, None]
        zj = system.numbers[t.idx]
        masks = []
        for term in self.terms:
            m = ((zi == term.a) & (zj == term.b)) | ((zi == term.b) & (zj == term.a))
            masks.append(jnp.asarray(m & t.mask))
        return t, masks

    def calculate(self, system):
        t, masks = self._prepare(system)
        fn = jax.value_and_grad(self._energy, argnums=(0, 1))
        e, (dpos, deps) = fn(
            jnp.asarray(system.positions),
            jnp.zeros((3, 3)),
            jnp.asarray(system.cell),
            jnp.asarray(t.idx),
            jnp.asarray(t.off),
            masks,
            self.param_values,
        )
        w = 0.5 * (np.asarray(deps) + np.asarray(deps).T)
        try:
            stress = np.array(
                [w[0, 0], w[1, 1], w[2, 2], w[1, 2], w[0, 2], w[0, 1]]
            ) / system.volume
        except ValueError:
            stress = np.zeros(6)
        return {
            "energy": float(e),
            "forces": -np.asarray(dpos),
            "stress": stress,
        }

    def fit(self, data, forces_weight=1.0, steps=200):
        """Least-squares fit of Func parameters to (energy, forces) data."""
        from scipy.optimize import minimize

        names = sorted(self.param_values.keys())
        prepared = []
        for s in data:
            t, masks = self._prepare(s)
            prepared.append(
                (
                    jnp.asarray(s.positions),
                    jnp.asarray(s.cell),
                    jnp.asarray(t.idx),
                    jnp.asarray(t.off),
                    masks,
                    s.get_potential_energy(),
                    jnp.asarray(s.get_forces()),
                )
            )

        def loss_fn(params):
            loss = 0.0
            for pos, cell, idx, off, masks, e_ref, f_ref in prepared:
                e, g = jax.value_and_grad(self._energy, argnums=0)(
                    pos, jnp.zeros((3, 3)), cell, idx, off, masks, params
                )
                loss = loss + (e - e_ref) ** 2
                loss = loss + forces_weight * ((-g - f_ref) ** 2).sum()
            return loss

        grad_fn = jax.jit(jax.value_and_grad(
            lambda v: loss_fn({n: v[i] for i, n in enumerate(names)})
        ))

        def obj(v):
            l, g = grad_fn(jnp.asarray(v))
            return float(l), np.asarray(g)

        x0 = np.array([self.param_values[n] for n in names])
        res = minimize(obj, x0, jac=True, options={"maxiter": steps})
        self.param_values = {n: float(res.x[i]) for i, n in enumerate(names)}
        return res
