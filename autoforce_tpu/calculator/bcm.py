"""Bayesian committee machine (BCM) of SGPR experts.

Counterpart of the reference's BCMActiveCalculator
(theforce/calculator/active_bcm.py): when a single sparse model saturates
(max_data / max_inducing), it is frozen as an expert and a fresh model
keeps learning.  Predictions combine all experts with weights
``scale_k = -log(covmax_k)/covmax_k`` (active_bcm.py:589-633); sampling
thresholds use the min covloss over experts (:885-894).  Experts are
persisted as ``<head>_k.pckl`` folders and re-discovered on restart
(:263-298).  The TPU mapping: each expert is an independent replicated
ModelArrays; expert predictions are independent fused device calls (and
can be dispatched across device groups).
"""

from __future__ import annotations

import os

import numpy as np

from ..regression.sgpr import SgprModel
from .active import ActiveCalculator


class BCMActiveCalculator(ActiveCalculator):
    def __init__(self, covariance=None, pckl="model.pckl", tape=None,
                 max_data=8, max_inducing=256, **kw):
        self.pckl_head = pckl[:-5] if pckl and pckl.endswith(".pckl") else pckl
        self.experts: dict[str, SgprModel] = {}
        # restart: scan existing expert pickles
        self.pckl_id = 1
        used = []
        while self.pckl_head and os.path.isdir(self._pckl_path(self.pckl_id)):
            used.append(self.pckl_id)
            self.pckl_id += 1
        if used:
            from ..io.model_io import load_model

            for k in used[:-1]:
                self.experts[self._key(k)] = load_model(self._pckl_path(k))
            self.pckl_id = used[-1]
        cur_pckl = self._pckl_path(self.pckl_id) if self.pckl_head else None
        cur_tape = (
            tape
            if tape is not None
            else (self._key(self.pckl_id) + ".sgpr" if self.pckl_head else None)
        )
        super().__init__(
            covariance=covariance if covariance is not None else "pckl",
            pckl=cur_pckl,
            tape=cur_tape,
            max_data=max_data,
            max_inducing=max_inducing,
            **kw,
        )
        # all experts must share the species table of the active engine —
        # including NEIGHBOR species: an expert env whose neighbors are
        # absent from the table would restage with those neighbors
        # silently masked out (species_index -> -1), corrupting its
        # kernel values (same rule as include_tape/build)
        for ex in self.experts.values():
            for x in ex.X:
                self.engine.ensure_species(
                    np.concatenate([[x.number], x.numbers])
                )

    def _untrained(self):
        """A committee with solved frozen experts can serve even while the
        freshly-spawned live model is still empty."""
        return self.size[1] == 0 and not any(
            m.m > 0 and len(m.mu) == m.m for m in self.experts.values()
        )

    def _key(self, k):
        return f"{self.pckl_head}_{k}"

    def _pckl_path(self, k):
        return self._key(k) + ".pckl"

    # ----------------------------------------------------------- prediction
    def _expert_dispatch(self, model):
        """Launch one expert's fused predict; returns device arrays
        WITHOUT blocking (jax dispatch is async — the committee's device
        calls overlap; fetch later)."""
        # experts keep their own engines; share our config by restaging on
        # our engine's species table (kernel values are table-invariant)
        model.adopt_engine(self.engine)
        ma = model.full_model_arrays()
        vs = model.vscale_for(np.asarray(self.cfg.numbers))
        return self.engine.predict(self.cfg, ma, vs)

    def _predict(self):
        n = len(self.system)
        models = [
            m
            for m in [*self.experts.values(), self.model]
            if m.m > 0 and len(m.mu) == m.m
        ]
        if not models:
            # untrained: fall back to the base implementation
            return super()._predict()
        # phase 1: dispatch every expert (async device calls, no blocking
        # host fetch in between — active_bcm.py:589-633's loop, concurrent)
        pending = [(m, self._expert_dispatch(m)) for m in models]
        # phase 2: fetch + combine with weights ~ -log(covmax)/covmax
        parts = []
        expert_floor = None
        for model, (e, f, w, cov, beta) in pending:
            beta = np.asarray(beta)[:n]
            covmax = float(beta.max()) if len(beta) else 1.0
            covmax = min(max(covmax, 1e-12), 1.0)
            scale = (-np.log(covmax) if covmax < 1.0 else 0.0) / covmax
            energy = float(e) + model.mean_energy(self.system.numbers)
            parts.append((scale, energy, np.asarray(f)[:n], np.asarray(w)))
            if model is self.model:
                self._cov = np.asarray(cov)[:n, : model.m]
                self._desc = None
            else:
                expert_floor = (
                    beta
                    if expert_floor is None
                    else np.minimum(expert_floor, beta)
                )
        # frozen experts never change inside a step: cache their beta
        # floor so the sampling loop only re-evaluates the live model
        self._expert_beta_floor = expert_floor
        tot = sum(p[0] for p in parts)
        if tot <= 0:
            tot = len(parts)
            parts = [(1.0, *p[1:]) for p in parts]
        energy = sum(s * e for s, e, f, w in parts) / tot
        forces = sum(s * f for s, e, f, w in parts) / tot
        w = sum(s * w for s, e, f, w in parts) / tot
        try:
            from ..engine import voigt6

            stress = voigt6(w) / self.system.volume
        except ValueError:
            stress = np.zeros(6)
        self.results = {"energy": energy, "forces": forces, "stress": stress}
        self.maximum_force = float(np.abs(forces).max()) if n else np.inf
        return self.results

    def _host_beta(self):
        """min covloss over the committee (active_bcm.py:885-894).  The
        frozen experts' floor comes from the cached _predict dispatch; only
        the live model's beta is recomputed inside the sampling loop."""
        beta = super()._host_beta()
        floor = getattr(self, "_expert_beta_floor", None)
        if floor is not None:
            beta = np.minimum(beta, floor[: len(beta)])
        return beta

    def optimize_kernel(self):
        """Kernel HPO under a committee: when the shared kernel moves,
        every frozen expert's covariance blocks are stale too — rebuild
        them all (they share the engine)."""
        moved = super().optimize_kernel()
        if moved:
            for ex in self.experts.values():
                ex.adopt_engine(self.engine)
                ex.rebuild_kernel_matrices(remake=True)
        return moved

    # ------------------------------------------------------------- spawning
    def update(self, inducing=True, data=True):
        m, n = super().update(inducing=inducing, data=data)
        if (
            self.model.ndata >= self.max_data
            or self.model.m >= self.max_inducing
        ):
            self.spawn_expert()
        return m, n

    def spawn_expert(self):
        """Freeze the current model and start a fresh one
        (initiate_bcm, active_bcm.py:340-368)."""
        if self.model.m == 0:
            return
        self.save_model()
        self.experts[self._key(self.pckl_id)] = self.model
        self.log(
            f"BCM: froze expert {self.pckl_id} "
            f"(size {self.model.ndata} {self.model.m}); starting fresh"
        )
        self.pckl_id += 1
        if self.pckl_head:
            self.pckl = self._pckl_path(self.pckl_id)
            from ..io.tape import SgprTape

            self.tape = SgprTape(self._key(self.pckl_id) + ".sgpr")
        # full-config clone: pair terms, chemical similarity, base kernel
        # and mesh must survive the expert freeze (a fresh default engine
        # would silently change the committee's kernel)
        self.model = SgprModel(self.engine.clone_config())
