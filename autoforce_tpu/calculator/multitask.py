"""Multi-task active calculator: learn several PES at once.

Counterpart of theforce/calculator/active_multi_task.py: one kernel /
inducing set, multiple oracle calculators (tasks); predictions are
weighted combinations (e.g. thermodynamic-integration schedules); the
sampling machinery is inherited unchanged.
"""

from __future__ import annotations

import numpy as np

from ..regression.multitask import MultiTaskRecord, MultiTaskSgprModel
from .active import ActiveCalculator, default_kernel_engine


class MultiTaskCalculator(ActiveCalculator):
    # per-task energies are computed from the covariance block every step
    # (predict_task_energies below), including inference-only runs
    _always_fetch_cov = True

    def __init__(self, calculators, weights=None, kernel_kw=None,
                 tasks_kern_optimization=False, niter_tasks=2, **kw):
        self.calcs = list(calculators)
        tasks = len(self.calcs)
        self.weights = (
            np.asarray(weights, dtype=float)
            if weights is not None
            else np.ones(tasks) / tasks
        )
        engine = default_kernel_engine(**(kernel_kw or {}))
        model = MultiTaskSgprModel(
            engine, tasks,
            tasks_kern_optimization=tasks_kern_optimization,
            niter_tasks=niter_tasks,
        )
        kw.setdefault("covariance", model)
        super().__init__(calculator=self.calcs[0], kernel_kw=kernel_kw, **kw)

    @property
    def tasks(self):
        return self.model.tasks

    def set_weights(self, weights):
        """e.g. thermodynamic integration schedule
        (active_multi_task.py:183-194)."""
        self.weights = np.asarray(weights, dtype=float)
        if self.model.multi_mu is not None:
            self.model.mu = self.model.effective_mu(self.weights)
            self.model._model_arrays = None

    def _predict(self):
        if self.model.multi_mu is not None:
            self.model.mu = self.model.effective_mu(self.weights)
        res = super()._predict()
        if self.model.multi_mu is not None:
            res["energy"] = float(
                res["energy"]
                + self.model.effective_shift(self.weights, self.system.numbers)
            )
            # per-task energies for observers
            res["task_energies"] = self.model.predict_task_energies(
                self._cov, self.system.numbers
            )
            self.results = res
        return res

    def snapshot(self, fake=False) -> MultiTaskRecord:
        copy = self.system.copy()
        if fake:
            T = self.tasks
            e = self.results.get(
                "task_energies", np.full(T, self.results["energy"])
            )
            f = np.repeat(self.results["forces"][None], T, axis=0)
            rec = MultiTaskRecord(
                system=copy, e=np.asarray(e, dtype=float), f=f,
                s=np.zeros((T, 6)), natoms=len(copy),
            )
            return rec
        energies = []
        forces = []
        stresses = []
        for calc in self.calcs:
            tmp = copy.copy()
            tmp.calc = calc
            energies.append(tmp.get_potential_energy())
            forces.append(tmp.get_forces())
            try:
                stresses.append(tmp.get_stress())
            except Exception:
                stresses.append(np.zeros(6))
        if self.tape:
            from ..system import SinglePointCalculator

            tmp = copy.copy()
            tmp.calc = SinglePointCalculator(
                tmp, energy=energies[0], forces=forces[0], stress=stresses[0]
            )
            self._saved_for_tape = tmp
        self.log(f"exact energies: {energies}")
        self._last_test = self.step
        return MultiTaskRecord.from_results(copy, energies, forces, stresses)

    def head(self):
        rec = self.model.data[-1]
        new = self.snapshot(fake=False)
        rec.e, rec.f, rec.s = new.e, new.f, new.s
        self.model.touch_targets()
        self.model.make_munu()

    def add_1atoms_fast(self, rec):
        model = self.model
        if model.ndata == 0:
            model.add_data(rec)
            return 1, np.inf, np.inf
        e1, f1 = self._fast_ef()
        model.add_data(rec)
        model.mu = model.effective_mu(self.weights)
        model._model_arrays = None
        e2, f2 = self._fast_ef()
        fdiff = self.fdiff
        d = (f2 - f1).reshape(-1)
        df = np.abs(d).mean() if d.size else 0.0
        reject = (
            fdiff < np.inf
            and (d * d).mean() < fdiff**2
            and np.abs(d).max() < 3 * fdiff
        )
        blind = abs(e1) < 1e-8 and abs(e2) < 1e-8
        if reject and not blind:
            model.pop_1data()
            return 0, abs(e1 - e2), df
        return 1, abs(e1 - e2), df
