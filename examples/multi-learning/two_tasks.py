"""Multi-task learning: two PES with one kernel + thermodynamic-integration
weights (counterpart of the reference's multi-learning example)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..", ".."))
import numpy as np

from autoforce_tpu import units
from autoforce_tpu.calculator.multitask import MultiTaskCalculator
from autoforce_tpu.calculator.oracles import LennardJones
from autoforce_tpu.md import Langevin
from autoforce_tpu.system import bulk_fcc, maxwell_boltzmann_velocities

calc = MultiTaskCalculator(
    [LennardJones(epsilon=0.15, sigma=2.3, rc=6.0),
     LennardJones(epsilon=0.30, sigma=2.3, rc=6.0)],
    weights=[1.0, 0.0], kernel_kw=dict(cutoff=6.0),
    pckl=None, stdout=True,
)
atoms = bulk_fcc("Cu", 3.6).repeat((2, 2, 2))
atoms.rattle(0.05)
atoms.calc = calc
maxwell_boltzmann_velocities(atoms, 300)
dyn = Langevin(atoms, 2 * units.fs, 300, friction=0.02)
for lam in np.linspace(0, 1, 5):  # switch tasks along the trajectory
    calc.set_weights([1 - lam, lam])
    dyn.run(100)
    print("lambda", lam, "task energies:", calc.results.get("task_energies"))
