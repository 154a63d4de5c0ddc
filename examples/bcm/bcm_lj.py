"""Bayesian committee machine: experts freeze + spawn as the model grows
(counterpart of the reference's active_bcm example)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..", ".."))
from autoforce_tpu import units
from autoforce_tpu.calculator.bcm import BCMActiveCalculator
from autoforce_tpu.calculator.oracles import LennardJones
from autoforce_tpu.md import Langevin
from autoforce_tpu.system import bulk_fcc, maxwell_boltzmann_velocities

calc = BCMActiveCalculator(
    calculator=LennardJones(epsilon=0.15, sigma=2.3, rc=6.0),
    pckl="bcm.pckl", kernel_kw=dict(cutoff=6.0),
    max_data=4, max_inducing=64, stdout=True,
)
atoms = bulk_fcc("Cu", 3.6).repeat((2, 2, 2))
atoms.rattle(0.05)
atoms.calc = calc
maxwell_boltzmann_velocities(atoms, 500)
Langevin(atoms, 2 * units.fs, 500, friction=0.02).run(500)
print("experts:", len(calc.experts), "active model:", calc.size)
