"""On-the-fly MLMD with the EMT oracle (counterpart of the reference's
examples/active): run from this directory with `python md_emt.py`."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..", ".."))
from autoforce_tpu import units
from autoforce_tpu.calculator.active import ActiveCalculator
from autoforce_tpu.calculator.emt import EMT
from autoforce_tpu.md import Langevin
from autoforce_tpu.system import bulk_fcc, maxwell_boltzmann_velocities

atoms = bulk_fcc("Cu", 3.6).repeat((2, 2, 2))
atoms.rattle(0.05)
atoms.calc = ActiveCalculator(calculator=EMT(), stdout=True)
maxwell_boltzmann_velocities(atoms, 300)
dyn = Langevin(atoms, dt=2 * units.fs, temperature_K=300, friction=0.02)
dyn.run(200)
print("model size (data, inducing):", atoms.calc.size)
