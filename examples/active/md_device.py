"""Same run with the device-resident integrator (fast path)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..", ".."))
from autoforce_tpu import units
from autoforce_tpu.calculator.active import ActiveCalculator
from autoforce_tpu.calculator.emt import EMT
from autoforce_tpu.md.device_md import DeviceMD
from autoforce_tpu.system import bulk_fcc, maxwell_boltzmann_velocities

atoms = bulk_fcc("Cu", 3.6).repeat((3, 3, 3))
atoms.rattle(0.05)
calc = ActiveCalculator(calculator=EMT(), stdout=True)
atoms.calc = calc
maxwell_boltzmann_velocities(atoms, 300)
DeviceMD(atoms, calc, dt=2 * units.fs, temperature_K=300, chunk=50).run(1000)
