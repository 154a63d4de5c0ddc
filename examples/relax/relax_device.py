"""On-chip FIRE relaxation with on-the-fly learning: the whole optimizer
loop runs inside one jitted device program (opt/device_fire.py); the
host is re-entered only when the uncertainty trips (the model samples at
the exact geometry) or on convergence."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..", ".."))
from autoforce_tpu.calculator.active import ActiveCalculator
from autoforce_tpu.calculator.emt import EMT
from autoforce_tpu.opt import DeviceFIRE
from autoforce_tpu.system import bulk_fcc

atoms = bulk_fcc("Cu", 3.7).repeat((3, 3, 3))
atoms.rattle(0.1)
calc = ActiveCalculator(calculator=EMT(), stdout=True)
atoms.calc = calc
opt = DeviceFIRE(atoms, calc, dt=0.05)
converged = opt.run(fmax=0.02, steps=500)
print("converged:", converged, "steps:", opt.nsteps)
print("final energy:", atoms.get_potential_energy())
