"""ML-accelerated relaxation with oracle confirmation."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..", ".."))
from autoforce_tpu.calculator.active import ActiveCalculator
from autoforce_tpu.calculator.emt import EMT
from autoforce_tpu.opt import LBFGS
from autoforce_tpu.system import bulk_fcc

atoms = bulk_fcc("Cu", 3.7).repeat((2, 2, 2))
atoms.rattle(0.1)
atoms.calc = ActiveCalculator(calculator=EMT(), stdout=True)
LBFGS(atoms).run(fmax=0.02, steps=200)
print("final energy:", atoms.get_potential_energy())
