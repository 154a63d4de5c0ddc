"""Metadynamics on a collective variable during MLMD (counterpart of the
reference's meta-dyn example)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..", ".."))
from autoforce_tpu import units
from autoforce_tpu.calculator.active import ActiveCalculator
from autoforce_tpu.calculator.meta import Meta, Posvar
from autoforce_tpu.calculator.oracles import LennardJones
from autoforce_tpu.md import Langevin
from autoforce_tpu.system import bulk_fcc, maxwell_boltzmann_velocities

calc = ActiveCalculator(calculator=LennardJones(epsilon=0.15, sigma=2.3, rc=6.0),
                        kernel_kw=dict(cutoff=6.0), stdout=True)
calc.meta = Meta(Posvar(0), sigma=0.2, w=0.05, tem=1500.0)  # well-tempered
atoms = bulk_fcc("Cu", 3.6).repeat((2, 2, 2))
atoms.calc = calc
maxwell_boltzmann_velocities(atoms, 400)
dyn = Langevin(atoms, 2 * units.fs, 400, friction=0.02)
dyn.attach(calc.meta.update)
dyn.run(500)  # meta.hist accumulates the sampled CV histogram
