"""Flagship-style workload: multi-species ~1000-atom MLMD with the
device-resident integrator (analog of the reference's Li10GeP2S12 MD,
README.md:99-113, using a 4-species LJ-mixture oracle in place of DFT)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..", ".."))

import numpy as np

from autoforce_tpu import units
from autoforce_tpu.calculator.active import ActiveCalculator
from autoforce_tpu.calculator.oracles import LennardJones
from autoforce_tpu.md.device_md import DeviceMD
from autoforce_tpu.system import bulk_fcc, maxwell_boltzmann_velocities

# 4-species mixture on an fcc host lattice (~1000 atoms)
atoms = bulk_fcc("Cu", 3.7).repeat((6, 6, 7))
rng = np.random.default_rng(0)
for frac, z in [(0.5, 3), (0.1, 32), (0.2, 15)]:  # Li, Ge, P on Cu->"S" host
    sel = rng.choice(len(atoms), int(frac * len(atoms) / 2), replace=False)
    atoms.numbers[sel] = z
atoms.rattle(0.05)

calc = ActiveCalculator(
    calculator=LennardJones(epsilon=0.15, sigma=2.3, rc=6.0),
    kernel_kw=dict(cutoff=6.0, lmax=3, nmax=3),
    # production caps (reference cl/README.md): bound the model size so
    # update latency stays flat; eviction keeps the newest physics
    max_data=16, max_inducing=512,
    # the 4-species melt's covloss plateaus at ~0.085: the default ediff
    # (2 kcal/mol = 0.086) then samples nearly every step forever.  A
    # slightly looser threshold lets the model converge and the run
    # spend its time in on-device MD instead of model updates.
    ediff=0.12, kpad_min=256,
    stdout=True,
)
atoms.calc = calc
maxwell_boltzmann_velocities(atoms, 600)
# 600 steps finishes in ~15 min on one chip including compiles and the
# learning-heavy start; a chaotic hot mixture keeps sampling near any
# threshold, so production runs simply continue (model.pckl resumes) and
# spend an ever-larger fraction in on-device MD as the model saturates.
DeviceMD(atoms, calc, dt=1 * units.fs, temperature_K=600, chunk=50).run(600)
print("model size:", calc.size)
