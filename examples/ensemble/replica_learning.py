"""Ensemble on-the-fly learning: R walkers batched into ONE device
program (md/replica_md.py).

All walkers share one growing SGPR model; the chunk early-exits at the
first walker whose covloss crosses the sampling threshold, that walker
gets full ActiveCalculator semantics (oracle call + incremental solve),
and the updated model immediately serves the whole ensemble — R
trajectories' worth of configuration-space coverage per oracle call.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..", ".."))

import numpy as np

from autoforce_tpu import units
from autoforce_tpu.calculator.active import ActiveCalculator
from autoforce_tpu.calculator.oracles import LennardJones
from autoforce_tpu.md.replica_md import ReplicaMD
from autoforce_tpu.system import bulk_fcc, maxwell_boltzmann_velocities

calc = ActiveCalculator(
    calculator=LennardJones(epsilon=0.15, sigma=2.3, rc=5.0),
    kernel_kw=dict(cutoff=5.0, lmax=3, nmax=3),
    stdout=True,
)

R = 8
systems = []
for r in range(R):
    s = bulk_fcc("Cu", 3.6).repeat((3, 3, 3))
    s.rattle(0.04, seed=r)
    s.calc = calc
    maxwell_boltzmann_velocities(s, 500, seed=100 + r)
    systems.append(s)

# seed the model through one walker, then run the ensemble
systems[0].get_potential_energy()
dyn = ReplicaMD(systems, calc, dt=2 * units.fs, temperature_K=500,
                friction=0.02, chunk=100, seed=0)
dyn.run(1000)
print("ensemble done:", dyn.nsteps, "steps/walker; model size:", calc.size)
for r, s in enumerate(systems):
    print(f"walker {r}: T = {s.get_temperature():.0f} K")
