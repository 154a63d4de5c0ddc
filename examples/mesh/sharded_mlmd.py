"""Multi-chip SPMD on-the-fly learning: predict AND training covariance
sharded over a ('data', 'model') mesh.

On a multi-chip host this uses the real devices; on CPU run with
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 python sharded_mlmd.py
to validate the sharding on 8 virtual devices (same code, same results).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..", ".."))

import numpy as np

from autoforce_tpu import units
from autoforce_tpu.calculator.active import ActiveCalculator
from autoforce_tpu.calculator.oracles import LennardJones
from autoforce_tpu.md import Langevin
from autoforce_tpu.parallel.mesh import make_mesh
from autoforce_tpu.system import bulk_fcc, maxwell_boltzmann_velocities

mesh = make_mesh(n_data=4, n_model=2)  # 8 devices: atoms x inducing
calc = ActiveCalculator(
    calculator=LennardJones(epsilon=0.15, sigma=2.3, rc=5.0),
    kernel_kw=dict(cutoff=5.0, lmax=3, nmax=3),
    mesh=mesh,  # every predict + kernel block now runs SPMD
    stdout=True,
)
atoms = bulk_fcc("Cu", 3.6).repeat((4, 4, 4))
atoms.rattle(0.05)
atoms.calc = calc
maxwell_boltzmann_velocities(atoms, 400)
Langevin(atoms, 2 * units.fs, temperature_K=400, friction=0.02).run(200)
print("model size:", calc.size)

# --- flagship path: device-resident MD over the SAME mesh -------------
# the entire lax.while_loop integrator runs SPMD (sharded_md_chunk);
# sampling still fires at the exact step the uncertainty trips
from autoforce_tpu.md.device_md import DeviceMD

dyn = DeviceMD(atoms, calc, dt=2 * units.fs, temperature_K=400,
               friction=0.02, chunk=100)
dyn.run(500)
print("sharded DeviceMD done:", dyn.nsteps, "steps; model size:", calc.size)
