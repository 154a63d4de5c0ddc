"""Test configuration: CPU backend, float64, 8 virtual devices.

The axon TPU plugin is registered at interpreter start via sitecustomize, but
backend *initialization* is lazy, so overriding the platform + XLA flags here
(before any jax computation) still takes effect.
"""

import os
import sys

os.environ["PALLAS_AXON_POOL_IPS"] = ""
# Single-thread BLAS: multithreaded partial-sum order depends on host load
# (xdist workers competing for cores), and a ~1e-16 relative difference in a
# dot product amplifies through 50 chaotic MD steps into different sampling
# decisions — observed as rare order-dependent failures in test_active.py.
# Host solves in the suite are small (m <~ 300), so this costs nothing.
for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
