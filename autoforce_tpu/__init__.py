"""autoforce_tpu — TPU-native on-the-fly machine-learning force fields.

A ground-up JAX/XLA/Pallas rebuild of the sparse-Gaussian-process (SGPR)
force-field methodology of AutoForce (amirhajibabaei/AutoForce): SOAP-style
local-environment descriptors, kernel regression over an inducing set,
on-the-fly active learning during molecular dynamics, served through an
ASE-compatible calculator protocol (without requiring ASE).
"""

__version__ = "0.1.0"

import jax as _jax

# TPU matmuls default to bfloat16 accumulation, which injects ~4e-3
# relative error into descriptor dot products — enough to push normalized
# kernel values above 1, zero out the covloss sampling signal, and degrade
# forces to percent level.  Force-field accuracy requires full float32
# matmul precision (the extra passes are negligible against the
# elementwise descriptor work).
_jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: on the remote-compile TPU backend a fresh
# process otherwise re-pays ~30-60 s per jitted shape; growing models
# (inducing-capacity buckets 32 -> 64 -> ... ) hit many shapes.  Opt out
# with AUTOFORCE_NO_COMPILE_CACHE=1.
#
# TPU-ONLY: XLA:CPU entries embed the build host's CPU features
# (avx512 etc.) which are NOT part of the cache key, so loading a
# CPU executable cached on a different machine SEGFAULTS ("Machine
# type used for XLA:CPU compilation doesn't match" then SIGILL/SIGSEGV
# in get_executable_and_time — hit this in the round-3 test suite).
# The TPU target is stable across hosts; the CPU one is not.
import os as _os

if not _os.environ.get("AUTOFORCE_NO_COMPILE_CACHE"):
    _on_cpu = _os.environ.get("JAX_PLATFORMS", "") == "cpu" or (
        not _os.environ.get("PALLAS_AXON_POOL_IPS")
    )
    if not _on_cpu:
        _cache = _os.environ.get(
            "AUTOFORCE_COMPILE_CACHE",
            _os.path.expanduser("~/.cache/jax_comp"),
        )
        try:
            _jax.config.update("jax_compilation_cache_dir", _cache)
            _jax.config.update(
                "jax_persistent_cache_min_entry_size_bytes", -1
            )
            _jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0
            )
        except Exception:
            pass

from . import units
from .system import System, SinglePointCalculator

__all__ = ["units", "System", "SinglePointCalculator", "__version__"]
