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

from . import units
from .system import System, SinglePointCalculator

__all__ = ["units", "System", "SinglePointCalculator", "__version__"]
