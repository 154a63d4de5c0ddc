"""autoforce_tpu — TPU-native on-the-fly machine-learning force fields.

A ground-up JAX/XLA/Pallas rebuild of the sparse-Gaussian-process (SGPR)
force-field methodology of AutoForce (amirhajibabaei/AutoForce): SOAP-style
local-environment descriptors, kernel regression over an inducing set,
on-the-fly active learning during molecular dynamics, served through an
ASE-compatible calculator protocol (without requiring ASE).
"""

__version__ = "0.1.0"

from . import units
from .system import System, SinglePointCalculator

__all__ = ["units", "System", "SinglePointCalculator", "__version__"]
