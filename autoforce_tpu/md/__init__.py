from .verlet import VelocityVerlet
from .langevin import Langevin
from .npt import BerendsenNPT, BerendsenNVT

__all__ = ["VelocityVerlet", "Langevin", "BerendsenNPT", "BerendsenNVT"]
