from .verlet import VelocityVerlet
from .langevin import Langevin
from .npt import BerendsenNPT, BerendsenNVT
from .nose_hoover import MTKNPT, NoseHooverNVT

__all__ = [
    "VelocityVerlet",
    "Langevin",
    "BerendsenNPT",
    "BerendsenNVT",
    "MTKNPT",
    "NoseHooverNVT",
]
