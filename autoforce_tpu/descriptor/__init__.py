from .harmonics import solid_harmonics
from .radial import PolyCut, DefaultRadii, UniformRadii, RadiiFromDict
from .soap import SoapParams, sesoap_descriptors

__all__ = [
    "solid_harmonics",
    "PolyCut",
    "DefaultRadii",
    "UniformRadii",
    "RadiiFromDict",
    "SoapParams",
    "sesoap_descriptors",
]
