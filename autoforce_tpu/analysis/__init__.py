from .kde import GaussianKDE
from .rdf import rdf
from .trajectory import TrajAnalyser

__all__ = ["GaussianKDE", "rdf", "TrajAnalyser"]
