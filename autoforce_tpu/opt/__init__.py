from .fire import FIRE
from .lbfgs import LBFGS
from .filters import UnitCellFilter
from .neb import NEB

__all__ = ["FIRE", "LBFGS", "UnitCellFilter", "NEB"]
