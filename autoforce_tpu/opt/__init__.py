from .fire import FIRE
from .lbfgs import LBFGS
from .filters import UnitCellFilter
from .neb import NEB

__all__ = ["FIRE", "LBFGS", "UnitCellFilter", "NEB", "DeviceFIRE"]


def __getattr__(name):
    # lazy: the device module imports the engine stack
    if name == "DeviceFIRE":
        from .device_fire import DeviceFIRE

        return DeviceFIRE
    raise AttributeError(name)
