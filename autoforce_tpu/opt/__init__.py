from .fire import FIRE
from .lbfgs import LBFGS
from .filters import UnitCellFilter
from .neb import NEB

__all__ = ["FIRE", "LBFGS", "UnitCellFilter", "NEB", "DeviceFIRE",
           "DeviceNEB"]


def __getattr__(name):
    # lazy: the device modules import the engine stack
    if name == "DeviceFIRE":
        from .device_fire import DeviceFIRE

        return DeviceFIRE
    if name == "DeviceNEB":
        from .device_neb import DeviceNEB

        return DeviceNEB
    raise AttributeError(name)
