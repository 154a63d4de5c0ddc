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
    "DeviceMD",
    "DeviceNPT",
    "ReplicaMD",
]


def __getattr__(name):
    # lazy: the device modules import the engine stack
    if name == "DeviceMD":
        from .device_md import DeviceMD

        return DeviceMD
    if name == "DeviceNPT":
        from .device_npt import DeviceNPT

        return DeviceNPT
    if name == "ReplicaMD":
        from .replica_md import ReplicaMD

        return ReplicaMD
    raise AttributeError(name)
