from .xyz import read_xyz, write_xyz
from .tape import SgprTape

__all__ = ["read_xyz", "write_xyz", "SgprTape"]
