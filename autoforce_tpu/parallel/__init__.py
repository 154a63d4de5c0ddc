from .mesh import make_mesh, sharded_predict

__all__ = ["make_mesh", "sharded_predict"]
