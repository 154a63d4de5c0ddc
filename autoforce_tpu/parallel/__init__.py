from .mesh import make_mesh, mesh_pad, sharded_kernel_block, sharded_predict

__all__ = ["make_mesh", "mesh_pad", "sharded_kernel_block", "sharded_predict"]
