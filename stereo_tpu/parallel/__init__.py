from .classical import ShardedClassicalEngine
from .mesh import (MESH_AXES, batch_sharding, image_row_sharding,
                   initialize_distributed, make_mesh, replicated)

__all__ = ["ShardedClassicalEngine", "MESH_AXES", "batch_sharding",
           "image_row_sharding", "initialize_distributed", "make_mesh",
           "replicated"]
