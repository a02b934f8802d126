from .classical import ShardedClassicalEngine
from .dnn import ShardedDnnEngine
from .mesh import (MESH_AXES, batch_sharding, image_row_sharding,
                   initialize_distributed, make_mesh, replicated)
from .synthesis import ShardedSingleViewEngine

__all__ = ["ShardedClassicalEngine", "ShardedDnnEngine",
           "ShardedSingleViewEngine", "MESH_AXES", "batch_sharding",
           "image_row_sharding", "initialize_distributed", "make_mesh",
           "replicated"]
