from . import compile_cache, image_io, paths, pointcloud, profiling, velodyne

__all__ = ["compile_cache", "image_io", "paths", "pointcloud", "profiling",
           "velodyne"]
