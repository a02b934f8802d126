from . import image_io, paths, pointcloud, profiling, velodyne

__all__ = ["image_io", "paths", "pointcloud", "profiling", "velodyne"]
