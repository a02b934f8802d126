from .camera import Camera, EvaluationCamera
from .kitti import KittiSingleViewCamera
from .middlebury import (MiddleburyCalibration, MiddleburyStereoCamera,
                         load_middlebury_calibration)

__all__ = [
    "Camera", "EvaluationCamera", "KittiSingleViewCamera",
    "MiddleburyCalibration", "MiddleburyStereoCamera",
    "load_middlebury_calibration",
]
