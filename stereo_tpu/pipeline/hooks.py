"""Pipeline hooks: per-frame observers for saving/logging artifacts.

Parity with the reference's ``pipeline/depth_estimation_pipeline_hooks.py``:
hook ABC with ``process`` / ``on_pipeline_start`` / ``on_pipeline_end``
(``:18-32``), LambdaHook, completion logger, disparity/context frame savers,
point-cloud saver, and the buffered video saver — without the torchvision /
open3d dependencies.  Device arrays are pulled to host NumPy inside hooks
(the device->host boundary lives here, as in the reference).
"""

from __future__ import annotations

import os
from abc import ABC, abstractmethod
from collections import OrderedDict
from typing import Callable

import numpy as np

from ..utils.image_io import (make_image_grid, prepare_image_grid,
                              save_image_grid, write_video)
from ..utils.paths import timestamp_folder_name
from ..utils.pointcloud import save_point_cloud_from_depth
from .camera.camera import Camera
from .depth_pipeline import DepthEstimationPipelineContext


class DepthEstimationPipelineHook(ABC):

    @abstractmethod
    def process(self, context: DepthEstimationPipelineContext) -> None:
        ...

    def on_pipeline_start(self) -> None:
        pass

    def on_pipeline_end(self) -> None:
        pass

    @staticmethod
    def invoke_in_context(hook: "DepthEstimationPipelineHook",
                          context: DepthEstimationPipelineContext) -> None:
        hook.process(context)


class LambdaHook(DepthEstimationPipelineHook):

    def __init__(self, func: Callable[[DepthEstimationPipelineContext], None]):
        self._func = func

    def process(self, context: DepthEstimationPipelineContext) -> None:
        self._func(context)


class DisparityMapCompletionLogger(DepthEstimationPipelineHook):

    def process(self, context: DepthEstimationPipelineContext) -> None:
        print(f"Computed disparity map: {tuple(context.disparity_map.shape)}...")


class DisparityMapSaver(DepthEstimationPipelineHook):

    def __init__(self, save_dir: str):
        self._save_dir = os.path.join(save_dir, timestamp_folder_name())
        os.makedirs(self._save_dir, exist_ok=True)

    def process(self, context: DepthEstimationPipelineContext) -> None:
        path = os.path.join(self._save_dir,
                            f"disparity_map_{context.frame_index:06d}.png")
        save_image_grid(np.asarray(context.disparity_map), path)


class ContextFrameSaver(DepthEstimationPipelineHook):
    """Saves a left/right/disparity grid per frame (reference ``:61-69``)."""

    def __init__(self, save_dir: str):
        self._save_dir = os.path.join(save_dir, timestamp_folder_name())
        os.makedirs(self._save_dir, exist_ok=True)

    def process(self, context: DepthEstimationPipelineContext) -> None:
        path = os.path.join(self._save_dir,
                            f"context_frame_{context.frame_index:06d}.png")
        save_image_grid([np.asarray(context.left_image),
                         np.asarray(context.right_image),
                         np.asarray(context.disparity_map)], path)


class PointCloudSaver(DepthEstimationPipelineHook):
    """Disparity -> depth (``b*f/d``) -> .ply point cloud (reference
    ``:72-101``), with a mask removing invalid-disparity pixels."""

    def __init__(self, focal_length: float, baseline: float, save_dir: str,
                 invalid_disparity: float):
        self._focal_length = focal_length
        self._baseline = baseline
        self._invalid_disparity = invalid_disparity
        self._save_dir = os.path.join(save_dir, timestamp_folder_name())

    def process(self, context: DepthEstimationPipelineContext) -> None:
        path = os.path.join(self._save_dir,
                            f"point_cloud_{context.frame_index:06d}.ply")
        disparity = np.asarray(context.disparity_map, dtype=np.float64)
        with np.errstate(divide="ignore"):
            depth = (self._baseline * self._focal_length) / disparity
        valid = disparity != self._invalid_disparity
        save_point_cloud_from_depth(depth, valid, path)
        print(f"Saved point cloud: {path}...")

    @staticmethod
    def for_camera(camera: Camera, save_dir: str,
                   invalid_disparity: float) -> "PointCloudSaver":
        return PointCloudSaver(focal_length=camera.focal_length(),
                               baseline=camera.baseline(),
                               save_dir=save_dir,
                               invalid_disparity=invalid_disparity)


class ContextVideoSaver(DepthEstimationPipelineHook):
    """Buffers one grid frame per processed frame; encodes an mp4 on
    pipeline end (reference ``:104-131``)."""

    def __init__(self, save_path: str, fps: int):
        self._fps = fps
        self._save_path = save_path
        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
        self._frames: "OrderedDict[int, np.ndarray]" = OrderedDict()

    def process(self, context: DepthEstimationPipelineContext) -> None:
        grid = make_image_grid(prepare_image_grid([
            np.asarray(context.left_image),
            np.asarray(context.right_image),
            np.asarray(context.disparity_map)]), padding=10, pad_value=1.0)
        frame = np.clip(grid * 255.0 + 0.5, 0, 255).astype(np.uint8)
        self._frames[context.frame_index] = frame.transpose(1, 2, 0)

    def on_pipeline_end(self) -> None:
        if not self._frames:
            return
        stack = np.stack([self._frames[i] for i in self._frames], axis=0)
        write_video(self._save_path, stack, self._fps)
