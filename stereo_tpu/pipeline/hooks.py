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
import threading
from abc import ABC, abstractmethod
from collections import OrderedDict
from typing import Callable

import numpy as np

from ..utils.image_io import (make_image_grid, open_video_writer,
                              prepare_image_grid, save_image_grid)
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
        shape = tuple(context.disparity_map.shape)
        print(f"[hook] frame {context.frame_index}: disparity ready, shape={shape}")


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
        print(f"[hook] frame {context.frame_index}: point cloud -> {path}")

    @staticmethod
    def for_camera(camera: Camera, save_dir: str,
                   invalid_disparity: float) -> "PointCloudSaver":
        return PointCloudSaver(focal_length=camera.focal_length(),
                               baseline=camera.baseline(),
                               save_dir=save_dir,
                               invalid_disparity=invalid_disparity)


class ContextVideoSaver(DepthEstimationPipelineHook):
    """Streams one grid frame per processed frame into an mp4 writer
    (reference ``:104-131`` buffers the whole video in RAM; here the writer
    is opened on the first frame and frames are written incrementally, so
    host memory stays flat over the drive length).

    Hook tasks run on a thread pool and may complete out of order, while a
    video stream must be written in frame order — a small reorder buffer
    holds early frames until their predecessors arrive.
    """

    def __init__(self, save_path: str, fps: int):
        self._fps = fps
        self._save_path = save_path
        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
        self._lock = threading.Lock()
        self._writer = None
        self._next_index = 0
        self._out_of_order: "OrderedDict[int, np.ndarray]" = OrderedDict()

    def _write(self, frame_hwc: np.ndarray) -> None:
        if self._writer is None:
            self._writer = open_video_writer(
                self._save_path, frame_hwc.shape[0], frame_hwc.shape[1],
                self._fps)
        self._writer.write(frame_hwc[:, :, ::-1])  # RGB -> BGR

    def process(self, context: DepthEstimationPipelineContext) -> None:
        grid = make_image_grid(prepare_image_grid([
            np.asarray(context.left_image),
            np.asarray(context.right_image),
            np.asarray(context.disparity_map)]), padding=10, pad_value=1.0)
        frame = np.clip(grid * 255.0 + 0.5, 0, 255).astype(np.uint8)
        frame = np.ascontiguousarray(frame.transpose(1, 2, 0))
        with self._lock:
            self._out_of_order[context.frame_index] = frame
            while self._next_index in self._out_of_order:
                self._write(self._out_of_order.pop(self._next_index))
                self._next_index += 1

    def on_pipeline_end(self) -> None:
        with self._lock:
            for index in sorted(self._out_of_order):
                self._write(self._out_of_order.pop(index))
            if self._writer is not None:
                self._writer.release()
                self._writer = None
