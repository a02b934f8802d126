"""Camera abstractions: frame sources for the depth-estimation pipeline.

API parity with the reference's ``pipeline/camera/camera.py:7-34`` — focal
length, baseline, static image shape, disparity range, and streaming of
(left, right-or-None) pairs — with NumPy arrays instead of torch tensors.
Images are CHW float32 in 0..255.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Iterator, Optional, Tuple

import numpy as np


class Camera(ABC):
    """A stream of stereo (or single-view) frames plus calibration."""

    @abstractmethod
    def focal_length(self) -> float:
        ...

    @abstractmethod
    def baseline(self) -> float:
        ...

    @abstractmethod
    def get_image_shape(self) -> Tuple[int, int]:
        """(H, W) of every streamed frame (static — jit cache key)."""
        ...

    @abstractmethod
    def get_disparity_boundaries(self) -> Tuple[int, int]:
        """(min_disparity, max_disparity) in full-resolution pixels."""
        ...

    @abstractmethod
    def stream_image_pairs(self) -> Iterator[Tuple[np.ndarray, Optional[np.ndarray]]]:
        """Yield (left, right) CHW frames; right may be None (single-view
        mode — the pipeline will synthesize it)."""
        ...


class EvaluationCamera(Camera):
    """A camera that can also supply ground-truth disparity maps."""

    @abstractmethod
    def stream_image_pairs_with_gt_disparity(
            self) -> Iterator[Tuple[np.ndarray, Optional[np.ndarray], np.ndarray]]:
        """Yield (left, right-or-None, gt_disparity) triplets; gt is (H, W)
        float32 with 0 marking missing ground truth."""
        ...
