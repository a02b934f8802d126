"""Image IO and grid-composition helpers (NumPy/PIL, no torch).

Replaces the reference's ``helpers/imageio_helpers.py`` (grid save, KITTI
pair listing) and the torchvision IO it leans on.  All images are CHW
float32 in 0..255 unless stated otherwise.
"""

from __future__ import annotations

import os
from typing import List, Sequence, Tuple, Union

import numpy as np
from PIL import Image

ImageLike = Union[np.ndarray, "object"]  # ndarray or anything np.asarray-able


def read_image_chw(path: str) -> np.ndarray:
    """Decode an image file to (3, H, W) float32 in 0..255.

    Uses the native zlib decoder (``stereo_tpu._native``) when it supports
    the file (8-bit non-interlaced PNG); PIL otherwise.
    """
    if path.lower().endswith(".png"):
        from .. import _native

        arr = _native.decode_png_padded_chw(path)
        if arr is not None:
            return arr
    with Image.open(path) as im:
        arr = np.asarray(im.convert("RGB"), dtype=np.float32)
    return np.ascontiguousarray(arr.transpose(2, 0, 1))


def write_image_chw(path: str, image_chw: np.ndarray) -> None:
    """(3, H, W) or (H, W) float array in 0..255 -> image file."""
    arr = np.asarray(image_chw)
    if arr.ndim == 3:
        arr = arr.transpose(1, 2, 0)
    arr = np.clip(np.round(arr), 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


def pad_image(image: np.ndarray, left: int, top: int, right: int, bottom: int,
              fill: float = 0.0) -> np.ndarray:
    """Constant-pad the trailing (H, W) axes (torchvision ``T.Pad`` order:
    left, top, right, bottom — ``kitti_single_view_camera.py:23``)."""
    pad = [(0, 0)] * (image.ndim - 2) + [(top, bottom), (left, right)]
    return np.pad(image, pad, constant_values=fill)


def normalize_image(image: ImageLike) -> np.ndarray:
    """0..255 -> 0..~1 (reference divides by 256, ``imageio_helpers.py:9``)."""
    return np.asarray(image, dtype=np.float32) / 256.0


def ensure_chw(image: np.ndarray) -> np.ndarray:
    """(H, W) -> (3, H, W) by channel replication; (3, H, W) passes through."""
    arr = np.asarray(image)
    if arr.ndim == 3:
        return arr
    return np.tile(arr[None], (3, 1, 1))


def make_image_grid(images: Sequence[np.ndarray], padding: int = 10,
                    pad_value: float = 1.0) -> np.ndarray:
    """Stack (3, H, W) images into one vertical grid with padded borders.

    Output (3, H', W') float; the analog of ``torchvision.utils.make_grid``
    as used by the reference's frame/video hooks with one image per row.
    """
    chw = [ensure_chw(im).astype(np.float32) for im in images]
    h = max(im.shape[1] for im in chw)
    w = max(im.shape[2] for im in chw)
    n = len(chw)
    gh = n * h + (n + 1) * padding
    gw = w + 2 * padding
    grid = np.full((3, gh, gw), pad_value, dtype=np.float32)
    for i, im in enumerate(chw):
        y0 = padding + i * (h + padding)
        grid[:, y0:y0 + im.shape[1], padding:padding + im.shape[2]] = im
    return grid


def prepare_image_grid(images: Union[ImageLike, List[ImageLike]]) -> List[np.ndarray]:
    """Normalize + channel-expand a list of images (parity:
    ``imageio_helpers.py:18-21``)."""
    if not isinstance(images, list):
        images = [images]
    return [ensure_chw(normalize_image(np.asarray(im))) for im in images]


def save_image_grid(images: Union[ImageLike, List[ImageLike]], file_path: str,
                    padding: int = 10, pad_value: float = 1.0) -> None:
    """Save images as one grid PNG (parity: ``imageio_helpers.py:24-29``)."""
    grid = make_image_grid(prepare_image_grid(images), padding, pad_value)
    write_image_chw(file_path, grid * 255.0)


def read_kitti_drive_stereo_pairs(drive_dir: str) -> Tuple[List[str], List[str]]:
    """List (left, right) image paths of a KITTI raw drive
    (``image_02/data`` and ``image_03/data`` subdirs; parity:
    ``imageio_helpers.py:32-43``)."""
    left_dir = os.path.join(drive_dir, "image_02", "data")
    right_dir = os.path.join(drive_dir, "image_03", "data")
    for d, side in ((left_dir, "left"), (right_dir, "right")):
        if not os.path.exists(d):
            raise RuntimeError(f"Folder for {side} images not found: {d}.")
    lefts = [os.path.join(left_dir, f) for f in os.listdir(left_dir)]
    rights = [os.path.join(right_dir, f) for f in os.listdir(right_dir)]
    return lefts, rights


def open_video_writer(path: str, height: int, width: int, fps: int):
    """Open a streaming mp4 writer; callers ``.write()`` BGR uint8 frames
    incrementally and ``.release()`` when done — memory stays flat over the
    video length (the reference buffers the whole stack in RAM)."""
    import cv2

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps,
                             (width, height))
    if not writer.isOpened():
        raise RuntimeError(f"Could not open video writer for {path}")
    return writer


def write_video(path: str, frames_thwc: np.ndarray, fps: int) -> None:
    """Write a (T, H, W, 3) uint8 RGB frame stack to an mp4 (replaces
    ``torchvision.io.write_video`` in the reference's video hook)."""
    t, h, w, _ = frames_thwc.shape
    writer = open_video_writer(path, h, w, fps)
    try:
        for frame in frames_thwc:
            writer.write(frame[:, :, ::-1])  # RGB -> BGR
    finally:
        writer.release()
