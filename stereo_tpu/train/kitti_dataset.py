"""KITTI stereo dataset for right-view-synthesis training.

Parity with the reference's ``pipeline/synthesis/kitti_dataset.py``: items
are (left_full, left_downscaled, right_full) float32 tensors in 0..1, the
full views padded 375x1242 -> 384x1280 and the downscaled view resized to
96x320 (``:33-44``); drives are discovered and sorted the same way
(``:46-68``).  Instead of a torch ``Dataset``/``DataLoader`` this is a plain
indexable host-side dataset plus a background-threaded, shuffling, batching
iterator (the input pipeline feeding ``jax.device_put``).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, List, Sequence, Tuple

import numpy as np
from PIL import Image

from ..pipeline.camera.kitti import KITTI_PAD
from ..utils.image_io import pad_image, read_kitti_drive_stereo_pairs

RVS_FULL_SHAPE = (384, 1280)
RVS_DOWNSCALED_SHAPE = (96, 320)

Item = Tuple[np.ndarray, np.ndarray, np.ndarray]


def _read_resized(path: str, shape_hw) -> np.ndarray:
    """Decode + bilinear-resize to (3, H, W) float32 0..255 (native decode +
    antialiased resize when available, PIL otherwise)."""
    from .. import _native

    arr = _native.decode_png_padded_chw(path)
    if arr is not None:
        return _native.resize_bilinear_chw(arr, shape_hw[0], shape_hw[1])
    with Image.open(path) as im:
        im = im.convert("RGB").resize((shape_hw[1], shape_hw[0]),
                                      Image.BILINEAR)
        arr = np.asarray(im, dtype=np.float32)
    return np.ascontiguousarray(arr.transpose(2, 0, 1))


def _read_chw(path: str) -> np.ndarray:
    from ..utils.image_io import read_image_chw

    return read_image_chw(path)


class KittiStereoDataset:
    """Indexable dataset over one or more KITTI raw drives."""

    def __init__(self, drive_dirs: Sequence[str]):
        self._lefts: List[str] = []
        self._rights: List[str] = []
        for drive in drive_dirs:
            lefts, rights = read_kitti_drive_stereo_pairs(drive)
            self._lefts.extend(sorted(lefts))
            self._rights.extend(sorted(rights))
        if len(self._lefts) != len(self._rights):
            raise RuntimeError("Mismatched left/right image counts.")

    def __len__(self) -> int:
        return len(self._lefts)

    def __getitem__(self, idx: int) -> Item:
        left = pad_image(_read_chw(self._lefts[idx]), *KITTI_PAD) / 255.0
        left_down = _read_resized(self._lefts[idx], RVS_DOWNSCALED_SHAPE) / 255.0
        right = pad_image(_read_chw(self._rights[idx]), *KITTI_PAD) / 255.0
        return (left.astype(np.float32), left_down.astype(np.float32),
                right.astype(np.float32))


def batch_iterator(dataset: KittiStereoDataset, batch_size: int,
                   shuffle: bool = True, seed: int = 0, drop_last: bool = True,
                   prefetch: int = 2) -> Iterator[Tuple[np.ndarray, ...]]:
    """Background-threaded shuffling batch loader.

    Decodes/pads on a worker thread so host IO overlaps device compute
    (the reference relies on torch ``DataLoader`` workers for this).
    """
    order = np.arange(len(dataset))
    if shuffle:
        np.random.default_rng(seed).shuffle(order)
    n_batches = (len(order) // batch_size if drop_last
                 else -(-len(order) // batch_size))
    q: "queue.Queue" = queue.Queue(maxsize=prefetch)

    def worker():
        try:
            for b in range(n_batches):
                idxs = order[b * batch_size:(b + 1) * batch_size]
                items = [dataset[int(i)] for i in idxs]
                q.put(tuple(np.stack(parts) for parts in zip(*items)))
        finally:
            q.put(None)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        batch = q.get()
        if batch is None:
            return
        yield batch
