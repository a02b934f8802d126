"""ctypes bindings for the native host runtime (``stereo_native.cc``).

Builds the shared library on first import with g++ (cached next to the
source); every entry point has a pure-NumPy fallback so the framework works
without a toolchain.  See ``stereo_native.cc`` for scope — this is the
TPU-framework analog of the reference's native runtime layer
(``csrc/depth/buffer/device_buffer.cc``, ``csrc/*/setup.py``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "stereo_native.cc")
_LIB_PATH = os.path.join(_DIR, "libstereo_native.so")

_lib = None
_lib_lock = threading.Lock()
_build_error: Optional[str] = None


def _build() -> Optional[str]:
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
           _SRC, "-o", _LIB_PATH, "-lz"]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    except (OSError, subprocess.TimeoutExpired) as exc:
        return str(exc)
    if proc.returncode != 0:
        return proc.stderr[-2000:]
    return None


def _load():
    """Build (if needed) and load the library; returns None on failure."""
    global _lib, _build_error
    with _lib_lock:
        if _lib is not None or _build_error is not None:
            return _lib
        if (not os.path.exists(_LIB_PATH)
                or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
            err = _build()
            if err is not None:
                _build_error = err
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as exc:
            _build_error = str(exc)
            return None
        c_float_p = ctypes.POINTER(ctypes.c_float)
        c_u8_p = ctypes.POINTER(ctypes.c_uint8)
        lib.sn_png_shape.argtypes = [ctypes.c_char_p] + \
            [ctypes.POINTER(ctypes.c_int)] * 3
        lib.sn_png_shape.restype = ctypes.c_int
        lib.sn_decode_png_chw.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_float, c_float_p, ctypes.c_int,
            ctypes.c_int]
        lib.sn_decode_png_chw.restype = ctypes.c_int
        lib.sn_hwc_to_padded_chw.argtypes = [
            c_u8_p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_float,
            c_float_p]
        lib.sn_resize_bilinear_chw.argtypes = [
            c_float_p, ctypes.c_int, ctypes.c_int, ctypes.c_int, c_float_p,
            ctypes.c_int, ctypes.c_int]
        lib.sn_mean_pool.argtypes = [c_float_p, ctypes.c_int, ctypes.c_int,
                                     ctypes.c_int, c_float_p]
        lib.sn_rgb_to_gray.argtypes = [c_float_p, ctypes.c_int, ctypes.c_int,
                                       c_float_p]
        lib.sn_prefetcher_create.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_float,
            ctypes.c_int]
        lib.sn_prefetcher_create.restype = ctypes.c_void_p
        lib.sn_prefetcher_submit.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.sn_prefetcher_submit.restype = ctypes.c_int64
        lib.sn_prefetcher_next.argtypes = [ctypes.c_void_p, c_float_p]
        lib.sn_prefetcher_next.restype = ctypes.c_int
        lib.sn_prefetcher_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def build_error() -> Optional[str]:
    _load()
    return _build_error


def _fptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def png_shape(path: str):
    """(H, W, C) of a PNG, or None if unsupported/unavailable."""
    lib = _load()
    if lib is None:
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    c = ctypes.c_int()
    if lib.sn_png_shape(path.encode(), ctypes.byref(h), ctypes.byref(w),
                        ctypes.byref(c)):
        return None
    return h.value, w.value, c.value


def decode_png_padded_chw(path: str, pad: Sequence[int] = (0, 0, 0, 0),
                          scale: float = 1.0) -> Optional[np.ndarray]:
    """PNG file -> (3, top+H+bottom, left+W+right) float32; None if the
    native path can't handle this file (caller falls back to PIL)."""
    lib = _load()
    if lib is None:
        return None
    shape = png_shape(path)
    if shape is None:
        return None
    h, w, _ = shape
    left, top, right, bottom = pad
    out = np.empty((3, top + h + bottom, left + w + right), np.float32)
    rc = lib.sn_decode_png_chw(path.encode(), left, top, right, bottom,
                               ctypes.c_float(scale), _fptr(out),
                               out.shape[1], out.shape[2])
    return out if rc == 0 else None


def hwc_to_padded_chw(hwc_u8: np.ndarray, pad: Sequence[int] = (0, 0, 0, 0),
                      scale: float = 1.0) -> np.ndarray:
    """uint8 (H, W, C) -> padded float32 (3, H', W'); numpy fallback."""
    left, top, right, bottom = pad
    lib = _load()
    h, w, c = hwc_u8.shape
    if lib is None:
        chw = hwc_u8.astype(np.float32).transpose(2, 0, 1) * scale
        if c == 1:
            chw = np.tile(chw, (3, 1, 1))
        chw = chw[:3] if c >= 3 else np.tile(chw[:1], (3, 1, 1))
        return np.pad(chw, ((0, 0), (top, bottom), (left, right)))
    arr = np.ascontiguousarray(hwc_u8)
    out = np.empty((3, top + h + bottom, left + w + right), np.float32)
    lib.sn_hwc_to_padded_chw(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, c,
        left, top, right, bottom, ctypes.c_float(scale), _fptr(out))
    return out


def resize_bilinear_chw(chw: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    lib = _load()
    c, h, w = chw.shape
    if lib is None:
        import jax
        return np.asarray(jax.image.resize(chw, (c, out_h, out_w), "bilinear"))
    src = np.ascontiguousarray(chw, np.float32)
    out = np.empty((c, out_h, out_w), np.float32)
    lib.sn_resize_bilinear_chw(_fptr(src), c, h, w, _fptr(out), out_h, out_w)
    return out


def mean_pool(hw: np.ndarray, k: int) -> np.ndarray:
    lib = _load()
    h, w = hw.shape
    oh, ow = -(-h // k), -(-w // k)
    if lib is None:
        from ..ops.imageops import mean_pool as jnp_pool
        return np.asarray(jnp_pool(hw, k))
    src = np.ascontiguousarray(hw, np.float32)
    out = np.empty((oh, ow), np.float32)
    lib.sn_mean_pool(_fptr(src), h, w, k, _fptr(out))
    return out


def rgb_to_gray(chw: np.ndarray) -> np.ndarray:
    lib = _load()
    _, h, w = chw.shape
    if lib is None:
        r, g, b = chw[0], chw[1], chw[2]
        return ((0.2989 * r + 0.5870 * g) + 0.1140 * b).astype(np.float32)
    src = np.ascontiguousarray(chw, np.float32)
    out = np.empty((h, w), np.float32)
    lib.sn_rgb_to_gray(_fptr(src), h, w, out.ctypes.data_as(
        ctypes.POINTER(ctypes.c_float)))
    return out


class FramePrefetcher:
    """Threaded native PNG->padded-CHW pipeline over a reusable buffer ring.

    Usage::

        with FramePrefetcher(paths, pad=(19, 5, 19, 4)) as pf:
            for frame in pf:        # (3, H', W') float32, submission order
                ...
    """

    def __init__(self, paths: Sequence[str], pad: Sequence[int] = (0, 0, 0, 0),
                 scale: float = 1.0, slots: int = 4, threads: int = 2):
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native library unavailable: {_build_error}")
        shape = png_shape(paths[0])
        if shape is None:
            raise RuntimeError(f"unsupported PNG: {paths[0]}")
        h, w, _ = shape
        left, top, right, bottom = pad
        self._shape = (3, top + h + bottom, left + w + right)
        self._lib = lib
        self._paths = list(paths)
        self._handle = lib.sn_prefetcher_create(
            slots, self._shape[1], self._shape[2], left, top, right, bottom,
            ctypes.c_float(scale), threads)
        self._submitted = 0
        self._consumed = 0
        self._slots = slots
        # pre-fill the ring
        while (self._submitted < len(self._paths)
               and self._submitted < slots):
            self._submit_next()

    def _submit_next(self):
        self._lib.sn_prefetcher_submit(
            self._handle, self._paths[self._submitted].encode())
        self._submitted += 1

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        if self._consumed >= len(self._paths):
            raise StopIteration
        out = np.empty(self._shape, np.float32)
        rc = self._lib.sn_prefetcher_next(self._handle, _fptr(out))
        self._consumed += 1
        if self._submitted < len(self._paths):
            self._submit_next()
        if rc != 0:
            raise RuntimeError(
                f"native decode failed ({rc}) for "
                f"{self._paths[self._consumed - 1]}")
        return out

    def close(self):
        if self._handle:
            self._lib.sn_prefetcher_destroy(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
