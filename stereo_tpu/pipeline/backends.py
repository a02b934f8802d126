"""Stereo-matching backend protocol and implementations.

Parity with the reference's ``pipeline/depth/`` package:

* ``StereoMatchingBackend`` — the ABC (``depth/stereo_matching.py:6-10``).
* ``ClassicalStereoBackend`` — the classical multi-block-matching engine
  (replaces ``CudaStereoMatchingBackend`` + the ``cuda_depth`` extension).
* ``DnnStereoMatchingBackend`` — Flax stereo networks (GwcNet / MSNet2D /
  MSNet3D), replacing the traced-TorchScript loader
  (``depth/dnn_stereo_matching_backend.py:27-38``).  Model "traces" are
  Orbax/msgpack checkpoints of parameters; the jitted ``apply`` is the
  compiled artifact.
"""

from __future__ import annotations

import functools
from abc import ABC, abstractmethod
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.config import MatchingConfig
from ..matching.classical import ClassicalStereoEngine

# ImageNet statistics used by the DNN preprocessing
# (``dnn_stereo_matching_backend.py:16-24``).
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

AVAILABLE_DNN_BACKENDS = ("gwcnet", "msnet2d", "msnet3d")


class StereoMatchingBackend(ABC):
    """(3, H, W) left/right RGB in 0..255 -> (H, W) float disparity."""

    @abstractmethod
    def process(self, left_image, right_image) -> jax.Array:
        ...


class ClassicalStereoBackend(StereoMatchingBackend):
    """Multi-block-matching classical engine (SURVEY.md §2.1 N2-N11)."""

    def __init__(self, config: MatchingConfig):
        self.engine = ClassicalStereoEngine(config)

    def process(self, left_image, right_image) -> jax.Array:
        return self.engine.compute_disparity_map(left_image, right_image)

    def process_batch(self, left_batch, right_batch) -> jax.Array:
        return self.engine.compute_disparity_maps(left_batch, right_batch)


class ShardedClassicalBackend(StereoMatchingBackend):
    """Classical engine distributed over a (data, tile, disp) device mesh
    (``stereo_tpu.parallel``) — selected when the pipeline config carries a
    :class:`~stereo_tpu.core.config.MeshConfig`."""

    def __init__(self, config: MatchingConfig, mesh_config):
        from ..parallel import ShardedClassicalEngine

        self.engine = ShardedClassicalEngine(config, mesh_config)
        self._single_ok = mesh_config.data == 1

    def process(self, left_image, right_image) -> jax.Array:
        if not self._single_ok:
            raise RuntimeError("single-frame process() needs data axis == 1; "
                               "use process_batch")
        import jax.numpy as jnp

        left = jnp.asarray(left_image, jnp.float32)[None]
        right = jnp.asarray(right_image, jnp.float32)[None]
        return self.engine.compute_disparity_maps(left, right)[0]

    def process_batch(self, left_batch, right_batch) -> jax.Array:
        return self.engine.compute_disparity_maps(left_batch, right_batch)


class ShardedDnnBackend(StereoMatchingBackend):
    """DNN stereo inference GSPMD-partitioned over a (data, tile, disp)
    mesh (``stereo_tpu.parallel.dnn``) — selected when the pipeline config
    carries a :class:`~stereo_tpu.core.config.MeshConfig` and a DNN backend
    name.  Single frames replicate across the batch group; batches must be
    group-divisible."""

    def __init__(self, model_name: str, image_shape, mesh_config,
                 max_disparity: int = 192, compute_dtype: str = "float32"):
        from ..parallel import ShardedDnnEngine

        self.engine = ShardedDnnEngine(model_name, image_shape, mesh_config,
                                       max_disparity=max_disparity,
                                       compute_dtype=compute_dtype)

    def process(self, left_image, right_image) -> jax.Array:
        g = self.engine.batch_group
        left = jnp.broadcast_to(jnp.asarray(left_image, jnp.float32)[None],
                                (g,) + tuple(left_image.shape))
        right = jnp.broadcast_to(jnp.asarray(right_image, jnp.float32)[None],
                                 (g,) + tuple(right_image.shape))
        return self.engine.process_batch(left, right)[0]

    def process_batch(self, left_batch, right_batch) -> jax.Array:
        return self.engine.process_batch(left_batch, right_batch)


def normalize_imagenet(image_chw: jnp.ndarray) -> jnp.ndarray:
    """0..255 CHW -> ImageNet-normalized CHW float32."""
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)[:, None, None]
    std = jnp.asarray(IMAGENET_STD, jnp.float32)[:, None, None]
    return (image_chw / 255.0 - mean) / std


class DnnStereoMatchingBackend(StereoMatchingBackend):
    """Flax DNN stereo networks with jit-compiled inference.

    ``model_name`` is one of :data:`AVAILABLE_DNN_BACKENDS`.  Parameters are
    loaded from ``data/checkpoints/<model_name>`` when present, otherwise
    initialized fresh (random — useful for benchmarks and shape tests;
    accuracy requires training, see ``stereo_tpu/train``).
    """

    def __init__(self, model_name: str, image_shape: Tuple[int, int],
                 max_disparity: int = 192, params=None,
                 checkpoint_dir: Optional[str] = None,
                 compute_dtype: str = "float32"):
        if model_name not in AVAILABLE_DNN_BACKENDS:
            raise RuntimeError(f"Unknown DNN backend: {model_name!r}; "
                               f"expected one of {AVAILABLE_DNN_BACKENDS}")
        from ..models import build_stereo_model, load_or_init_params

        self.model_name = model_name
        self.image_shape = image_shape
        self.compute_dtype = jnp.dtype(compute_dtype)
        self.model = build_stereo_model(model_name, max_disparity=max_disparity)
        self.params = (params if params is not None else
                       load_or_init_params(self.model, model_name, image_shape,
                                           checkpoint_dir=checkpoint_dir))
        self._forward = jax.jit(functools.partial(
            _dnn_forward, self.model, compute_dtype=self.compute_dtype))

    def process(self, left_image, right_image) -> jax.Array:
        left = jnp.asarray(left_image, jnp.float32)
        right = jnp.asarray(right_image, jnp.float32)
        return self._forward(self.params, left[None], right[None])[0]

    def process_batch(self, left_batch, right_batch) -> jax.Array:
        return self._forward(self.params,
                             jnp.asarray(left_batch, jnp.float32),
                             jnp.asarray(right_batch, jnp.float32))

    def warmup(self) -> None:
        h, w = self.image_shape
        x = jnp.zeros((1, 3, h, w), jnp.float32)
        jax.block_until_ready(self._forward(self.params, x, x))


def _dnn_forward(model, params, left_nchw, right_nchw,
                 compute_dtype=jnp.float32):
    """Inference forward.  With ``compute_dtype=bfloat16`` the parameters
    and activations run in bf16 on the MXU (disparity regression output is
    cast back to f32); accuracy cost is sub-0.1px on the soft-argmin."""
    left = normalize_imagenet(left_nchw)
    right = normalize_imagenet(right_nchw)
    if compute_dtype != jnp.float32:
        cast = lambda t: (t.astype(compute_dtype)
                          if isinstance(t, jnp.ndarray) and
                          t.dtype == jnp.float32 else t)
        params = jax.tree_util.tree_map(cast, params)
        left = left.astype(compute_dtype)
        right = right.astype(compute_dtype)
    out = model.apply(params, left, right, train=False)
    return out.astype(jnp.float32)
