"""Mesh-sharded DNN stereo inference via the XLA SPMD partitioner.

The classical engine hand-writes its collectives (``parallel/classical.py``:
ring halo exchange, cross-chip argmax) because the algorithm is custom.  The
stereo networks (GwcNet / MSNet2D / MSNet3D) are plain convolution graphs,
so the idiomatic TPU scaling is GSPMD: annotate batch/row shardings on the
jit boundary and let XLA partition every conv, inserting the spatial halo
exchanges itself.

The reference's only multi-device construct is ``torch.nn.DataParallel``
(``pipeline/synthesis/trainer.py:36``) — batch-only replication at training
time; its inference path is strictly single-GPU.  This engine goes further
on both §2.4 axes:

* batch frames shard over ``data`` x ``disp`` (video/data parallelism —
  DCN-friendly across hosts),
* image rows shard over ``tile`` (spatial parallelism — conv halos ride
  ICI as compiler-inserted ``CollectivePermute``s).

Equivalence with the single-device backend is asserted bit-tight in
``tests/test_parallel_dnn.py`` on the virtual 8-device CPU mesh.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..core.config import MeshConfig
from .mesh import make_mesh


class ShardedDnnEngine:
    """Batched DNN stereo inference distributed over a (data, tile, disp)
    mesh.  ``process_batch`` expects the batch divisible by
    :attr:`batch_group` (= data x disp mesh extent) and the image height
    divisible by the ``tile`` extent."""

    def __init__(self, model_name: str, image_shape: Tuple[int, int],
                 mesh_config: MeshConfig, *, mesh=None,
                 max_disparity: int = 192, params=None,
                 checkpoint_dir: Optional[str] = None,
                 compute_dtype: str = "float32"):
        from ..models import build_stereo_model, load_or_init_params
        from ..pipeline.backends import _dnn_forward

        self.model_name = model_name
        self.image_shape = image_shape
        self.mesh = mesh if mesh is not None else make_mesh(mesh_config)
        self.batch_group = mesh_config.data * mesh_config.disp
        self._tile = mesh_config.tile
        if image_shape[0] % max(self._tile, 1):
            raise ValueError(f"image height {image_shape[0]} not divisible "
                             f"by the tile mesh extent {self._tile}")
        self.model = build_stereo_model(model_name,
                                        max_disparity=max_disparity)
        self.params = (params if params is not None else
                       load_or_init_params(self.model, model_name,
                                           image_shape,
                                           checkpoint_dir=checkpoint_dir))
        # NCHW frames: batch over data x disp, rows over tile.  Params are
        # replicated — these networks are ~10-50 MB, far below the point
        # where weight sharding pays for its collectives at inference.
        self._in_sharding = NamedSharding(
            self.mesh, P(("data", "disp"), None, "tile", None))
        out_sharding = NamedSharding(self.mesh,
                                     P(("data", "disp"), "tile", None))
        replicated = NamedSharding(self.mesh, P())
        self._forward = jax.jit(
            functools.partial(_dnn_forward, self.model,
                              compute_dtype=jnp.dtype(compute_dtype)),
            in_shardings=(replicated, self._in_sharding, self._in_sharding),
            out_shardings=out_sharding)

    def process_batch(self, left_batch, right_batch) -> jax.Array:
        """(N, 3, H, W) x2 in 0..255 -> (N, H, W) float32 disparities.
        N must be a multiple of :attr:`batch_group`."""
        left = jnp.asarray(left_batch, jnp.float32)
        right = jnp.asarray(right_batch, jnp.float32)
        if left.shape[0] % self.batch_group:
            raise ValueError(f"batch {left.shape[0]} not divisible by the "
                             f"data x disp mesh extent {self.batch_group}")
        left = jax.device_put(left, self._in_sharding)
        right = jax.device_put(right, self._in_sharding)
        return self._forward(self.params, left, right)

    def warmup(self) -> None:
        h, w = self.image_shape
        x = jnp.zeros((self.batch_group, 3, h, w), jnp.float32)
        jax.block_until_ready(self.process_batch(x, x))
