"""Mesh-sharded single-view inference: Deep3D RVS + classical matching.

The reference's headline scenario is ONE left view in, disparity out
(``/root/reference/src/python/api.py:25-31``) — strictly single-GPU there.
This engine distributes that flagship path over a (data, tile, disp) mesh,
composing both stages inside one jitted graph:

* **Deep3D right-view synthesis** is a plain conv/dense graph, so it scales
  the idiomatic way — GSPMD: the batch shards over ``data`` x ``disp``
  (video parallelism) and image rows over ``tile`` (XLA SPMD partitions
  every conv, inserting the spatial halo ``CollectivePermute``s itself),
  mirroring :class:`~stereo_tpu.parallel.dnn.ShardedDnnEngine`.
* **Classical matching** is per-frame independent, so its unit of
  parallelism is the frame: the synthesized views are resharded to pure
  batch layout and each shard runs the exact single-frame program via
  ``shard_map`` + ``lax.map`` — the same bit-identical-per-frame execution
  the single-device engine uses (``matching/classical.py:95-103``), with
  zero cross-chip traffic in the matcher itself.  (Row/disparity sharding
  *within* one frame is the explicit-collective
  :class:`~stereo_tpu.parallel.classical.ShardedClassicalEngine`; at the
  batch sizes this engine targets, frame parallelism is strictly cheaper —
  no halo or argmax collectives at all.)

Equivalence with the single-device path (``synthesize_batch`` + the
single-frame matcher) is asserted on the virtual 8-device CPU mesh in
``tests/test_parallel_synthesis.py``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..core.config import MatchingConfig, MeshConfig
from .mesh import make_mesh


class ShardedSingleViewEngine:
    """Batched single-view depth (left views only -> disparities) over a
    (data, tile, disp) mesh.  ``process_batch`` expects the batch divisible
    by :attr:`batch_group` (= data x disp mesh extent) and the image height
    divisible by the ``tile`` extent."""

    def __init__(self, matching_config: MatchingConfig,
                 mesh_config: MeshConfig, *, mesh=None, synthesis=None,
                 checkpoint_dir: Optional[str] = None,
                 compute_dtype: str = "float32"):
        from ..matching.classical import compute_disparity_map
        from ..synthesis.right_view_synthesis import (RightViewSynthesis,
                                                      synthesize_batch)

        self.config = matching_config
        self.mesh = mesh if mesh is not None else make_mesh(mesh_config)
        self.batch_group = mesh_config.data * mesh_config.disp
        self._tile = mesh_config.tile
        out_shape: Tuple[int, int] = (matching_config.height,
                                      matching_config.width)
        if out_shape[0] % max(self._tile, 1):
            raise ValueError(f"image height {out_shape[0]} not divisible "
                             f"by the tile mesh extent {self._tile}")
        if synthesis is None:
            synthesis = RightViewSynthesis(output_shape=out_shape,
                                           checkpoint_dir=checkpoint_dir,
                                           compute_dtype=compute_dtype)
        self.synthesis = synthesis
        dtype = jnp.dtype(compute_dtype)
        model = synthesis.model

        in_sharding = NamedSharding(self.mesh,
                                    P(("data", "disp"), None, "tile", None))
        batch_only = NamedSharding(self.mesh,
                                   P(("data", "disp"), None, None, None))
        out_sharding = NamedSharding(self.mesh,
                                     P(("data", "disp"), None, None))
        replicated = NamedSharding(self.mesh, P())
        self._in_sharding = in_sharding

        match_one = lambda pair: compute_disparity_map(  # noqa: E731
            *pair, config=matching_config)

        def _match_shard(left_shard, right_shard):
            # Exact single-frame program per frame, sequential per shard —
            # bit-identical to the single-device engine (no vmap batching
            # rules in the fused/Pallas stages).
            return lax.map(match_one, (left_shard, right_shard))

        match_shards = jax.shard_map(
            _match_shard, mesh=self.mesh,
            in_specs=(P(("data", "disp")), P(("data", "disp"))),
            out_specs=P(("data", "disp")))

        def forward(variables, left_batch):
            right = synthesize_batch(model, variables, left_batch,
                                     output_shape=out_shape,
                                     full_shape=synthesis.model_full_shape,
                                     down_shape=synthesis.model_down_shape,
                                     compute_dtype=dtype)
            # The matcher is frame-parallel: reshard both views to pure
            # batch layout (one all-gather of the tile-sharded rows), then
            # zero communication inside the matcher.
            left_b = lax.with_sharding_constraint(left_batch, batch_only)
            right_b = lax.with_sharding_constraint(right, batch_only)
            return match_shards(left_b, right_b), right_b

        self._forward = jax.jit(forward,
                                in_shardings=(replicated, in_sharding),
                                out_shardings=(out_sharding, batch_only))
        self._variables = jax.device_put(synthesis.variables, replicated)

    def process_batch(self, left_batch, return_right: bool = False):
        """(N, 3, H, W) 0..255 left views -> (N, H, W) float32 disparities
        (plus the synthesized right views when ``return_right``).
        N must be a multiple of :attr:`batch_group`."""
        left = jnp.asarray(left_batch, jnp.float32)
        if left.shape[0] % self.batch_group:
            raise ValueError(f"batch {left.shape[0]} not divisible by the "
                             f"data x disp mesh extent {self.batch_group}")
        left = jax.device_put(left, self._in_sharding)
        disparity, right = self._forward(self._variables, left)
        return (disparity, right) if return_right else disparity

    def warmup(self) -> None:
        x = jnp.zeros((self.batch_group, 3, self.config.height,
                       self.config.width), jnp.float32)
        jax.block_until_ready(self.process_batch(x))
