"""Fused single-view engine: the headline scenario in TWO executables.

The reference's headline path (``api.py:25-31``) is one left view in,
disparity out: Deep3D right-view synthesis followed by the classical
matcher.  Composed naively on the TPU that is THREE dispatches per frame —
the pure-XLA Deep3D net, the Pallas blend tail, the Pallas matcher (the net
must stay Mosaic-free to keep XLA's latency hiding; see
``synthesis/right_view_synthesis.py``).  The tail and the matcher are both
Pallas-bearing, so merging THEM costs no latency-hiding and drops one
dispatch plus one HBM round-trip of the synthesized view.

Measured on v5e (dispatch-slope protocol, ``scripts/exp_chain_merge.py``,
384x1280/D=64): the 3-executable chain runs 124-240 FPS with wild
run-to-run variance (per-dispatch scheduling through the tunnel runtime);
the merged 2-executable chain runs 230-240 FPS and is stable across every
repeat.  The merged executable returns BOTH the disparity and the
synthesized right view — a second output is free (no extra dispatch), and
the pipeline contract includes the right image.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core.config import MatchingConfig
from ..matching.classical import compute_disparity_map
from ..synthesis.right_view_synthesis import (fused_blend_tail,
                                              synthesize_net_batch)


def _tail_and_match(prob_low, full01, left_nchw, *, scale, output_shape,
                    full_shape, config: MatchingConfig):
    """The merged second executable: Pallas blend tail + Pallas matcher.

    ``prob_low``/``full01`` come from ``synthesize_net_batch``; ``left_nchw``
    is the raw (N, 3, H, W) 0..255 input (the matcher consumes the ORIGINAL
    left view, not the resized/normalized one — parity with the reference's
    ``depth_estimation_pipeline.py:55-66`` composition).  Returns
    ``(disparity (N, H, W), right (N, 3, H, W))``.
    """
    right = fused_blend_tail(prob_low, full01, scale=scale,
                             output_shape=output_shape,
                             full_shape=full_shape)

    def one(args):
        left, r = args
        return compute_disparity_map(left, r, config)

    if left_nchw.shape[0] == 1:
        disparity = compute_disparity_map(left_nchw[0], right[0], config)[None]
    else:
        disparity = jax.lax.map(one, (left_nchw, right))
    return disparity, right


class FusedSingleViewEngine:
    """Owns the two jitted executables for the single-view classical path.

    ``synthesis`` is a constructed ``RightViewSynthesis`` (provides the
    Deep3D variables, shapes, and compute dtype); ``config`` is the
    matcher's :class:`MatchingConfig` at the pipeline's image shape.
    """

    def __init__(self, config: MatchingConfig, synthesis):
        self.config = config
        self.synthesis = synthesis
        self._fn_net = jax.jit(functools.partial(
            synthesize_net_batch, synthesis.model,
            full_shape=synthesis.model_full_shape,
            down_shape=synthesis.model_down_shape,
            compute_dtype=synthesis.compute_dtype))
        self._fn_tail_match = jax.jit(functools.partial(
            _tail_and_match, scale=synthesis.model.prob_volume_scale,
            output_shape=(config.height, config.width),
            full_shape=synthesis.model_full_shape, config=config))

    def process(self, left_image):
        """(3, H, W) 0..255 -> ``(disparity (H, W), right (3, H, W))``."""
        left = jnp.asarray(left_image, jnp.float32)[None]
        disparity, right = self.process_batch(left)
        return disparity[0], right[0]

    def process_batch(self, left_batch):
        """(N, 3, H, W) -> ``(disparity (N, H, W), right (N, 3, H, W))``."""
        left = jnp.asarray(left_batch, jnp.float32)
        prob_low, full01 = self._fn_net(self.synthesis.variables, left)
        return self._fn_tail_match(prob_low, full01, left)

    def warmup(self) -> None:
        x = jnp.zeros((1, 3, self.config.height, self.config.width),
                      jnp.float32)
        jax.block_until_ready(self.process_batch(x))
