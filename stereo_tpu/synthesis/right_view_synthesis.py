"""Right-view synthesis: Deep3D inference wrapper.

Parity with the reference's ``pipeline/synthesis/right_view_synthesis.py``:
resizes any input to the model's native 384x1280 full / 96x320 downscaled
resolution, scales to 0..1, runs Deep3D, rescales to 0..255
(``csrc/synthesis/kernels/rescale_generated_view.cu:17-18`` semantics via
``ops.rescale_generated_view``), and warms up at construction
(``right_view_synthesis.py:34-40`` — here warmup == jit compilation).

The whole path — resize, normalize, Deep3D forward, 65-way blend, rescale,
resize back — compiles to jitted XLA graphs (the reference splits it across
Python, TorchScript, and a custom CUDA kernel).  On TPU the inference path
is TWO chained executables, not one: a module containing any Mosaic
(Pallas) custom call loses XLA's latency hiding for every co-compiled op
(measured on v5e: the pure-XLA Deep3D net runs 1.6 ms alone vs 2.8 ms when
co-compiled with even a trivial 8x128 Pallas copy kernel — a fixed ~1.2 ms
penalty, flat in the number of Pallas calls).  Splitting the XLA network
(``synthesize_net_batch``) from the fused Pallas upsample+blend tail
(``fused_blend_tail``) recovers that penalty: the chained pair measures
~4.35 ms/frame vs ~5.34 ms single-module on the e2e single-view path.
Training and non-TPU backends keep the one-graph ``synthesize_batch``.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..models import Deep3D
from ..ops.imageops import rescale_generated_view
from ..utils.paths import DEEP3D_CHECKPOINT_DIR

# Native Deep3D operating resolution (reference ``right_view_synthesis.py:27-31``).
RVS_FULL_SHAPE = (384, 1280)
RVS_DOWNSCALED_SHAPE = (96, 320)


def _resize_chw(image, shape_hw):
    c = image.shape[-3]
    batch = image.shape[:-3]
    return jax.image.resize(image, (*batch, c, *shape_hw), method="bilinear")


def synthesize_batch(model: Deep3D, variables, left_nchw: jnp.ndarray,
                     output_shape: Tuple[int, int],
                     full_shape: Tuple[int, int] = RVS_FULL_SHAPE,
                     down_shape: Tuple[int, int] = RVS_DOWNSCALED_SHAPE,
                     compute_dtype=jnp.float32) -> jnp.ndarray:
    """(N, 3, H, W) 0..255 left views -> (N, 3, *output_shape) 0..255
    synthesized right views.  Pure function; jitted by the wrapper.

    With ``compute_dtype=bfloat16`` the Deep3D forward (the VGG encoder and
    FF block dominate the FLOPs) runs in bf16 on the MXU; the synthesized
    view is cast back to f32 before the 0..255 rescale, so the error is
    bounded by bf16's ~3 decimal digits on a 0..1 image (≈1 gray level).
    """
    full = _resize_chw(left_nchw, full_shape) / 255.0
    down = _resize_chw(left_nchw, down_shape) / 255.0
    if compute_dtype != jnp.float32:
        cast = lambda t: (t.astype(compute_dtype)
                          if isinstance(t, jnp.ndarray) and
                          t.dtype == jnp.float32 else t)
        variables = jax.tree_util.tree_map(cast, variables)
        full = full.astype(compute_dtype)
        down = down.astype(compute_dtype)
    right = model.apply(variables, full, down, train=False)
    right = rescale_generated_view(right.astype(jnp.float32))
    if tuple(output_shape) != tuple(full_shape):
        right = _resize_chw(right, output_shape)
    return right


def synthesize_net_batch(model: Deep3D, variables, left_nchw: jnp.ndarray,
                         full_shape: Tuple[int, int] = RVS_FULL_SHAPE,
                         down_shape: Tuple[int, int] = RVS_DOWNSCALED_SHAPE,
                         compute_dtype=jnp.float32):
    """Pure-XLA half of split inference: (N, 3, H, W) 0..255 left views ->
    ``(prob_low, full01)`` — the softmax disparity volume at its computed
    resolution (N, 65, fh/s, fw/s) and the normalized full-res view
    (N, 3, fh, fw), both in ``compute_dtype``.  Contains no Pallas call,
    so the VGG/FF network keeps XLA's latency-hiding schedule (see module
    docstring)."""
    full = _resize_chw(left_nchw, full_shape) / 255.0
    down = _resize_chw(left_nchw, down_shape) / 255.0
    if compute_dtype != jnp.float32:
        cast = lambda t: (t.astype(compute_dtype)
                          if isinstance(t, jnp.ndarray) and
                          t.dtype == jnp.float32 else t)
        variables = jax.tree_util.tree_map(cast, variables)
        full = full.astype(compute_dtype)
        down = down.astype(compute_dtype)
    prob_low = model.apply(variables, down, train=False,
                           method=Deep3D.prob_volume_low)
    return prob_low, full


def fused_blend_tail(prob_low: jnp.ndarray, full01: jnp.ndarray, scale: int,
                     output_shape: Tuple[int, int],
                     full_shape: Tuple[int, int]) -> jnp.ndarray:
    """Pallas half of split inference: fused upsample+blend + 0..255
    rescale + output resize.  ``fused_blend_tail(*synthesize_net_batch(...))``
    computes exactly what ``synthesize_batch`` computes on the TPU fused
    path — the executable boundary is the only difference (equivalence
    tested)."""
    from ..ops.pallas.blend import upsample_blend

    right = upsample_blend(prob_low, full01, scale)
    right = rescale_generated_view(right.astype(jnp.float32))
    if tuple(output_shape) != tuple(full_shape):
        right = _resize_chw(right, output_shape)
    return right


class RightViewSynthesis:
    """Stateful wrapper owning the Deep3D variables and the jitted graph."""

    def __init__(self, output_shape: Tuple[int, int] = RVS_FULL_SHAPE,
                 variables=None, checkpoint_dir: Optional[str] = None,
                 warmup: bool = False,
                 model_full_shape: Tuple[int, int] = RVS_FULL_SHAPE,
                 model_down_shape: Tuple[int, int] = RVS_DOWNSCALED_SHAPE,
                 compute_dtype: str = "float32",
                 ff_weights_dtype: str = "bfloat16"):
        self.output_shape = tuple(output_shape)
        self.compute_dtype = jnp.dtype(compute_dtype)
        self.ff_weights_dtype = jnp.dtype(ff_weights_dtype)
        self.model_full_shape = tuple(model_full_shape)
        self.model_down_shape = tuple(model_down_shape)
        self._ckpt_meta: dict = {}
        if variables is None:
            variables = self._load_checkpoint(checkpoint_dir)
        # Deep3D's FF block ties parameters to a training resolution, and
        # the ablation variant adds an upconv stage; a checkpoint recording
        # its native shapes / variant overrides the defaults (any camera
        # size still works — the wrapper resizes in and out).
        if self._ckpt_meta:
            if "full_shape" in self._ckpt_meta:
                self.model_full_shape = tuple(
                    int(v) for v in self._ckpt_meta["full_shape"])
            if "down_shape" in self._ckpt_meta:
                self.model_down_shape = tuple(
                    int(v) for v in self._ckpt_meta["down_shape"])
        self.model = Deep3D(
            prob_volume_scale=int(self._ckpt_meta.get("prob_volume_scale", 4)),
            ff_dense_dtype=(None if self.ff_weights_dtype == jnp.float32
                            else self.ff_weights_dtype))
        if variables is None:
            # Fresh (untrained) parameters — valid for shape/perf tests; the
            # trainer produces real ones (``stereo_tpu/train``).
            down = jnp.zeros((1, 3, *self.model_down_shape), jnp.float32)
            full = jnp.zeros((1, 3, *self.model_full_shape), jnp.float32)
            variables = self.model.init(jax.random.PRNGKey(0), full, down,
                                        train=False)
        self.variables = self._cast_ff_weights(variables)
        self._fn = jax.jit(functools.partial(
            synthesize_batch, self.model, output_shape=self.output_shape,
            full_shape=self.model_full_shape,
            down_shape=self.model_down_shape,
            compute_dtype=self.compute_dtype))
        # Split inference (TPU + fused-blend-eligible): the pure-XLA network
        # and the Pallas blend tail compile as separate executables so the
        # network keeps XLA's latency-hiding schedule (module docstring).
        from ..models.deep3d import _fused_blend_eligible
        self.split_inference = _fused_blend_eligible(
            (1, 3, *self.model_full_shape), self.model.prob_volume_scale)
        if self.split_inference:
            self._fn_net = jax.jit(functools.partial(
                synthesize_net_batch, self.model,
                full_shape=self.model_full_shape,
                down_shape=self.model_down_shape,
                compute_dtype=self.compute_dtype))
            self._fn_tail = jax.jit(functools.partial(
                fused_blend_tail, scale=self.model.prob_volume_scale,
                output_shape=self.output_shape,
                full_shape=self.model_full_shape))
        if warmup:
            self.warmup()

    def _cast_ff_weights(self, variables):
        """Store the FeedForward branch's Dense kernels in
        ``ff_weights_dtype`` (default bf16) for inference.

        The fc 15360->4096 kernel is 252 MB in fp32 and its HBM read
        dominates the branch: measured on v5e, the branch runs 0.59 ms with
        fp32-resident weights vs 0.20 ms with bf16-resident ones (XLA fuses
        the widening convert into the dot's operand load, so the matmul
        still accumulates in fp32).  The cast moves the synthesized view by
        well under one gray level (branch logits shift ~0.1% before the
        softmax); pass ``ff_weights_dtype='float32'`` for exact fp32
        weights.  Biases and every other branch stay untouched."""
        dtype = self.ff_weights_dtype
        if dtype == jnp.float32:
            return variables

        def maybe_cast(path, leaf):
            keys = [getattr(p, "key", None) for p in path]
            if ("FeedForwardBranch_0" in keys and keys[-1] == "kernel"
                    and any(k in ("Dense_0", "Dense_1") for k in keys)):
                return jnp.asarray(leaf, dtype)
            return leaf

        return jax.tree_util.tree_map_with_path(maybe_cast, variables)

    def process(self, left_image) -> jax.Array:
        """(3, H, W) 0..255 -> (3, *output_shape) 0..255."""
        left = jnp.asarray(left_image, jnp.float32)
        return self._synthesize(self.variables, left[None])[0]

    def process_batch(self, left_batch) -> jax.Array:
        return self._synthesize(self.variables,
                                jnp.asarray(left_batch, jnp.float32))

    def _synthesize(self, variables, left_nchw: jnp.ndarray) -> jax.Array:
        if self.split_inference:
            prob_low, full01 = self._fn_net(variables, left_nchw)
            return self._fn_tail(prob_low, full01)
        return self._fn(variables, left_nchw)

    def warmup(self) -> None:
        x = jnp.zeros((1, 3, 64, 64), jnp.float32)
        jax.block_until_ready(self._synthesize(self.variables, x))

    def _load_checkpoint(self, checkpoint_dir: Optional[str]):
        """Restore trained variables (npz or Orbax) or return None."""
        from ..models import load_npz_meta, load_params, load_params_npz

        self._ckpt_meta: dict = {}
        for cand in (checkpoint_dir, DEEP3D_CHECKPOINT_DIR):
            if not cand:
                continue
            npz = cand if (os.path.isfile(cand) and cand.endswith(".npz")) \
                else cand + ".npz"
            if os.path.isfile(npz):
                self._ckpt_meta = load_npz_meta(npz)
                return load_params_npz(npz)
            if os.path.isdir(cand) and os.listdir(cand):
                return load_params(cand)
            if cand is checkpoint_dir:
                # An EXPLICIT path must not silently fall back to the
                # default committed weights — a typo'd --rvs-checkpoint
                # would otherwise record ablation results measured on the
                # baseline model.
                raise FileNotFoundError(
                    f"RVS checkpoint not found: {checkpoint_dir!r} "
                    f"(no {npz} and no non-empty Orbax dir)")
        return None


def _main() -> None:
    """Smoke test: synthesize the right view for one image and save both
    (parity with the reference's inline ``__main__``,
    ``right_view_synthesis.py:43-53``)."""
    import argparse

    import numpy as np

    from ..utils.image_io import read_image_chw, write_image_chw

    parser = argparse.ArgumentParser()
    parser.add_argument("image", help="left view image path")
    parser.add_argument("--out-prefix", default="rvs_smoke")
    parser.add_argument("--checkpoint-dir", default=None)
    args = parser.parse_args()

    left = read_image_chw(args.image)
    rvs = RightViewSynthesis(checkpoint_dir=args.checkpoint_dir)
    right = np.asarray(rvs.process(left))
    write_image_chw(f"{args.out_prefix}_left.png", left)
    write_image_chw(f"{args.out_prefix}_right.png", right)
    print(f"Wrote {args.out_prefix}_left.png / {args.out_prefix}_right.png "
          f"({right.shape[2]}x{right.shape[1]})")


if __name__ == "__main__":
    _main()
