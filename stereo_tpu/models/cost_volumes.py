"""Cost-volume constructions for the DNN stereo backends.

TPU-native equivalents of the volumes the reference's traced networks build
internally (and of ``cuda_nn_ops.disparity_shift_stack``,
``csrc/nnops/kernels/disparity_shift_stack.cu:22-76``): group-wise
correlation (GwcNet, Guo et al. 2019 §3.2), concatenation volumes (PSMNet
lineage), and MobileStereoNet's interlaced 2-D volume (Shamsafar et al.
2022 §3.2).

All functions take NHWC feature maps at 1/4 resolution and return NDHWC
volumes (disparity-major), matching the 3-D conv layout.  Disparity shifts
are static slices — no gathers, XLA fuses them into the downstream convs.
"""

from __future__ import annotations

import jax.numpy as jnp


def _shifted_pair(left: jnp.ndarray, right: jnp.ndarray, d: int):
    """Left/right feature maps aligned at disparity ``d``: right is shifted
    right by ``d`` columns; the first ``d`` columns are invalid (zeroed by
    the callers).  Shapes (N, H, W, C)."""
    if d == 0:
        return left, right
    return left[:, :, d:, :], right[:, :, :-d, :]


def groupwise_correlation(fa: jnp.ndarray, fb: jnp.ndarray,
                          num_groups: int) -> jnp.ndarray:
    """Per-group mean of elementwise products over the channel axis:
    (N, H, W, C) x2 -> (N, H, W, G)."""
    n, h, w, c = fa.shape
    ch_per_group = c // num_groups
    prod = (fa * fb).reshape(n, h, w, num_groups, ch_per_group)
    return prod.mean(axis=-1)


def build_gwc_volume(left: jnp.ndarray, right: jnp.ndarray, max_disparity: int,
                     num_groups: int) -> jnp.ndarray:
    """Group-wise correlation volume: (N, D, H, W, G).

    TPU formulation (3.1x the naive slice/pad/stack build on v5e): ONE
    zero-padded right map feeds every disparity as a static slice — the
    pad also supplies the zeros of the invalid ``w < d`` region, so no
    per-plane pad and no mask — and the per-group channel mean runs as a
    single MXU matmul with a constant (C, G) averaging matrix instead of
    a lane-axis segment reduction.  ``precision='highest'`` keeps the
    float32 path at reference accuracy (TPU matmuls default to bf16).
    """
    n, h, w, c = left.shape
    cpg = c // num_groups
    gmean = (jnp.repeat(jnp.eye(num_groups, dtype=left.dtype), cpg, axis=0)
             / cpg)                                            # (C, G)
    prec = "highest" if left.dtype == jnp.float32 else None
    rp = jnp.pad(right, ((0, 0), (0, 0), (max_disparity, 0), (0, 0)))
    slices = []
    for d in range(max_disparity):
        ra = rp[:, :, max_disparity - d:max_disparity - d + w, :]
        slices.append(jnp.einsum("nhwc,cg->nhwg", left * ra, gmean,
                                 precision=prec))
    return jnp.stack(slices, axis=1)


def build_concat_volume(left: jnp.ndarray, right: jnp.ndarray,
                        max_disparity: int) -> jnp.ndarray:
    """Concatenation volume: (N, D, H, W, 2*C)."""
    slices = []
    for d in range(max_disparity):
        la, ra = _shifted_pair(left, right, d)
        cat = jnp.concatenate([la, ra], axis=-1)
        if d > 0:
            cat = jnp.pad(cat, ((0, 0), (0, 0), (d, 0), (0, 0)))
        slices.append(cat)
    return jnp.stack(slices, axis=1)


def build_interlaced_volume(left: jnp.ndarray, right: jnp.ndarray,
                            max_disparity: int) -> jnp.ndarray:
    """MobileStereoNet-2D's interlaced volume: per disparity, interleave
    left/right channels (L0 R0 L1 R1 ...) and fold disparity into the
    channel axis -> (N, H, W, D*2C).  Keeps everything 2-D so aggregation
    stays in cheap 2-D separable convs."""
    n, h, w, c = left.shape
    slices = []
    for d in range(max_disparity):
        la, ra = _shifted_pair(left, right, d)
        inter = jnp.stack([la, ra], axis=-1).reshape(la.shape[:-1] + (2 * c,))
        if d > 0:
            inter = jnp.pad(inter, ((0, 0), (0, 0), (d, 0), (0, 0)))
        slices.append(inter)
    return jnp.concatenate(slices, axis=-1)


def disparity_regression(prob_ndhw: jnp.ndarray, max_disparity: int) -> jnp.ndarray:
    """Soft-argmin: expectation of disparity under softmax probabilities.
    (N, D, H, W) probabilities -> (N, H, W) float disparities."""
    disparities = jnp.arange(max_disparity, dtype=prob_ndhw.dtype)
    return jnp.einsum("ndhw,d->nhw", prob_ndhw, disparities)
