"""Image-space primitives: grayscale, mean-pool, gradient, view rescale.

TPU-native equivalents of the reference's ``cuda_imageops`` /
``cuda_synthesis`` CUDA kernels.  All functions are pure, jit-safe, and
operate on float32 arrays in 0..255 range (CHW for color) unless noted.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

# ITU-R 601 luma weights (csrc/imageops/kernels/rgb_to_grayscale.cu:24-28).
_R, _G, _B = 0.2989, 0.5870, 0.1140


def rgb_to_grayscale(image_chw: jnp.ndarray) -> jnp.ndarray:
    """(3, H, W) float -> (H, W) float luma.

    Sums in the reference's association order ``(R + G) + B`` so results are
    bit-identical to the CUDA kernel for integer-valued inputs.
    """
    r = _R * image_chw[0]
    g = _G * image_chw[1]
    b = _B * image_chw[2]
    return (r + g) + b


def mean_pool(image: jnp.ndarray, k: int) -> jnp.ndarray:
    """k x k mean pooling with ceil-div output dims
    (``csrc/imageops/kernels/mean_pool.cu:25-48``).

    The reference reads out of bounds for dims not divisible by ``k`` (UB);
    we edge-replicate instead (deviation only affects non-divisible shapes,
    which no shipped dataset uses).
    """
    if k == 1:
        return image
    h, w = image.shape[-2:]
    oh, ow = -(-h // k), -(-w // k)
    ph, pw = oh * k - h, ow * k - w
    if ph or pw:
        pad = [(0, 0)] * (image.ndim - 2) + [(0, ph), (0, pw)]
        image = jnp.pad(image, pad, mode="edge")
    # Splitting the minor (lane) axis W -> (W/k, k) with reshape+mean forces
    # a cross-lane data shuffle measured ~8x slower than this formulation on
    # TPU (scripts/profile_pool.py); ``lax.reduce_window`` is as fast but its
    # accumulation order is platform-dependent (CPU vs TPU goldens diverge).
    # Explicit binary adds over a sublane-axis reshape (cheap) and
    # single-axis lane-strided slices keep the arithmetic order fixed in the
    # HLO itself, so CPU and TPU produce bit-identical pools.
    h2, w2 = image.shape[-2:]
    lead = image.shape[:-2]
    rows = image.reshape(lead + (oh, k, w2))
    racc = rows[..., 0, :]
    for i in range(1, k):
        racc = racc + rows[..., i, :]
    acc = racc[..., 0::k]
    for j in range(1, k):
        acc = acc + racc[..., j::k]
    return acc / float(k * k)


def grayscale_gradient(image_hw: jnp.ndarray) -> jnp.ndarray:
    """Sobel gradient magnitude (``csrc/imageops/grayscale_gradient.cc:8-20``):
    two 3x3 convs (zero 'same' padding) + sqrt(gx^2 + gy^2)."""
    kx = jnp.array([[1.0, 0.0, -1.0], [2.0, 0.0, -2.0], [1.0, 0.0, -1.0]],
                   dtype=image_hw.dtype)
    ky = kx.T
    img = image_hw[None, None]

    def conv(kernel):
        return lax.conv_general_dilated(
            img, kernel[None, None], window_strides=(1, 1), padding="SAME"
        )[0, 0]

    gx, gy = conv(kx), conv(ky)
    return jnp.sqrt(gx * gx + gy * gy)


def rescale_generated_view(view_chw: jnp.ndarray) -> jnp.ndarray:
    """Map a 0..1 synthesized view to 0..255 with round-half-up clamping
    (``csrc/synthesis/kernels/rescale_generated_view.cu:17-18``)."""
    return jnp.clip(view_chw * 255.0 + 0.5, 0.0, 255.0)
