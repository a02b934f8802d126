"""Deep3D — right-view synthesis network (Xie et al. 2016 lineage).

Native Flax re-implementation of the reference's trainable PyTorch model
(``pipeline/synthesis/deep3d.py:186-215``): a VGG16 encoder over the
4x-downscaled left view, per-pool-stage deconvolution branches each
predicting a 65-channel disparity distribution at 1/2 of the downscaled
resolution, a fully-connected global branch (15360 -> 4096 -> 1950 ->
(65, 3, 10) -> deconv), branch summation, a softmax upconvolution, bilinear
x4 to full resolution, and the differentiable 65-way shifted-view blend
producing the synthesized right view.

Differences from the reference (documented, behavior-preserving):
* torchvision's pretrained VGG16 is unavailable — the encoder is the same
  architecture initialized fresh (He-normal), trained end-to-end;
* the shifted-view blend never materializes the (N, 65, 3, H, W) stack
  (``ops.weighted_shift_sum``), saving ~65x activation memory;
* layout is NHWC internally (TPU-friendly); the public API is NCHW.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.shift_stack import weighted_shift_sum
from .layers import Deconv2dParityMXU, nchw_to_nhwc

NUM_DISPARITY_CHANNELS = 65


def _fused_blend_eligible(full_shape, scale: int) -> bool:
    """The fused Pallas upsample+blend needs a TPU backend, a legal row
    tile, and scale-divisible dims."""
    import jax as _jax

    if _jax.default_backend() != "tpu":
        return False
    from ..ops.pallas.blend import pick_row_tile

    h, w = int(full_shape[-2]), int(full_shape[-1])
    return (h % scale == 0 and w % scale == 0
            and pick_row_tile(h, scale) is not None)

# VGG16 convolutional configuration, split at MaxPool boundaries (the
# reference splits torchvision's vgg16.features the same way,
# ``helpers/torch_helpers.py:47-57``).
VGG16_BLOCKS: Tuple[Tuple[int, ...], ...] = (
    (64, 64), (128, 128), (256, 256, 256), (512, 512, 512), (512, 512, 512))


class VggBlock(nn.Module):
    """N 3x3 conv+ReLU layers followed by a 2x2 max pool."""

    channels: Sequence[int]

    @nn.compact
    def __call__(self, x):
        for ch in self.channels:
            x = nn.Conv(ch, (3, 3), padding="SAME",
                        kernel_init=nn.initializers.he_normal())(x)
            x = nn.relu(x)
        return nn.max_pool(x, (2, 2), strides=(2, 2))


class DeconvBranch(nn.Module):
    """Per-stage disparity branch (reference ``DeconvBlock``,
    ``deep3d.py:11-30``): conv3x3 -> relu -> conv3x3 -> relu -> transposed
    conv to 65 channels upsampling by ``scale``."""

    filters: int
    scale: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.filters, (3, 3), padding="SAME",
                    kernel_init=nn.initializers.he_normal())(x)
        x = nn.relu(x)
        x = nn.Conv(self.filters, (3, 3), padding="SAME",
                    kernel_init=nn.initializers.he_normal())(x)
        x = nn.relu(x)
        if self.scale == 1:
            return nn.Conv(NUM_DISPARITY_CHANNELS, (1, 1))(x)
        # parity-class deconv: skips the input-dilated lowering's
        # structural-zero MACs ((2s)^2 taps of which only 4 are live)
        return Deconv2dParityMXU(NUM_DISPARITY_CHANNELS, self.scale,
                                 name="ConvTranspose_0")(x)


class FeedForwardBranch(nn.Module):
    """Global branch (reference ``FeedForwardBlock`` + ``disparity_deconv``,
    ``deep3d.py:102-117,149-150``): fc 15360 -> 4096 -> dropout -> 1950,
    reshaped to a (3, 10, 65) map and deconvolved x16.

    ``dense_dtype=bfloat16`` (inference) runs the two fc matmuls in bf16 —
    the 15360x4096 kernel is 252 MB in fp32 and its HBM read dominates the
    branch (measured 0.59 ms fp32-resident vs 0.20 ms bf16-resident on
    v5e).  The bf16 compute dtype is what makes the bf16 weight read
    stick: a bf16-STORED kernel consumed by an fp32 matmul makes XLA
    materialize the 252 MB widening convert instead (measured 1.6x SLOWER
    end-to-end).  The branch output is cast back to fp32 before summation.
    ``None`` (training / exact-fp32) keeps everything fp32."""

    hidden_dim: int = 4096
    grid: Tuple[int, int] = (3, 10)
    dense_dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x_nhwc, train: bool = False):
        n = x_nhwc.shape[0]
        x = x_nhwc.reshape(n, -1)
        x = nn.Dense(self.hidden_dim, dtype=self.dense_dtype,
                     kernel_init=nn.initializers.normal(0.01))(x)
        x = nn.relu(x)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        gh, gw = self.grid
        x = nn.Dense(gh * gw * NUM_DISPARITY_CHANNELS, dtype=self.dense_dtype,
                     kernel_init=nn.initializers.normal(0.01))(x)
        x = x.astype(x_nhwc.dtype)
        x = x.reshape(n, gh, gw, NUM_DISPARITY_CHANNELS)
        return Deconv2dParityMXU(NUM_DISPARITY_CHANNELS, 16,
                                 name="ConvTranspose_0")(x)


class DisparityUpconvSoftmax(nn.Module):
    """Final head (reference ``deep3d.py:85-99``): deconv x2 -> relu ->
    conv3x3 -> softmax over the 65 disparity channels.

    ``n_upconvs > 1`` (experimental, non-parity) stacks extra x2 deconv
    stages so the softmax volume is computed at higher resolution — used by
    the half-res probability-volume ablation (PARITY.md)."""

    n_upconvs: int = 1

    @nn.compact
    def __call__(self, x):
        for i in range(self.n_upconvs):
            x = Deconv2dParityMXU(NUM_DISPARITY_CHANNELS, 2,
                                  name=f"ConvTranspose_{i}")(x)
            x = nn.relu(x)
        x = nn.Conv(NUM_DISPARITY_CHANNELS, (3, 3), padding="SAME",
                    kernel_init=nn.initializers.he_normal())(x)
        return nn.softmax(x, axis=-1)


class DisparityEstimationNetwork(nn.Module):
    """Downscaled left view -> (N, 65, H*, W*) disparity probabilities at
    4x the downscaled resolution (reference ``deep3d.py:120-159``).

    ``prob_volume_scale`` is the bilinear upsample factor applied to the
    softmax volume: 4 (reference parity — the volume is computed at 1/4 of
    the FULL input resolution and resized x4, ``deep3d.py:155``) or 2
    (ablation: one extra learned x2 deconv stage computes the volume at 1/2
    full resolution, halving the resize factor)."""

    deconv_filters: Sequence[int] = (64, 128, 256, 512, 512)
    prob_volume_scale: int = 4
    ff_dense_dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, left_down_nhwc, train: bool = False,
                 upsample: bool = True):
        """``upsample=False`` returns the softmax volume at its computed
        resolution (full / prob_volume_scale) — consumed by the fused
        Pallas upsample+blend on the inference path."""
        if self.prob_volume_scale not in (2, 4):
            raise ValueError("prob_volume_scale must be 2 or 4")
        predictions = []
        features = left_down_nhwc
        scale = 1
        for idx, block_channels in enumerate(VGG16_BLOCKS):
            scale = scale if idx == 0 else scale * 2
            features = VggBlock(block_channels)(features)
            predictions.append(
                DeconvBranch(self.deconv_filters[idx], scale)(features))
        # Grid = post-VGG spatial shape; (3, 10) at the native 96x320 input,
        # giving the reference's fc dims 15360 -> 4096 -> 1950.
        predictions.append(FeedForwardBranch(
            grid=(features.shape[1], features.shape[2]),
            dense_dtype=self.ff_dense_dtype)(features, train))
        summed = sum(predictions)
        n_upconvs = 1 + (self.prob_volume_scale == 2)
        prob = DisparityUpconvSoftmax(n_upconvs)(summed)
        if not upsample:
            return prob
        n, h, w, c = prob.shape
        s = self.prob_volume_scale
        prob = jax.image.resize(prob, (n, s * h, s * w, c), method="bilinear")
        return prob


class Deep3D(nn.Module):
    """Full model: ``(left_full, left_down)`` (NCHW, 0..1) -> synthesized
    right view (NCHW, 0..1).  ``left_down`` must be 1/4 the full resolution
    with dims divisible by 32 (the VGG stride).

    setup()-based (not ``@nn.compact``) so every public method can share
    the single submodule; the explicit ``name`` keeps the parameter tree
    identical to the original compact auto-naming (the committed
    checkpoints use it)."""

    deconv_filters: Sequence[int] = (64, 128, 256, 512, 512)
    prob_volume_scale: int = 4
    # bf16 fc matmuls for the FeedForward branch (inference wrapper sets
    # this; see FeedForwardBranch.dense_dtype).  None = exact fp32.
    ff_dense_dtype: Optional[Any] = None

    def setup(self):
        self.disparity_network = DisparityEstimationNetwork(
            self.deconv_filters, self.prob_volume_scale,
            self.ff_dense_dtype, name="DisparityEstimationNetwork_0")

    def __call__(self, left_full_nchw, left_down_nchw, train: bool = False):
        if not train and _fused_blend_eligible(left_full_nchw.shape,
                                               self.prob_volume_scale):
            # Inference on TPU: the volume's bilinear upsample and the
            # 65-way blend run fused in Pallas — the (D, H, W) full-res
            # volume (127 MB at 384x1280) never exists in HBM.  Matches the
            # explicit composition below to float rounding (tested).
            # Training keeps the explicit path (the fused kernel defines no
            # VJP, and the losses consume the full-res volume anyway).
            from ..ops.pallas.blend import upsample_blend

            prob_low = self.prob_volume_low(left_down_nchw, train)
            return upsample_blend(prob_low, left_full_nchw,
                                  self.prob_volume_scale)
        return self.synthesize_with_probabilities(
            left_full_nchw, left_down_nchw, train)[0]

    def prob_volume_low(self, left_down_nchw, train: bool = False):
        """Softmax disparity volume at its COMPUTED resolution, (N, 65,
        full_h / prob_volume_scale, full_w / prob_volume_scale) NCHW.

        This is the hand-off point for split-executable inference: a module
        containing any Mosaic (Pallas) custom call loses XLA's latency
        hiding for every co-compiled op on TPU (measured: this pure-XLA
        network runs 1.6 ms alone vs 2.8 ms co-compiled with even a trivial
        8x128 Pallas copy kernel, flat in the number of calls), so the
        inference wrapper runs the network and the fused Pallas blend as
        two executables chained on-device."""
        prob = self.disparity_network(nchw_to_nhwc(left_down_nchw), train,
                                      upsample=False)
        return jnp.transpose(prob, (0, 3, 1, 2))

    def disparity_probabilities(self, left_down_nchw, train: bool = False):
        """Expose the softmax disparity volume (for visualization)."""
        prob = self.disparity_network(nchw_to_nhwc(left_down_nchw), train)
        return jnp.transpose(prob, (0, 3, 1, 2))

    def synthesize_with_probabilities(self, left_full_nchw, left_down_nchw,
                                      train: bool = False):
        """One forward -> ``(right_view, prob (N, 65, H, W))``.  The
        probability volume is in RIGHT-frame coordinates (output pixel y
        blends ``left[y + d]``); its soft-argmax is the right-frame
        disparity map — used for auxiliary disparity supervision when exact
        GT exists (``train.synthetic``)."""
        prob = self.disparity_network(nchw_to_nhwc(left_down_nchw), train)
        prob_ndhw = jnp.transpose(prob, (0, 3, 1, 2))     # (N, 65, H, W)
        return weighted_shift_sum(prob_ndhw, left_full_nchw), prob_ndhw
