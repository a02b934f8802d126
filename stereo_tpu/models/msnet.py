"""MobileStereoNet — MSNet2D and MSNet3D (Shamsafar et al., WACV 2022).

The reference consumes these only as opaque TorchScript traces
(``pipeline/depth/dnn_stereo_matching_backend.py:7-13``); these are native
Flax implementations built from the paper:

* a MobileNetV2-style siamese feature extractor (inverted-residual
  bottlenecks mirroring the GwcNet layer layout) -> 1/4-res, 320 channels;
* **MSNet2D**: the *interlaced* cost volume — per disparity, left/right
  channels are interleaved and encoded by a shared separable-conv head to a
  single score channel, folding disparity into the channel axis so all
  aggregation stays in cheap 2-D (depthwise-separable) convolutions;
* **MSNet3D**: a concatenation volume aggregated by 3-D inverted-residual
  bottlenecks (depthwise-separable 3-D convs) in an hourglass;
* both: soft-argmin regression from the trilinearly-upsampled volume.

Layout NHWC/NDHWC internally; public API takes NCHW like the pipeline.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from .cost_volumes import (build_concat_volume, disparity_regression,
                           upsampled_soft_argmin)
from .layers import (Conv3dMXU, ConvBnAct, DeconvBn, MobileV2Block2D,
                     MobileV2Block3D, SeparableConvBn2D, nchw_to_nhwc,
                     upsample_trilinear)


class MobileFeatureExtractor(nn.Module):
    """Siamese MobileNetV2-style extractor -> (N, H/4, W/4, 320)."""

    base_channels: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.base_channels
        x = ConvBnAct(c, (3, 3), 2)(x, train)                 # 1/2
        x = SeparableConvBn2D(c)(x, train)
        for _ in range(3):
            x = MobileV2Block2D(c)(x, train)
        x = MobileV2Block2D(2 * c, strides=2)(x, train)       # 1/4
        for _ in range(5):
            x = MobileV2Block2D(2 * c)(x, train)
        l2 = x
        for _ in range(3):
            x = MobileV2Block2D(4 * c)(x, train)
        l3 = x
        for _ in range(3):
            x = MobileV2Block2D(4 * c, dilation=2)(x, train)
        l4 = x
        return jnp.concatenate([l2, l3, l4], axis=-1)         # 320 ch


class FeatureCompressor(nn.Module):
    """320 -> 32 channel compression before volume construction."""

    out_channels: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBnAct(128, (3, 3))(x, train)
        x = ConvBnAct(64, (1, 1))(x, train)
        return nn.Conv(self.out_channels, (1, 1), use_bias=True)(x)


class InterlacedVolume2D(nn.Module):
    """MSNet2D cost volume: for every disparity, interleave the aligned
    left/right channels (L0 R0 L1 R1 ...) and encode with a *shared*
    separable-conv head to one score channel -> (N, H, W, D)."""

    max_disparity: int

    @nn.compact
    def __call__(self, left, right, train: bool = False):
        # Shared encoder modules (declared once, applied per disparity).
        enc1 = SeparableConvBn2D(16)
        enc2 = SeparableConvBn2D(8)
        enc3 = nn.Conv(1, (3, 3), padding="SAME", use_bias=True)

        c = left.shape[-1]
        slices = []
        for d in range(self.max_disparity):
            if d == 0:
                la, ra = left, right
            else:
                la, ra = left[:, :, d:, :], right[:, :, :-d, :]
            inter = jnp.stack([la, ra], axis=-1).reshape(la.shape[:-1] + (2 * c,))
            s = enc1(inter, train)
            s = enc2(s, train)
            s = enc3(s)
            if d > 0:
                s = jnp.pad(s, ((0, 0), (0, 0), (d, 0), (0, 0)))
            slices.append(s[..., 0])
        return jnp.stack(slices, axis=-1)                     # (N, H, W, D)


class Hourglass2D(nn.Module):
    """2-D encoder-decoder over the disparity-as-channels volume."""

    channels: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.channels
        c1 = SeparableConvBn2D(2 * c, strides=2)(x, train)
        c2 = SeparableConvBn2D(2 * c, act=False)(c1, train)
        c3 = SeparableConvBn2D(4 * c, strides=2)(nn.relu(c2), train)
        c4 = SeparableConvBn2D(4 * c)(c3, train)
        up1 = DeconvBn(2 * c, (4, 4), (2, 2))(c4, train)
        up1 = nn.relu(up1 + c2)
        up2 = DeconvBn(c, (4, 4), (2, 2))(up1, train)
        return nn.relu(up2 + x)


class MSNet2D(nn.Module):
    """2-D MobileStereoNet.  NCHW in, (N, H, W) disparities out; with
    ``train=True`` returns three auxiliary regressions."""

    max_disparity: int = 192

    @nn.compact
    def __call__(self, left_nchw, right_nchw, train: bool = False):
        n, _, height, width = left_nchw.shape
        d4 = self.max_disparity // 4
        # single stacked application of the siamese extractor (see gwcnet.py)
        features = MobileFeatureExtractor()
        compress = FeatureCompressor()
        stacked = jnp.concatenate([nchw_to_nhwc(left_nchw),
                                   nchw_to_nhwc(right_nchw)], axis=0)
        both = compress(features(stacked, train), train)
        fl, fr = both[:n], both[n:]

        volume = InterlacedVolume2D(d4)(fl, fr, train)        # (N, H4, W4, D4)
        x = SeparableConvBn2D(d4)(volume, train)
        x = SeparableConvBn2D(d4)(x, train)
        x = x + volume

        outputs = []
        for i in range(3):
            x = Hourglass2D(d4)(x, train)
            if train or i == 2:
                head = SeparableConvBn2D(d4, name=f"head{i}")(x, train)
                logits = nn.Conv(d4, (3, 3), padding="SAME",
                                 name=f"classif{i}")(head)
                outputs.append(logits)

        def regress(logits_nhwd):
            vol = jnp.transpose(logits_nhwd, (0, 3, 1, 2))[..., None]
            if not train:
                return upsampled_soft_argmin(
                    vol, (self.max_disparity, height, width))
            full = upsample_trilinear(vol, (self.max_disparity, height, width))
            prob = nn.softmax(full[..., 0], axis=1)
            return disparity_regression(prob, self.max_disparity)

        if train:
            return tuple(regress(o) for o in outputs)
        return regress(outputs[-1])


class Hourglass3DSeparable(nn.Module):
    """3-D hourglass built from inverted-residual separable 3-D convs."""

    channels: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.channels
        c1 = MobileV2Block3D(2 * c, strides=2)(x, train)
        c2 = MobileV2Block3D(2 * c)(c1, train)
        c3 = MobileV2Block3D(4 * c, strides=2)(c2, train)
        c4 = MobileV2Block3D(4 * c)(c3, train)
        up1 = DeconvBn(2 * c, (4, 4, 4), (2, 2, 2))(c4, train)
        up1 = nn.relu(up1 + c2)
        up2 = DeconvBn(c, (4, 4, 4), (2, 2, 2))(up1, train)
        return nn.relu(up2 + x)


class MSNet3D(nn.Module):
    """3-D MobileStereoNet: concat volume + separable 3-D aggregation."""

    max_disparity: int = 192

    @nn.compact
    def __call__(self, left_nchw, right_nchw, train: bool = False):
        n, _, height, width = left_nchw.shape
        d4 = self.max_disparity // 4
        # single stacked application of the siamese extractor (see gwcnet.py)
        features = MobileFeatureExtractor()
        compress = FeatureCompressor()
        stacked = jnp.concatenate([nchw_to_nhwc(left_nchw),
                                   nchw_to_nhwc(right_nchw)], axis=0)
        both = compress(features(stacked, train), train)
        fl, fr = both[:n], both[n:]

        volume = build_concat_volume(fl, fr, d4)              # (N,D4,H4,W4,64)
        x = ConvBnAct(32, (3, 3, 3))(volume, train)
        x = MobileV2Block3D(32)(x, train)

        outputs = []
        for i in range(3):
            x = Hourglass3DSeparable(32)(x, train)
            if train or i == 2:
                head = MobileV2Block3D(32, name=f"head{i}")(x, train)
                logits = Conv3dMXU(1, (3, 3, 3), use_bias=True,
                                   name=f"classif{i}")(head)
                outputs.append(logits)

        def regress(logits_ndhwc):
            if not train:
                return upsampled_soft_argmin(
                    logits_ndhwc, (self.max_disparity, height, width))
            full = upsample_trilinear(logits_ndhwc,
                                      (self.max_disparity, height, width))
            prob = nn.softmax(full[..., 0], axis=1)
            return disparity_regression(prob, self.max_disparity)

        if train:
            return tuple(regress(o) for o in outputs)
        return regress(outputs[-1])


MSNET_LOSS_WEIGHTS: Tuple[float, ...] = (0.5, 0.7, 1.0)


def msnet_loss(outputs, gt_disparity, mask):
    """Smooth-L1 multi-output loss over the three hourglass outputs."""
    import optax

    m = mask.astype(jnp.float32)
    denom = jnp.maximum(m.sum(), 1.0)
    total = 0.0
    for w, out in zip(MSNET_LOSS_WEIGHTS, outputs):
        err = optax.huber_loss(out, gt_disparity, delta=1.0)
        total = total + w * (err * m).sum() / denom
    return total
