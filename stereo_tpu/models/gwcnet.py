"""GwcNet — Group-wise Correlation Stereo Network (Guo et al., CVPR 2019).

The reference consumes this network only as an opaque TorchScript trace
(``pipeline/depth/dnn_stereo_matching_backend.py:9-13``); this is a native
Flax implementation built from the paper: ResNet-like feature extraction
(1/4 resolution, 320-channel concat features), a 40-group group-wise
correlation volume, pre-hourglass 3-D convs, three stacked 3-D hourglasses
with skip connections, and soft-argmin disparity regression from the
trilinearly-upsampled volume.  ``use_concat_volume`` adds the GwcNet-gc
concatenation volume (12 compressed channels per side).

Layout is NDHWC/NHWC throughout (TPU MXU-friendly); the public ``__call__``
accepts NCHW to match the pipeline convention.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from .cost_volumes import (build_concat_volume, build_gwc_volume,
                           disparity_regression, upsampled_soft_argmin)
from .layers import (BasicResBlock, Conv3dMXU, ConvBnAct, DeconvBn,
                     nchw_to_nhwc, upsample_trilinear)


class GwcFeatureExtractor(nn.Module):
    """Shared-weight siamese feature extractor -> (N, H/4, W/4, 320)."""

    base_channels: int = 32
    layer2_blocks: int = 16

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.base_channels
        # conv0: three 3x3 convs, first one stride 2 (1/2 res)
        x = ConvBnAct(c, (3, 3), 2)(x, train)
        x = ConvBnAct(c, (3, 3), 1)(x, train)
        x = ConvBnAct(c, (3, 3), 1)(x, train)
        # layer1: 3 residual blocks at 1/2 res
        for _ in range(3):
            x = BasicResBlock(c)(x, train)
        # layer2: blocks at 1/4 res (first stride 2)
        x = BasicResBlock(2 * c, strides=2)(x, train)
        for _ in range(self.layer2_blocks - 1):
            x = BasicResBlock(2 * c)(x, train)
        l2 = x
        # layer3/layer4: dilated blocks, 1/4 res
        for _ in range(3):
            x = BasicResBlock(4 * c)(x, train)
        l3 = x
        for _ in range(3):
            x = BasicResBlock(4 * c, dilation=2)(x, train)
        l4 = x
        return jnp.concatenate([l2, l3, l4], axis=-1)  # 320 channels


class Hourglass3D(nn.Module):
    """3-D encoder-decoder with skip connections (GwcNet §3.3)."""

    channels: int  # bottom-level channel count (input/output channels)

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.channels
        c1 = ConvBnAct(2 * c, (3, 3, 3), 2)(x, train)
        c2 = ConvBnAct(2 * c, (3, 3, 3), 1, act=False)(c1, train)
        c3 = ConvBnAct(4 * c, (3, 3, 3), 2)(nn.relu(c2), train)
        c4 = ConvBnAct(4 * c, (3, 3, 3), 1)(c3, train)
        up1 = DeconvBn(2 * c, (4, 4, 4), (2, 2, 2))(c4, train)
        up1 = nn.relu(up1 + c2)
        up2 = DeconvBn(c, (4, 4, 4), (2, 2, 2))(up1, train)
        return nn.relu(up2 + x)


class Classifier3D(nn.Module):
    """Per-output head: conv-bn-relu then a single-channel 3-D conv."""

    channels: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBnAct(self.channels, (3, 3, 3))(x, train)
        return Conv3dMXU(1, (3, 3, 3), name="Conv_0")(x)


class GwcNet(nn.Module):
    """Full network.  ``__call__(left, right)`` with NCHW 0-centered inputs
    returns (N, H, W) disparities at full resolution; with ``train=True``
    returns the tuple of all four auxiliary regressions (loss weights
    0.5/0.5/0.7/1.0 per the paper)."""

    max_disparity: int = 192
    num_groups: int = 40
    use_concat_volume: bool = False
    concat_channels: int = 12
    layer2_blocks: int = 16

    @nn.compact
    def __call__(self, left_nchw, right_nchw, train: bool = False):
        n, _, height, width = left_nchw.shape
        d4 = self.max_disparity // 4
        left = nchw_to_nhwc(left_nchw)
        right = nchw_to_nhwc(right_nchw)

        # Siamese trick: one application over the stacked pair instead of
        # two weight-shared applications — halves the extractor's op count
        # (XLA compile time) and doubles its batch (better MXU utilization).
        features = GwcFeatureExtractor(layer2_blocks=self.layer2_blocks)
        both = features(jnp.concatenate([left, right], axis=0), train)
        fl, fr = both[:n], both[n:]

        volume = build_gwc_volume(fl, fr, d4, self.num_groups)
        if self.use_concat_volume:
            squeeze = nn.Sequential([
                nn.Conv(128, (3, 3), padding="SAME", use_bias=False),
                nn.relu,
                nn.Conv(self.concat_channels, (1, 1), use_bias=True),
            ])
            cl, cr = squeeze(fl), squeeze(fr)
            volume = jnp.concatenate(
                [volume, build_concat_volume(cl, cr, d4)], axis=-1)

        # pre-hourglass
        x = ConvBnAct(32, (3, 3, 3))(volume, train)
        x = ConvBnAct(32, (3, 3, 3))(x, train)
        r = ConvBnAct(32, (3, 3, 3))(x, train)
        r = ConvBnAct(32, (3, 3, 3), act=False)(r, train)
        x = x + r

        # Explicit names keep the param tree stable across train/eval (eval
        # only instantiates classif3).
        outputs = [Classifier3D(name="classif0")(x, train)] if train else []
        for i in range(3):
            x = Hourglass3D(32)(x, train)
            if train or i == 2:
                outputs.append(
                    Classifier3D(name=f"classif{i + 1}")(x, train))

        def regress(logits_ndhwc):
            if not train:
                # Streaming head: same math, but the (D, H, W) volume
                # (377 MB at the benched config) never exists in HBM — the
                # executable is at the HBM roof (results/bench/mfu_r05.json)
                # so the traffic cut is wall-clock (measured in
                # gwcnet_floor_r05.json's addendum).
                return upsampled_soft_argmin(
                    logits_ndhwc, (self.max_disparity, height, width))
            full = upsample_trilinear(logits_ndhwc,
                                      (self.max_disparity, height, width))
            prob = nn.softmax(full[..., 0], axis=1)      # (N, D, H, W)
            return disparity_regression(prob, self.max_disparity)

        if train:
            return tuple(regress(o) for o in outputs)
        return regress(outputs[-1])


GWCNET_LOSS_WEIGHTS: Tuple[float, ...] = (0.5, 0.5, 0.7, 1.0)


def gwcnet_loss(outputs, gt_disparity, mask):
    """Smooth-L1 multi-output loss (paper eq. 5); ``mask`` selects valid GT."""
    import optax

    weight_sum = 0.0
    total = 0.0
    m = mask.astype(jnp.float32)
    denom = jnp.maximum(m.sum(), 1.0)
    for w, out in zip(GWCNET_LOSS_WEIGHTS, outputs):
        err = optax.huber_loss(out, gt_disparity, delta=1.0)
        total = total + w * (err * m).sum() / denom
        weight_sum += w
    return total
