"""Shared Flax building blocks for the stereo model families.

Conventions (TPU-idiomatic):
* feature maps are NHWC, cost volumes are NDHWC — channels-last feeds the
  MXU/VPU tiling directly (the public API converts from the pipeline's CHW);
* BatchNorm state lives in the ``batch_stats`` collection (train loops pass
  ``mutable=["batch_stats"]``);
* all 2-D/3-D convolutions are ``flax.linen.Conv``/``ConvTranspose`` so XLA
  lowers them onto the MXU.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


def nchw_to_nhwc(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.transpose(x, (0, 2, 3, 1))


def nhwc_to_nchw(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.transpose(x, (0, 3, 1, 2))


class Conv3dMXU(nn.Module):
    """Drop-in for a bias-optional SAME ``nn.Conv`` over NDHWC volumes that
    routes through :func:`stereo_tpu.ops.conv3d.conv3d_mxu` — exact 2-D
    reformulations that fill the MXU's 128 output lanes (1.2-3.2x faster
    than the native 3-D conv at the 1-64 channel widths these networks
    use).  Parameter names/shapes match ``nn.Conv`` (``kernel`` of
    (kd, kh, kw, cin, cout), optional ``bias``), so checkpoints are
    interchangeable; instantiate with ``name="Conv_0"`` (or the original
    conv's name) to keep existing param trees loading unchanged.
    """

    features: int
    kernel: Tuple[int, int, int] = (3, 3, 3)
    stride: int = 1
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        from ..ops.conv3d import conv3d_mxu

        w = self.param("kernel", nn.initializers.lecun_normal(),
                       tuple(self.kernel) + (x.shape[-1], self.features))
        dtype = jnp.promote_types(x.dtype, w.dtype)
        out = conv3d_mxu(x.astype(dtype), w.astype(dtype), self.stride)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            out = out + b.astype(dtype)
        return out


class ConvBnAct(nn.Module):
    """Conv -> BatchNorm -> optional ReLU (2-D or 3-D by kernel rank)."""

    features: int
    kernel: Sequence[int] = (3, 3)
    strides: Sequence[int] | int = 1
    dilation: Sequence[int] | int = 1
    act: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        strides = ([self.strides] * len(self.kernel)
                   if isinstance(self.strides, int) else list(self.strides))
        dilation = ([self.dilation] * len(self.kernel)
                    if isinstance(self.dilation, int) else list(self.dilation))
        if (len(self.kernel) == 3 and len(set(strides)) == 1
                and strides[0] in (1, 2) and set(dilation) == {1}):
            # 3-D conv on the MXU-packed path (same params as nn.Conv)
            x = Conv3dMXU(self.features, tuple(self.kernel), strides[0],
                          name="Conv_0")(x)
        else:
            x = nn.Conv(self.features, tuple(self.kernel),
                        strides=tuple(strides),
                        kernel_dilation=tuple(dilation), padding="SAME",
                        use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        if self.act:
            x = nn.relu(x)
        return x


class BasicResBlock(nn.Module):
    """Two 3x3 conv-bn layers with an identity/projected skip (the GwcNet
    feature-extractor residual unit; Guo et al. 2019 §3.1)."""

    features: int
    strides: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = ConvBnAct(self.features, (3, 3), self.strides,
                        self.dilation)(x, train)
        out = ConvBnAct(self.features, (3, 3), 1, self.dilation,
                        act=False)(out, train)
        if identity.shape != out.shape:
            identity = nn.Conv(self.features, (1, 1),
                               strides=(self.strides, self.strides),
                               use_bias=False)(identity)
            identity = nn.BatchNorm(use_running_average=not train)(identity)
        return nn.relu(out + identity)


class SeparableConvBn2D(nn.Module):
    """Depthwise 3x3 + pointwise 1x1 (MobileStereoNet's 2-D separable conv,
    Shamsafar et al. 2022 §3)."""

    features: int
    strides: int = 1
    dilation: int = 1
    act: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        x = nn.Conv(in_ch, (3, 3), strides=(self.strides, self.strides),
                    kernel_dilation=(self.dilation, self.dilation),
                    feature_group_count=in_ch, padding="SAME",
                    use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        x = nn.relu(x)
        x = nn.Conv(self.features, (1, 1), use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        if self.act:
            x = nn.relu(x)
        return x


class MobileV2Block2D(nn.Module):
    """Inverted-residual bottleneck (MobileNetV2): expand 1x1 -> depthwise
    3x3 -> project 1x1, residual when stride 1 and shapes match."""

    features: int
    strides: int = 1
    expansion: int = 2
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        hidden = in_ch * self.expansion
        out = nn.Conv(hidden, (1, 1), use_bias=False)(x)
        out = nn.BatchNorm(use_running_average=not train)(out)
        out = nn.relu6(out)
        out = nn.Conv(hidden, (3, 3), strides=(self.strides, self.strides),
                      kernel_dilation=(self.dilation, self.dilation),
                      feature_group_count=hidden, padding="SAME",
                      use_bias=False)(out)
        out = nn.BatchNorm(use_running_average=not train)(out)
        out = nn.relu6(out)
        out = nn.Conv(self.features, (1, 1), use_bias=False)(out)
        out = nn.BatchNorm(use_running_average=not train)(out)
        if self.strides == 1 and in_ch == self.features:
            out = out + x
        return out


class MobileV2Block3D(nn.Module):
    """3-D inverted-residual bottleneck over (D, H, W) volumes — the
    depthwise-separable 3-D conv unit of MSNet3D."""

    features: int
    strides: Sequence[int] | int = 1
    expansion: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        strides = ((self.strides,) * 3 if isinstance(self.strides, int)
                   else tuple(self.strides))
        in_ch = x.shape[-1]
        hidden = in_ch * self.expansion
        out = nn.Conv(hidden, (1, 1, 1), use_bias=False)(x)
        out = nn.BatchNorm(use_running_average=not train)(out)
        out = nn.relu6(out)
        out = nn.Conv(hidden, (3, 3, 3), strides=strides,
                      feature_group_count=hidden, padding="SAME",
                      use_bias=False)(out)
        out = nn.BatchNorm(use_running_average=not train)(out)
        out = nn.relu6(out)
        out = nn.Conv(self.features, (1, 1, 1), use_bias=False)(out)
        out = nn.BatchNorm(use_running_average=not train)(out)
        if strides == (1, 1, 1) and in_ch == self.features:
            out = out + x
        return out


class Deconv3dParityMXU(nn.Module):
    """Drop-in for a bias-free SAME (4,4,4)/stride-2 ``nn.ConvTranspose``
    over NDHWC volumes that routes through
    :func:`stereo_tpu.ops.conv3d.deconv3d_parity` — one (2,2,2) conv with
    ``8 * c_out`` output lanes plus a pixel-shuffle interleave, measured
    1.1-1.2x the native transposed conv on v5e
    (``scripts/microbench_deconv3d.py``).  Parameter name/shape matches
    ``nn.ConvTranspose`` (``kernel`` of (4,4,4,cin,cout)), so existing
    checkpoints load unchanged when instantiated as ``ConvTranspose_0``."""

    features: int

    @nn.compact
    def __call__(self, x):
        from ..ops.conv3d import deconv3d_parity

        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (4, 4, 4, x.shape[-1], self.features))
        dtype = jnp.promote_types(x.dtype, w.dtype)
        return deconv3d_parity(x.astype(dtype), w.astype(dtype))


class Deconv2dParityMXU(nn.Module):
    """Drop-in for a SAME (2s,2s)/stride-s ``nn.ConvTranspose`` over NHWC
    maps that routes through
    :func:`stereo_tpu.ops.conv3d.deconv2d_parity` — one (2,2) conv with
    ``s*s*c_out`` output lanes plus a pixel-shuffle interleave, skipping
    the (2s)^2/4 structural-zero MACs of the input-dilated lowering.
    Parameter names/shapes match ``nn.ConvTranspose``; instantiate as
    ``ConvTranspose_0`` (or the original name) to keep checkpoints
    loading unchanged."""

    features: int
    scale: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        from ..ops.conv3d import deconv2d_parity

        k = 2 * self.scale
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (k, k, x.shape[-1], self.features))
        dtype = jnp.promote_types(x.dtype, w.dtype)
        out = deconv2d_parity(x.astype(dtype), w.astype(dtype), self.scale)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            out = out + b.astype(dtype)
        return out


class DeconvBn(nn.Module):
    """Transposed conv (x2 upsampling) + BN, 2-D or 3-D by kernel rank."""

    features: int
    kernel: Sequence[int] = (4, 4)
    strides: Sequence[int] = (2, 2)

    @nn.compact
    def __call__(self, x, train: bool = False):
        if tuple(self.kernel) == (4, 4, 4) and tuple(self.strides) == (2, 2, 2):
            # 3-D x2 deconv on the MXU-packed path (same params)
            x = Deconv3dParityMXU(self.features,
                                  name="ConvTranspose_0")(x)
        elif (len(self.kernel) == 2 and len(set(self.strides)) == 1
                and self.kernel[0] == self.kernel[1] == 2 * self.strides[0]):
            x = Deconv2dParityMXU(self.features, self.strides[0],
                                  use_bias=False,
                                  name="ConvTranspose_0")(x)
        else:
            x = nn.ConvTranspose(self.features, tuple(self.kernel),
                                 strides=tuple(self.strides), padding="SAME",
                                 use_bias=False)(x)
        return nn.BatchNorm(use_running_average=not train)(x)


def upsample_bilinear(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Bilinear x``scale`` upsampling of NHWC feature maps."""
    n, h, w, c = x.shape
    import jax
    return jax.image.resize(x, (n, h * scale, w * scale, c), method="bilinear")


def upsample_trilinear(x: jnp.ndarray, shape: Tuple[int, int, int]) -> jnp.ndarray:
    """Trilinear resize of an NDHWC volume to (D', H', W')."""
    import jax
    n, _, _, _, c = x.shape
    return jax.image.resize(x, (n, *shape, c), method="trilinear")
