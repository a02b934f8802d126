"""MXU-packed 3-D convolutions for the stereo cost-volume networks.

Exact (bit-level reassociation only) reformulations of NDHWC (3,3,3) convs
as 2-D convs whose lane (output-channel) dimension fills the MXU's 128
lanes.  GwcNet-class 3-D aggregation runs at 32-64 channels — 25-50% lane
occupancy — and profiles at ~8% of the v5e's bf16 peak as native
``lax.conv_general_dilated`` 3-D convs; these rewrites measure 1.2-3.2x
faster per shape (see ``scripts/microbench_conv3d.py`` for the sweep).

Dispatch (``conv3d_mxu``):

* ``c_out == 1`` -> ``shiftadd``: one 2-D conv with ``kd*c_out`` output
  blocks over an ``N*D`` batch, then shifted adds over D (zero FLOP
  overhead; avoids the pathological native ``c_out=1`` 3-D conv).
* ``c_out < 128`` -> ``chunked``: 2-D conv over chunks of ``db = 128 //
  c_out`` D-planes with a block-banded kernel; lane dim ``db * c_out =
  128`` at ``(db + 2) / 3`` x FLOPs (stride 1).
* otherwise native (measured parity at 128 channels).

Alternatives explored and rejected on v5e measurements (sweeps preserved
in ``scripts/microbench_conv3d.py``): ``dstack`` (kd folded into input
channels — loses everywhere), ``tapmat`` (27-tap lane unfold + shift
reduce — close second at c_out=1), ``bandwin`` (banding expressed as a
span-6/stride-4 conv window — XLA lowers it poorly), and a hand-written
Pallas kernel running the banded matmul from VMEM-staged windows
(compiled, bit-matched, but 0.4-0.96x of ``chunked``: Mosaic relayout +
the same banding overhead).  Transposed convs are a different story —
see ``deconv3d_parity`` / ``deconv2d_parity`` below, which win large.

The reference's 3-D aggregation lives inside opaque TorchScript traces
(``dnn_stereo_matching_backend.py:9-13``); this module is the TPU-side
answer to the CUDA kernels those traces call.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def conv3d_native(x: jnp.ndarray, w: jnp.ndarray,
                  stride: int = 1) -> jnp.ndarray:
    """Plain NDHWC / DHWIO 3-D conv, SAME padding, isotropic stride."""
    return lax.conv_general_dilated(
        x, w, window_strides=(stride,) * 3, padding="SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def conv3d_chunked(x: jnp.ndarray, w: jnp.ndarray, stride: int = 1,
                   db: int | None = None) -> jnp.ndarray:
    """Exact (3,kh,kw) conv via a 2-D conv over D-chunks of ``db`` planes.

    Each chunk of ``db`` output planes convolves ``stride*(db-1)+3`` input
    planes with a kernel block-banded over the plane axis, so the fused
    2-D conv carries ``db * c_out`` output channels.  Supports isotropic
    stride 1 or 2 (H/W stride rides the inner 2-D conv).
    """
    n, d, h, wd, cin = x.shape
    kd, kh, kw, _, cout = w.shape
    if kd != 3 or stride not in (1, 2):
        return conv3d_native(x, w, stride)
    dout = (d + stride - 1) // stride
    if db is None:
        db = max(1, min(128 // cout, dout))
    while dout % db:
        db -= 1
    nchunk = dout // db
    # SAME-in-D: out plane z reads padded planes s*z .. s*z+2, where the
    # total pad (dout-1)*s + 3 - d splits low = total//2 (XLA convention:
    # stride 1 -> (1,1); stride 2, even d -> (0,1)).
    span = stride * (db - 1) + 3
    total_pad = max(stride * (dout - 1) + 3 - d, 0)
    plo = total_pad // 2
    xp = jnp.pad(x, ((0, 0), (plo, total_pad - plo), (0, 0), (0, 0), (0, 0)))
    # overlapping chunk windows as static slices (TPU gathers are slow)
    xc = jnp.stack([xp[:, i * db * stride:i * db * stride + span]
                    for i in range(nchunk)], axis=1)
    xc = jnp.moveaxis(xc, 2, -2)          # (N, nchunk, H, W, span, C)
    xc = xc.reshape(n * nchunk, h, wd, span * cin)
    w2 = jnp.zeros((kh, kw, span, cin, db, cout), w.dtype)
    wm = jnp.moveaxis(w, 0, 2)            # (kh, kw, kd, cin, cout)
    for z in range(db):
        w2 = w2.at[:, :, stride * z:stride * z + 3, :, z, :].set(wm)
    w2 = w2.reshape(kh, kw, span * cin, db * cout)
    out = lax.conv_general_dilated(
        xc, w2, window_strides=(stride, stride), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    ho, wo = out.shape[1], out.shape[2]
    out = out.reshape(n, nchunk, ho, wo, db, cout)
    return jnp.moveaxis(out, 4, 2).reshape(n, dout, ho, wo, cout)


def conv3d_shiftadd(x: jnp.ndarray, w: jnp.ndarray,
                    stride: int = 1) -> jnp.ndarray:
    """(3,kh,kw) conv = one 2-D conv with ``kd*c_out`` output channels over
    an ``N*D`` batch, plus shifted adds over D.  Zero FLOP overhead."""
    n, d, h, wd, cin = x.shape
    kd, kh, kw, _, cout = w.shape
    if kd != 3 or stride not in (1, 2):
        return conv3d_native(x, w, stride)
    x2 = x.reshape(n * d, h, wd, cin)
    w2 = jnp.moveaxis(w, 0, 3).reshape(kh, kw, cin, kd * cout)
    y = lax.conv_general_dilated(
        x2, w2, window_strides=(stride, stride), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    ho, wo = y.shape[1], y.shape[2]
    y = y.reshape(n, d, ho, wo, kd, cout)
    zero = jnp.zeros_like(y[:, :1, :, :, 0])
    if stride == 1:
        return (jnp.concatenate([zero, y[:, :-1, :, :, 0]], axis=1)
                + y[:, :, :, :, 1]
                + jnp.concatenate([y[:, 1:, :, :, 2], zero], axis=1))
    # stride 2 in D (even d, SAME pads (0,1) in D):
    # out[z] = y[2z, 0] + y[2z+1, 1] + y[2z+2, 2]
    dout = (d + 1) // 2
    y0 = y[:, ::2, :, :, 0]
    y1 = y[:, 1::2, :, :, 1]
    y2 = jnp.concatenate([y[:, 2:, :, :, 2], zero, zero], axis=1)[:, ::2]
    return (y0[:, :dout] + y1[:, :dout] + y2[:, :dout])


def deconv3d_parity(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Exact (4,4,4)/stride-2 SAME transposed conv (flax ``ConvTranspose``
    semantics) via ONE (2,2,2) conv with ``8 * c_out`` output channels (one
    per output parity class (z%2, y%2, x%2) — full MXU lanes) followed by a
    pixel-shuffle interleave.  Tap mapping (probed against flax):
    out[2j+p] uses taps w[2t+p] over window x[j-1+t] (p=0) / x[j+t] (p=1).
    """
    n, d, h, wd, cin = x.shape
    kd, kh, kw, _, cout = w.shape
    if (kd, kh, kw) != (4, 4, 4):
        raise ValueError(f"deconv3d_parity needs a (4,4,4) kernel, got "
                         f"{(kd, kh, kw)}")
    wp = w.reshape(2, 2, 2, 2, 2, 2, cin, cout)      # (tz,pz,ty,py,tx,px,..)
    wp = wp.transpose(0, 2, 4, 6, 1, 3, 5, 7)        # (tz,ty,tx,ci,pz,py,px,co)
    wp = wp.reshape(2, 2, 2, cin, 8 * cout)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    y = lax.conv_general_dilated(
        xp, wp, window_strides=(1, 1, 1), padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))  # (N,d+1,h+1,w+1,8co)
    y = y.reshape(n, d + 1, h + 1, wd + 1, 2, 2, 2, cout)
    out = jnp.stack([
        y[:, pz:pz + d, py:py + h, px:px + wd, pz, py, px]
        for pz in (0, 1) for py in (0, 1) for px in (0, 1)], axis=-2)
    out = out.reshape(n, d, h, wd, 2, 2, 2, cout)
    out = out.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return out.reshape(n, 2 * d, 2 * h, 2 * wd, cout)


def deconv2d_parity(x: jnp.ndarray, w: jnp.ndarray, s: int) -> jnp.ndarray:
    """Exact (2s,2s)/stride-s SAME transposed conv (flax ``ConvTranspose``
    semantics) via ONE (2,2) conv with ``s*s*c_out`` output channels plus a
    pixel-shuffle interleave.

    Derivation (probed against ``lax.conv_transpose`` SAME): output
    ``o = s*j + p`` sums ``x[j - 1 + off_p + t] * w[k-1-s//2-p + s*(off_p
    + t - 1)]`` for taps ``t in {0,1}``, with ``off_p = (p >= s//2)`` —
    i.e. every output parity class touches exactly 2 taps per axis, so the
    naive input-dilated conv wastes a factor ``(s*s)/... = (2s)^2/4`` of
    its MACs on structural zeros.  Used for Deep3D's x2..x16 upsampling
    branches (``deep3d.py:11-46,85-117``) and MSNet2D's hourglass.
    """
    import numpy as np

    n, h, wd, cin = x.shape
    kh, kw, _, cout = w.shape
    if kh != 2 * s or kw != 2 * s:
        raise ValueError(f"deconv2d_parity needs a (2s,2s) kernel, got "
                         f"{(kh, kw)} for stride {s}")
    off = np.array([1 if p >= s // 2 else 0 for p in range(s)])
    midx = np.array([[2 * s - 1 - s // 2 - p + s * (off[p] + t - 1)
                      for t in (0, 1)] for p in range(s)])   # (s, 2)
    wp = w[midx[:, :, None, None], midx[None, None, :, :]]
    # (p_y, t_y, p_x, t_x, ci, co) -> (t_y, t_x, ci, p_y, p_x, co)
    wp = wp.transpose(1, 3, 4, 0, 2, 5).reshape(2, 2, cin, s * s * cout)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = lax.conv_general_dilated(
        xp, wp, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))   # (n, h+1, w+1, s*s*co)
    y = y.reshape(n, h + 1, wd + 1, s, s, cout)
    out = jnp.stack([y[:, off[py]:off[py] + h, off[px]:off[px] + wd, py, px]
                     for py in range(s) for px in range(s)], axis=-2)
    out = out.reshape(n, h, wd, s, s, cout)
    out = out.transpose(0, 1, 3, 2, 4, 5)
    return out.reshape(n, s * h, s * wd, cout)


def conv3d_mxu(x: jnp.ndarray, w: jnp.ndarray, stride: int = 1) -> jnp.ndarray:
    """Measured-best dispatch for NDHWC (kd,kh,kw) SAME convs (see module
    docstring).  Falls back to the native conv whenever the reformulations
    don't apply (kd != 3, anisotropic need, stride > 2) or don't win."""
    kd = w.shape[0]
    cout = w.shape[-1]
    if kd != 3 or stride not in (1, 2):
        return conv3d_native(x, w, stride)
    if cout == 1:
        return conv3d_shiftadd(x, w, stride)
    if cout < 128:
        return conv3d_chunked(x, w, stride)
    return conv3d_native(x, w, stride)
