"""Micro-benchmark: native 3-D conv vs MXU-friendly 2-D reformulations.

GwcNet's 3-D convs have 32-64 output channels — a fraction of the MXU's
128 lanes — and profile at ~8% of bf16 peak.  Two exact reformulations:

* ``chunked``: 2-D conv over chunks of ``db`` D-planes, lane dim =
  db*C_out = 128, at (db+2)/3 x FLOPs (stride-1) — full lanes, some waste.
* ``shiftadd``: one 2-D conv with kd*C_out output channels (batch = N*D)
  plus shifted adds over D — zero FLOP overhead, lanes = 3*C_out.

Sweeps every conv shape in the GwcNet eval path.

Usage: python scripts/microbench_conv3d.py [--dtype bfloat16]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def conv3d_ref(x, w, stride=1):
    return lax.conv_general_dilated(
        x, w, window_strides=(stride,) * 3, padding="SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def conv3d_chunked(x, w, stride=1, db=None):
    """Exact (3,k,k) conv via a 2-D conv over D-chunks of ``db`` planes.

    Lane dim of the fused conv = db*C_out; pick db = 128 // C_out.
    Supports D-stride 1 and 2 (H/W stride rides the inner 2-D conv).
    """
    n, d, h, wd, cin = x.shape
    kd, kh, kw, _, cout = w.shape
    assert kd == 3
    dout = (d + stride - 1) // stride
    if db is None:
        db = max(1, min(128 // cout, dout))
    while dout % db:
        db -= 1
    nchunk = dout // db
    # SAME-in-D: out plane z reads padded planes s*z .. s*z+2, where the
    # total pad (dout-1)*s + 3 - d is split low = total//2 (XLA convention:
    # stride 1 -> (1, 1); stride 2, even d -> (0, 1)).
    span = stride * (db - 1) + 3
    total_pad = max(stride * (dout - 1) + 3 - d, 0)
    plo = total_pad // 2
    xp = jnp.pad(x, ((0, 0), (plo, total_pad - plo), (0, 0), (0, 0), (0, 0)))
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


def conv3d_shiftadd(x, w, stride=1):
    """(3,k,k) conv = one 2-D conv with kd*C_out channels + shifted adds."""
    n, d, h, wd, cin = x.shape
    kd, kh, kw, _, cout = w.shape
    x2 = x.reshape(n * d, h, wd, cin)
    w2 = jnp.moveaxis(w, 0, 3).reshape(kh, kw, cin, kd * cout)
    y = lax.conv_general_dilated(
        x2, w2, window_strides=(stride, stride), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    ho, wo = y.shape[1], y.shape[2]
    y = y.reshape(n, d, ho, wo, kd, cout)
    if stride == 1:
        zero = jnp.zeros_like(y[:, :1, :, :, 0])
        return (jnp.concatenate([zero, y[:, :-1, :, :, 0]], axis=1)
                + y[:, :, :, :, 1]
                + jnp.concatenate([y[:, 1:, :, :, 2], zero], axis=1))
    # stride 2 in D (even d, SAME pads (0, 1)):
    # out[z] = y[2z, 0] + y[2z+1, 1] + y[2z+2, 2]
    dout = (d + 1) // 2
    zero = jnp.zeros_like(y[:, :1, :, :, 0])
    y0 = y[:, ::2, :, :, 0]
    y1 = y[:, 1::2, :, :, 1]
    y2 = jnp.concatenate([y[:, 2:, :, :, 2], zero, zero], axis=1)[:, ::2]
    return (y0 + y1 + y2[:, :dout])[:, :dout]


def conv3d_dstack(x, w, stride=1):
    """(3,k,k) conv = 2-D conv over the N*D batch with the kd neighbor
    planes folded into input channels (im2col over D only): lanes = C_out,
    FLOPs = native, input traffic 3x."""
    n, d, h, wd, cin = x.shape
    kd, kh, kw, _, cout = w.shape
    zero = jnp.zeros_like(x[:, :1])
    x3 = jnp.concatenate([
        jnp.concatenate([zero, x[:, :-1]], axis=1),
        x,
        jnp.concatenate([x[:, 1:], zero], axis=1)], axis=-1)
    if stride == 2:
        # SAME s2 in D (even d) pads (0,1): out z is centered on plane 2z+1
        x3 = x3[:, 1::2]
    dout = x3.shape[1]
    x2 = x3.reshape(n * dout, h, wd, kd * cin)
    w2 = w.transpose(1, 2, 0, 3, 4).reshape(kh, kw, kd * cin, cout)
    y = lax.conv_general_dilated(
        x2, w2, window_strides=(stride, stride), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    ho, wo = y.shape[1], y.shape[2]
    return y.reshape(n, dout, ho, wo, cout)


def conv3d_bandwin(x, w, stride=1, db=None):
    """Chunked banding WITHOUT the explicit HBM im2col: the overlapping
    db-plane windows are expressed as a conv with D-window ``span`` and
    D-stride ``stride*db`` — XLA's own window machinery walks the overlaps.
    Kernel content identical to ``conv3d_chunked``'s banded weights; output
    needs one (zc, zb) interleave transpose."""
    n, d, h, wd, cin = x.shape
    kd, kh, kw, _, cout = w.shape
    assert kd == 3
    dout = (d + stride - 1) // stride
    if db is None:
        db = max(1, min(128 // cout, dout))
    while dout % db:
        db -= 1
    nchunk = dout // db
    span = stride * (db - 1) + 3
    total_pad = max(stride * (dout - 1) + 3 - d, 0)
    plo = total_pad // 2
    w2 = jnp.zeros((span, kh, kw, cin, db, cout), w.dtype)
    for z in range(db):
        w2 = w2.at[stride * z:stride * z + 3, :, :, :, z, :].set(w)
    w2 = w2.reshape(span, kh, kw, cin, db * cout)
    def same_pad(size, k):
        out = -(-size // stride)
        total = max((out - 1) * stride + k - size, 0)
        return (total // 2, total - total // 2)

    y = lax.conv_general_dilated(
        x, w2, window_strides=(stride * db, stride, stride),
        padding=((plo, total_pad - plo), same_pad(h, kh), same_pad(wd, kw)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    ho, wo = y.shape[2], y.shape[3]
    y = y.reshape(n, nchunk, ho, wo, db, cout)
    return jnp.moveaxis(y, 4, 2).reshape(n, dout, ho, wo, cout)


def conv3d_tapmat(x, w, stride=1):
    """Small-C_out path: ONE matmul with the 27 taps unfolded into lanes
    (27*C_out output channels), then a shifted-add tap reduction.  FLOPs =
    native; lanes = 27*C_out; extra HBM = a 27*C_out-channel partial."""
    n, d, h, wd, cin = x.shape
    kd, kh, kw, _, cout = w.shape
    assert stride == 1
    # partial[p, (tz,ty,tx,co)] = x[p, :] . w[tz,ty,tx,:,co]
    wm = w.reshape(kd * kh * kw, cin, cout)
    wm = jnp.moveaxis(wm, 1, 0).reshape(cin, kd * kh * kw * cout)
    part = (x.reshape(-1, cin) @ wm).reshape(n, d, h, wd, kd, kh, kw, cout)
    out = jnp.zeros((n, d, h, wd, cout), part.dtype)
    for tz in range(kd):
        for ty in range(kh):
            for tx in range(kw):
                sl = part[:, :, :, :, tz, ty, tx]
                # out[z,y,x] += part[z+pz, y+py, x+px]  (0 outside)
                pz, py, px = tz - kd // 2, ty - kh // 2, tx - kw // 2
                pad = [(0, 0),
                       (max(-pz, 0), max(pz, 0)),
                       (max(-py, 0), max(py, 0)),
                       (max(-px, 0), max(px, 0)),
                       (0, 0)]
                sh = jnp.pad(sl, pad)
                sh = sh[:,
                        max(pz, 0):sh.shape[1] - max(-pz, 0),
                        max(py, 0):sh.shape[2] - max(-py, 0),
                        max(px, 0):sh.shape[3] - max(-px, 0)]
                out = out + sh
    return out


def _bench(name, fn, args, m=20):
    @jax.jit
    def run(seed, *a):
        def one(i):
            return jnp.sum(fn(a[0] + (seed + i) * jnp.asarray(
                1e-3, a[0].dtype), *a[1:]).astype(jnp.float32))
        return jnp.sum(lax.map(one, jnp.arange(m, dtype=a[0].dtype)))

    float(run(jnp.asarray(1.0, args[0].dtype), *args))

    def timed(seed):
        t0 = time.perf_counter()
        float(run(jnp.asarray(seed, args[0].dtype), *args))
        return time.perf_counter() - t0

    return min(timed(3.0), timed(5.0)) / m


# (name, D, H, W, cin, cout, stride) — every 3-D conv shape in GwcNet eval
SHAPES = [
    ("pre_hg 40->32", 48, 96, 320, 40, 32, 1),
    ("pre_hg 32->32", 48, 96, 320, 32, 32, 1),
    ("hg c1 32->64 s2", 48, 96, 320, 32, 64, 2),
    ("hg c2 64->64", 24, 48, 160, 64, 64, 1),
    ("hg c3 64->128 s2", 24, 48, 160, 64, 128, 2),
    ("hg c4 128->128", 12, 24, 80, 128, 128, 1),
    ("classif 32->32", 48, 96, 320, 32, 32, 1),
    ("classif 32->1", 48, 96, 320, 32, 1, 1),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()
    dtype = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)

    # correctness on small shapes (fp32), stride 1 and 2
    for stride in (1, 2):
        xs = jnp.asarray(rng.standard_normal((1, 8, 16, 24, 5)), jnp.float32)
        ws = jnp.asarray(rng.standard_normal((3, 3, 3, 5, 7)), jnp.float32)
        ref = conv3d_ref(xs, ws, stride)
        for name, fn in (("chunked", conv3d_chunked),
                         ("shiftadd", conv3d_shiftadd),
                         ("dstack", conv3d_dstack),
                         ("bandwin", conv3d_bandwin),
                         ("tapmat", conv3d_tapmat)):
            if name == "tapmat" and stride != 1:
                continue
            err = float(jnp.max(jnp.abs(ref - fn(xs, ws, stride))))
            status = "OK" if err < 1e-3 else "FAIL"
            print(f"correctness {name} s{stride}: maxerr {err:.2e} {status}")

    print(f"\n{'shape':20s} {'native':>9s} {'chunked':>9s} {'shiftadd':>9s} "
          f"{'dstack':>9s} {'bandwin':>9s} {'tapmat':>9s}")
    for name, d, h, w, cin, cout, stride in SHAPES:
        x = jax.device_put(jnp.asarray(
            rng.standard_normal((1, d, h, w, cin)), dtype))
        wt = jax.device_put(jnp.asarray(
            0.1 * rng.standard_normal((3, 3, 3, cin, cout)), dtype))
        times = {}
        times["native"] = _bench(
            "n", lambda a, b, s=stride: conv3d_ref(a, b, s), (x, wt))
        times["chunked"] = _bench(
            "c", lambda a, b, s=stride: conv3d_chunked(a, b, s), (x, wt))
        times["shiftadd"] = _bench(
            "s", lambda a, b, s=stride: conv3d_shiftadd(a, b, s), (x, wt))
        times["dstack"] = _bench(
            "d", lambda a, b, s=stride: conv3d_dstack(a, b, s), (x, wt))
        times["bandwin"] = _bench(
            "b", lambda a, b, s=stride: conv3d_bandwin(a, b, s), (x, wt))
        if stride == 1 and 27 * cout <= 128:
            times["tapmat"] = _bench(
                "t", lambda a, b, s=stride: conv3d_tapmat(a, b, s), (x, wt))
        cells = " ".join(
            f"{times[k] * 1e3:7.2f}ms" if k in times else f"{'—':>9s}"
            for k in ("native", "chunked", "shiftadd", "dstack", "bandwin",
                      "tapmat"))
        best = min(times, key=times.get)
        print(f"{name:20s} {cells}   best {times[best] / times['native']:4.2f}"
              f"x-of-native ({best})")


if __name__ == "__main__":
    main()
