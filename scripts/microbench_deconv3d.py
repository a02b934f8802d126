"""Micro-benchmark: native ConvTranspose 4^3/s2 vs the parity-class conv.

A k=4, s=2 SAME transposed conv decomposes exactly into 8 parity classes
(one per output (z%2, y%2, x%2)), each a (2,2,2)-tap conv — fused as ONE
(2,2,2) conv with 8*C_out output channels (full MXU lanes) followed by a
pixel-shuffle interleave.  Kernel mapping (probed against flax):
out[2j+p] uses taps w[2t+p], window (x[j-1+t]) for p=0 / (x[j+t]) for p=1.

Usage: python scripts/microbench_deconv3d.py [--dtype bfloat16]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def deconv3d_ref(x, w):
    """flax ConvTranspose semantics: lax.conv_transpose, SAME, stride 2."""
    return lax.conv_transpose(
        x, w, strides=(2, 2, 2), padding="SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def deconv3d_parity(x, w):
    """Exact 4^3/s2 SAME transposed conv via one (2,2,2) conv with
    8*C_out channels + pixel shuffle."""
    n, d, h, wd, cin = x.shape
    kd, kh, kw, _, cout = w.shape
    assert (kd, kh, kw) == (4, 4, 4)
    # w[km] with km = 2t + p  ->  (t, p) per axis
    wp = w.reshape(2, 2, 2, 2, 2, 2, cin, cout)        # (tz,pz,ty,py,tx,px,..)
    wp = wp.transpose(0, 2, 4, 6, 1, 3, 5, 7)          # (tz,ty,tx,ci,pz,py,px,co)
    wp = wp.reshape(2, 2, 2, cin, 8 * cout)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    y = lax.conv_general_dilated(
        xp, wp, window_strides=(1, 1, 1), padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))  # (N, d+1, h+1, w+1, 8co)
    y = y.reshape(n, d + 1, h + 1, wd + 1, 2, 2, 2, cout)
    # parity (pz,py,px) plane j comes from window offset pz/py/px
    out = jnp.stack([
        y[:, pz:pz + d, py:py + h, px:px + wd, pz, py, px]
        for pz in (0, 1) for py in (0, 1) for px in (0, 1)], axis=-2)
    out = out.reshape(n, d, h, wd, 2, 2, 2, cout)
    out = out.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return out.reshape(n, 2 * d, 2 * h, 2 * wd, cout)


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


SHAPES = [
    ("hg up1 128->64", 12, 24, 80, 128, 64),
    ("hg up2 64->32", 24, 48, 160, 64, 32),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()
    dtype = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)

    xs = jnp.asarray(rng.standard_normal((1, 6, 8, 10, 5)), jnp.float32)
    ws = jnp.asarray(rng.standard_normal((4, 4, 4, 5, 7)), jnp.float32)
    err = float(jnp.max(jnp.abs(deconv3d_ref(xs, ws) -
                                deconv3d_parity(xs, ws))))
    print(f"correctness parity: maxerr {err:.2e} "
          f"{'OK' if err < 1e-3 else 'FAIL'}")

    print(f"\n{'shape':18s} {'native':>9s} {'parity':>9s}")
    for name, d, h, w, cin, cout in SHAPES:
        x = jax.device_put(jnp.asarray(
            rng.standard_normal((1, d, h, w, cin)), dtype))
        wt = jax.device_put(jnp.asarray(
            0.1 * rng.standard_normal((4, 4, 4, cin, cout)), dtype))
        tn = _bench("n", deconv3d_ref, (x, wt))
        tp = _bench("p", deconv3d_parity, (x, wt))
        print(f"{name:18s} {tn * 1e3:7.2f}ms {tp * 1e3:7.2f}ms   "
              f"{tn / tp:4.2f}x")


if __name__ == "__main__":
    main()
