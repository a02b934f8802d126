"""Micro-benchmark of grayscale+mean_pool formulations on the real TPU.

Dev tool: the stage profiler showed grayscale+pool costing ~0.8 ms/frame at
the KITTI config — ~30x above HBM speed-of-light for the ~18 MB of traffic.
This times candidate formulations with the marginal protocol so we can pick
the fastest one that is numerically equivalent.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

bench._enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from stereo_tpu import ops


def variants(k: int, h: int, w: int):
    oh, ow = h // k, w // k

    def gray(img):
        return ops.rgb_to_grayscale(img)

    def v_current(l):
        return ops.mean_pool(gray(l), k)

    def v_reduce_window(l):
        g = gray(l)
        s = lax.reduce_window(g, 0.0, lax.add, (k, k), (k, k), "VALID")
        return s * (1.0 / (k * k))

    def v_conv_stride(l):
        g = gray(l)[None, None]
        kern = jnp.full((1, 1, k, k), 1.0 / (k * k), jnp.float32)
        return lax.conv_general_dilated(g, kern, (k, k), "VALID")[0, 0]

    def v_matmul_w(l):
        # H axis via sublane reshape-sum (cheap); W axis via a 0/1
        # selection matmul on the MXU (lane-axis reshapes are the slow part).
        g = gray(l)
        rows = g.reshape(oh, k, w).sum(axis=1)
        sel = (jnp.arange(w)[:, None] // k ==
               jnp.arange(ow)[None, :]).astype(jnp.float32)
        return rows @ sel * (1.0 / (k * k))

    def v_slice_adds(l):
        g = gray(l)
        rows = g.reshape(oh, k, w).sum(axis=1)
        acc = rows[:, 0::k]
        for i in range(1, k):
            acc = acc + rows[:, i::k]
        return acc * (1.0 / (k * k))

    def v_pool_then_gray(l):
        # linear ops commute: pool each channel (batched over C), then luma.
        p = ops.mean_pool(l, k)
        return ops.rgb_to_grayscale(p)

    def v_gray_only(l):
        return gray(l)

    def v_slice_adds_exact(l):
        # oracle association order: row-major sequential over the k x k
        # window, then divide — bit-exact vs tests/reference_impl.py.
        g = gray(l)
        acc = None
        for i in range(k):
            for j in range(k):
                s = g[i::k, j::k]
                acc = s if acc is None else acc + s
        return acc / float(k * k)

    return [("gray_only", v_gray_only), ("current", v_current),
            ("reduce_window", v_reduce_window), ("conv_stride", v_conv_stride),
            ("matmul_w", v_matmul_w), ("slice_adds", v_slice_adds),
            ("slice_adds_exact", v_slice_adds_exact),
            ("pool_then_gray", v_pool_then_gray)]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--k", type=int, default=4)
    p.add_argument("--h", type=int, default=384)
    p.add_argument("--w", type=int, default=1280)
    p.add_argument("--only", default=None)
    args = p.parse_args()

    rng = np.random.default_rng(0)
    left = np.round(rng.uniform(0, 255, (3, args.h, args.w))
                    ).astype(np.float32)
    ld = jax.device_put(jnp.asarray(left))

    ref = None
    only = set(args.only.split(",")) if args.only else None
    for name, fn in variants(args.k, args.h, args.w):
        if only and name not in only:
            continue
        out = np.asarray(jax.jit(fn)(ld))
        if name == "current":
            ref = out
        if ref is not None and out.shape == ref.shape and name != "current":
            err = float(np.abs(out - ref).max())
            tag = f" maxerr={err:.2e}"
        else:
            tag = ""
        fps, fixed_ms, _ = bench._marginal_fps(
            lambda l, f=fn: jnp.sum(f(l)), (ld,), m_small=10, m_large=110)
        print(f"{name:16s} {1000.0 / fps:8.4f} ms/frame  "
              f"({fps:9.1f} fps, fixed {fixed_ms:.0f} ms){tag}", flush=True)


if __name__ == "__main__":
    main()
