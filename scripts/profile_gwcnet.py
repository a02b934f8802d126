"""Per-stage GwcNet inference profile on the real TPU.

Times each stage of the eval forward (feature extraction, Gwc volume,
pre-hourglass, one hourglass, classifier head, full-resolution regression)
in isolation with the bench protocol (distinct seeded inputs, outputs
consumed by a reduction, min of repeats) so optimization effort lands on
the actual bottleneck.  Not part of the test suite — a development tool.

Usage:  python scripts/profile_gwcnet.py [--dtype bfloat16] [--m 10]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _time_stage(name: str, fn, args, m: int) -> float:
    """Seconds per invocation of ``fn(*args)`` amortized over ``m`` seeded
    in-graph iterations (single dispatch, one scalar readback)."""

    @jax.jit
    def run(seed, *a):
        def one(i):
            return jnp.sum(fn(a[0] + (seed + i) * jnp.finfo(a[0].dtype).tiny,
                              *a[1:]).astype(jnp.float32))
        return jnp.sum(lax.map(one, jnp.arange(m, dtype=a[0].dtype)))

    t0 = time.perf_counter()
    float(run(jnp.asarray(1.0, args[0].dtype), *args))
    compile_s = time.perf_counter() - t0

    def timed(seed):
        t0 = time.perf_counter()
        float(run(jnp.asarray(seed, args[0].dtype), *args))
        return time.perf_counter() - t0

    per = min(timed(3.0), timed(5.0)) / m
    print(f"{name:24s} {per * 1e3:8.2f} ms   (compile {compile_s:5.1f}s)")
    return per


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--dtype", default="bfloat16")
    parser.add_argument("--m", type=int, default=10)
    parser.add_argument("--height", type=int, default=384)
    parser.add_argument("--width", type=int, default=1280)
    args = parser.parse_args()

    from stereo_tpu.models.cost_volumes import (build_gwc_volume,
                                                disparity_regression)
    from stereo_tpu.models.gwcnet import (Classifier3D, GwcFeatureExtractor,
                                          Hourglass3D)
    from stereo_tpu.models.layers import ConvBnAct, upsample_trilinear

    dtype = jnp.dtype(args.dtype)
    h, w = args.height, args.width
    h4, w4 = h // 4, w // 4
    d4 = 192 // 4
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    def dev(shape):
        return jax.device_put(jnp.asarray(
            rng.standard_normal(shape), dtype))

    def cast_params(p):
        return jax.tree_util.tree_map(
            lambda t: t.astype(dtype) if t.dtype == jnp.float32 else t, p)

    results = {}

    # 1. feature extractor over the stacked pair (as the model runs it)
    feat = GwcFeatureExtractor()
    x_pair = dev((2, h, w, 3))
    p_feat = cast_params(feat.init(key, x_pair, False))
    results["features(2x)"] = _time_stage(
        "features(2x)", lambda x, p: feat.apply(p, x, False),
        (x_pair, p_feat), args.m)

    # 2. Gwc volume from 1/4-res features
    fl, fr = dev((1, h4, w4, 320)), dev((1, h4, w4, 320))
    results["gwc_volume"] = _time_stage(
        "gwc_volume", lambda a, b: build_gwc_volume(a, b, d4, 40),
        (fl, fr), args.m)

    # 3. pre-hourglass: 4 3-D convs at 32 channels (+ residual add)
    import flax.linen as nn

    class PreHourglass(nn.Module):
        @nn.compact
        def __call__(self, v, train: bool = False):
            x = ConvBnAct(32, (3, 3, 3))(v, train)
            x = ConvBnAct(32, (3, 3, 3))(x, train)
            r = ConvBnAct(32, (3, 3, 3))(x, train)
            r = ConvBnAct(32, (3, 3, 3), act=False)(r, train)
            return x + r

    vol = dev((1, d4, h4, w4, 40))
    pre = PreHourglass()
    p_pre = cast_params(pre.init(key, vol, False))
    results["pre_hourglass"] = _time_stage(
        "pre_hourglass", lambda v, p: pre.apply(p, v, False),
        (vol, p_pre), args.m)

    # 4. one hourglass (the model runs 3 of these)
    hg_in = dev((1, d4, h4, w4, 32))
    hg = Hourglass3D(32)
    p_hg = cast_params(hg.init(key, hg_in, False))
    results["hourglass (x3 in net)"] = _time_stage(
        "hourglass (x3 in net)", lambda v, p: hg.apply(p, v, False),
        (hg_in, p_hg), args.m)

    # 5. classifier head
    cl = Classifier3D()
    p_cl = cast_params(cl.init(key, hg_in, False))
    results["classifier"] = _time_stage(
        "classifier", lambda v, p: cl.apply(p, v, False),
        (hg_in, p_cl), args.m)

    # 6. regression: trilinear upsample to full res + softmax + soft-argmin
    logits = dev((1, d4, h4, w4, 1))

    def regress(lg):
        full = upsample_trilinear(lg, (192, h, w))
        prob = jax.nn.softmax(full[..., 0], axis=1)
        return disparity_regression(prob, 192)

    results["regression"] = _time_stage("regression", regress, (logits,),
                                        args.m)

    total = (results["features(2x)"] + results["gwc_volume"] +
             results["pre_hourglass"] + 3 * results["hourglass (x3 in net)"] +
             results["classifier"] + results["regression"])
    print(f"{'stage-sum (3 hg)':24s} {total * 1e3:8.2f} ms   "
          f"-> {1.0 / total:6.1f} FPS upper bound")


if __name__ == "__main__":
    main()
