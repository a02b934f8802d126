"""Per-stage Deep3D (RVS) inference profile on the real TPU.

The e2e single-view frame is ~5.4 ms of which the classical matcher is
~1.5 ms, leaving ~3.9 ms for a Deep3D forward whose whole FLOP budget
(VGG16 at 96x320 + branches + blend) is only ~10 GFLOPs — far from any
roofline, and bf16 barely moves it, so the cost is overhead/memory-bound
somewhere.  This times each stage of ``synthesize_batch`` in isolation to
find where.  Not part of the test suite — a development tool.

Protocol: the MARGINAL cost per in-graph iteration (a dynamic-trip-count
``fori_loop`` timed at two trip counts, slope taken) — the ~28 ms fixed
tunnel latency is differenced OUT, unlike the single-M protocol, whose
latency/m bias (~1.2 ms at m=20) would swamp these sub-millisecond stages.
Parameters are passed as operands, never closed over (closure weights
become HLO constants; the FF branch's 284 MB would 413 the remote-compile
upload).

Usage:  python scripts/profile_deep3d.py [--dtype float32] [--m 16]
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
    """Marginal seconds per invocation of ``fn(*args)``: one dynamic-trip
    ``fori_loop`` executable timed at trip counts m and 4m, slope taken
    (fixed tunnel latency cancels)."""

    @jax.jit
    def run(seed, trips, *a):
        def body(i, acc):
            out = fn(a[0] + (seed + i.astype(a[0].dtype))
                     * jnp.finfo(jnp.float32).tiny.astype(a[0].dtype),
                     *a[1:])
            return acc + jnp.sum(out.astype(jnp.float32))
        return lax.fori_loop(0, trips, body, jnp.float32(0.0))

    t0 = time.perf_counter()
    float(run(jnp.asarray(1.0, args[0].dtype), m, *args))
    compile_s = time.perf_counter() - t0

    def timed(seed, trips):
        t0 = time.perf_counter()
        float(run(jnp.asarray(seed, args[0].dtype), trips, *args))
        return time.perf_counter() - t0

    t_small = min(timed(3.0, m), timed(5.0, m))
    t_large = min(timed(7.0, 4 * m), timed(9.0, 4 * m))
    per = max((t_large - t_small) / (3 * m), 0.0)
    print(f"{name:30s} {per * 1e3:8.3f} ms   (compile {compile_s:5.1f}s)",
          flush=True)
    return per


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--dtype", default="float32")
    parser.add_argument("--m", type=int, default=16)
    args = parser.parse_args()
    dtype = jnp.dtype(args.dtype)

    from stereo_tpu.models.deep3d import (VGG16_BLOCKS, DeconvBranch,
                                          DisparityUpconvSoftmax,
                                          FeedForwardBranch, VggBlock)
    from stereo_tpu.ops.imageops import rescale_generated_view
    from stereo_tpu.synthesis.right_view_synthesis import (
        RightViewSynthesis, _resize_chw, synthesize_batch)
    from stereo_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_bench_cache"))

    rvs = RightViewSynthesis(output_shape=(384, 1280))
    variables = jax.device_put(rvs.variables)
    if dtype != jnp.float32:
        variables = jax.tree_util.tree_map(
            lambda t: t.astype(dtype) if t.dtype == jnp.float32 else t,
            variables)
    net_params = variables["params"]["DisparityEstimationNetwork_0"]

    rng = np.random.default_rng(0)
    left = jax.device_put(jnp.asarray(
        rng.uniform(0, 255, (1, 3, 384, 1280)), jnp.float32))
    m = args.m

    total = _time_stage(
        "FULL synthesize_batch",
        lambda l, v: synthesize_batch(rvs.model, v, l,
                                      output_shape=(384, 1280),
                                      full_shape=rvs.model_full_shape,
                                      down_shape=rvs.model_down_shape,
                                      compute_dtype=dtype),
        (left, variables), m)

    _time_stage(
        "preprocess (2x resize /255)",
        lambda l: jnp.concatenate(
            [(_resize_chw(l, (384, 1280)) / 255.0).reshape(-1),
             (_resize_chw(l, (96, 320)) / 255.0).reshape(-1)]),
        (left,), m)

    # VGG blocks + branches at their real shapes (96x320 input, NHWC).
    down = jax.device_put(jnp.asarray(
        rng.uniform(0, 1, (1, 96, 320, 3)), dtype))
    feats = [down]
    x = down
    h, w = 96, 320
    stage_sum = 0.0
    for i, chans in enumerate(VGG16_BLOCKS):
        blk = VggBlock(chans)
        p = {"params": net_params[f"VggBlock_{i}"]}
        stage_sum += _time_stage(
            f"vgg_block_{i} ({h}x{w})",
            lambda xx, pp, bb=blk: bb.apply(pp, xx), (x, p), m)
        x = jax.jit(blk.apply)(p, x)
        h, w = h // 2, w // 2
        feats.append(x)

    scale = 1
    for i in range(5):
        scale = scale if i == 0 else scale * 2
        br = DeconvBranch((64, 128, 256, 512, 512)[i], scale)
        p = {"params": net_params[f"DeconvBranch_{i}"]}
        fi = feats[i + 1]
        stage_sum += _time_stage(
            f"deconv_branch_{i} (x{scale}, {fi.shape[1]}x{fi.shape[2]})",
            lambda xx, pp, bb=br: bb.apply(pp, xx), (fi, p), m)

    ff = FeedForwardBranch(grid=(3, 10))
    p = {"params": net_params["FeedForwardBranch_0"]}
    stage_sum += _time_stage(
        "ff_branch (15360->4096->1950)",
        lambda xx, pp: ff.apply(pp, xx), (feats[5], p), m)

    head = DisparityUpconvSoftmax(1)
    ph = {"params": net_params["DisparityUpconvSoftmax_0"]}
    summed = jax.device_put(jnp.asarray(
        rng.uniform(-1, 1, (1, 48, 160, 65)), dtype))
    stage_sum += _time_stage(
        "softmax head (48x160->96x320)",
        lambda xx, pp: head.apply(pp, xx), (summed, ph), m)

    if jax.default_backend() == "tpu":
        from stereo_tpu.ops.pallas.blend import upsample_blend

        prob_low = jax.device_put(jnp.asarray(
            rng.uniform(0, 1, (1, 65, 96, 320)), jnp.float32))
        full01 = jax.device_put(jnp.asarray(
            rng.uniform(0, 1, (1, 3, 384, 1280)), jnp.float32))
        stage_sum += _time_stage(
            "fused upsample+blend (Pallas)",
            lambda pr, lf: upsample_blend(pr, lf, 4), (prob_low, full01), m)

    stage_sum += _time_stage(
        "rescale_generated_view",
        lambda xx: rescale_generated_view(xx),
        (jax.device_put(jnp.asarray(
            rng.uniform(0, 1, (1, 3, 384, 1280)), jnp.float32)),), m)

    print(f"{'stage-sum':30s} {stage_sum * 1e3:8.3f} ms   "
          f"vs full {total * 1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
