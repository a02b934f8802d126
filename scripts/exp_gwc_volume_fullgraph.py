"""Full-graph A/B: gwcnet eval forward with the XLA vs Pallas volume build.

The isolated microbench is ambiguous (XLA build: 4.35 ms in the
profile-stage protocol vs 16.3 ms in the microbench protocol; Pallas:
14.1 ms), so the decisive number is the full `_forward` frame rate — which
also prices the Mosaic co-compile penalty (a custom call in the graph can
cost XLA's latency hiding; measured ~1.2 ms fixed on the Deep3D net).

Usage: python scripts/exp_gwc_volume_fullgraph.py [--impl xla|pallas]
       [--dtype bfloat16] [--m 6]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from stereo_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
from jax import lax


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--impl", choices=["xla", "pallas"], default="xla")
    parser.add_argument("--dtype", default="bfloat16")
    parser.add_argument("--m", type=int, default=6)
    args = parser.parse_args()

    if args.impl == "pallas":
        from stereo_tpu.models import gwcnet
        from stereo_tpu.ops.pallas.gwc_volume import build_gwc_volume_pallas

        gwcnet.build_gwc_volume = build_gwc_volume_pallas

    from stereo_tpu.pipeline.backends import DnnStereoMatchingBackend

    backend = DnnStereoMatchingBackend("gwcnet", image_shape=(384, 1280),
                                       max_disparity=192,
                                       compute_dtype=args.dtype)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 255, (1, 3, 384, 1280)), jnp.float32)
    m = args.m

    @jax.jit
    def run(seed):
        def one(i):
            return jnp.sum(backend._forward(
                backend.params, x + (seed + i) * 1e-30, x).astype(jnp.float32))
        return jnp.sum(lax.map(one, jnp.arange(m, dtype=jnp.float32)))

    t0 = time.perf_counter()
    float(run(jnp.float32(1.0)))
    print(f"{args.impl} {args.dtype} compile+first "
          f"{time.perf_counter() - t0:.1f}s", flush=True)
    best = float("inf")
    for seed in (3.0, 5.0, 7.0):
        t0 = time.perf_counter()
        float(run(jnp.float32(seed)))
        best = min(best, time.perf_counter() - t0)
    print(f"{args.impl} {args.dtype}: {best / m * 1e3:.2f} ms/frame "
          f"({m / best * m / m:.2f} fps... {1e3 / (best / m * 1e3):.2f} FPS)",
          flush=True)


if __name__ == "__main__":
    main()
