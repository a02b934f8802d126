"""Pallas vs XLA group-correlation volume build at the GwcNet bench shape.

Usage: python scripts/microbench_gwc_volume.py [--impl xla|pallas] [--m 4]
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
    parser.add_argument("--impl", choices=["xla", "pallas"], default="pallas")
    parser.add_argument("--dtype", default="float32")
    parser.add_argument("--m", type=int, default=4)
    args = parser.parse_args()

    from stereo_tpu.models.cost_volumes import build_gwc_volume
    from stereo_tpu.ops.pallas.gwc_volume import build_gwc_volume_pallas

    fn = (build_gwc_volume if args.impl == "xla"
          else build_gwc_volume_pallas)
    dt = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)
    l = jnp.asarray(rng.standard_normal((1, 96, 320, 320)), dt)
    r = jnp.asarray(rng.standard_normal((1, 96, 320, 320)), dt)
    m = args.m

    @jax.jit
    def run(seed):
        def one(i):
            return jnp.sum(fn(l + (seed + i) * jnp.finfo(dt).tiny, r,
                              48, 40).astype(jnp.float32))
        return jnp.sum(lax.map(one, jnp.arange(m, dtype=dt)))

    t0 = time.perf_counter()
    float(run(jnp.asarray(1.0, dt)))
    print(f"{args.impl} {args.dtype} compile+first "
          f"{time.perf_counter() - t0:.1f}s", flush=True)
    best = float("inf")
    for seed in (3.0, 5.0, 7.0):
        t0 = time.perf_counter()
        float(run(jnp.asarray(seed, dt)))
        best = min(best, time.perf_counter() - t0)
    print(f"{args.impl} {args.dtype}: {best / m * 1e3:.3f} ms/build",
          flush=True)


if __name__ == "__main__":
    main()
