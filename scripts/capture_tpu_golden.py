"""Capture TPU golden disparities for the bench gates.

Run ON THE REAL CHIP (plain ``python``, axon backend).

Default: the Middlebury demo pair -> ``tests/golden/
middlebury_demo_disparity_pallas_tpu.npz`` — the committed golden that
``bench.py``'s Middlebury job gates against (>= 99% of pixels within
0.5 px on every subsequent TPU run).  The disparity is stored as float16:
the gate tolerance is 0.5 px, and f16 resolution at the maximum disparity
(262) is 0.25 px.  The demo pair is the reference repo's de-facto
correctness harness (``/root/reference/src/python/data/im0.png``,
``calib.txt`` — SURVEY.md §4); it is read from the reference mount and
never copied into this repo.

``--kitti``: the deterministic synthetic pair the classical HEADLINE
measures (``bench._kitti_pair``, true disparity 11 at the 384x1280 /
0..64 config) -> ``tests/golden/kitti_synthetic_disparity_tpu.npz``,
gated the same way by ``bench.py``'s headline job (VERDICT r3 #7).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

DEMO_DIR = "/root/reference/src/python/data"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "golden",
                   "middlebury_demo_disparity_pallas_tpu.npz")


def capture_kitti() -> None:
    import jax
    import jax.numpy as jnp

    from bench import _KITTI_GOLDEN, _kitti_pair
    from stereo_tpu.core.config import MatchingConfig
    from stereo_tpu.matching.classical import compute_disparity_map

    assert jax.default_backend() == "tpu", (
        f"golden must be captured on TPU, not {jax.default_backend()}")
    cfg = MatchingConfig(height=384, width=1280, min_disparity=0,
                         max_disparity=64)
    left, right = _kitti_pair()

    disp = np.asarray(jax.jit(
        lambda l, r: compute_disparity_map(l, r, cfg))(
            jax.device_put(jnp.asarray(left)),
            jax.device_put(jnp.asarray(right))))
    assert disp.shape == (384, 1280)
    mean = float(disp.mean())
    print(f"mean {mean:.3f} (true disparity 11)")
    assert 8.0 < mean < 14.0
    disp16 = disp.astype(np.float16)
    assert float(np.abs(disp16.astype(np.float32) - disp).max()) <= 0.25
    np.savez_compressed(_KITTI_GOLDEN, disparity=disp16)
    print(f"Wrote {_KITTI_GOLDEN} ({os.path.getsize(_KITTI_GOLDEN) / 1e6:.1f} MB)")


def main() -> None:
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from stereo_tpu.core.config import MatchingConfig
    from stereo_tpu.matching.classical import compute_disparity_map

    assert jax.default_backend() == "tpu", (
        f"golden must be captured on TPU, not {jax.default_backend()}")
    cfg = MatchingConfig(impl="pallas")   # Middlebury defaults, Pallas forced
    left8 = np.asarray(Image.open(os.path.join(DEMO_DIR, "im0.png")),
                       np.uint8).transpose(2, 0, 1)
    right8 = np.asarray(Image.open(os.path.join(DEMO_DIR, "im1.png")),
                        np.uint8).transpose(2, 0, 1)

    @jax.jit
    def run(l8, r8):
        return compute_disparity_map(l8.astype(jnp.float32),
                                     r8.astype(jnp.float32), cfg)

    disp = np.asarray(run(jax.device_put(left8), jax.device_put(right8)))
    assert disp.shape == (1080, 1920)
    in_range = float(np.mean((disp >= 75) & (disp <= 262)))
    print(f"mean {disp.mean():.2f}  in-range {in_range:.4f}")
    disp16 = disp.astype(np.float16)
    assert float(np.abs(disp16.astype(np.float32) - disp).max()) <= 0.25
    np.savez_compressed(OUT, disparity=disp16)
    print(f"Wrote {OUT} ({os.path.getsize(OUT) / 1e6:.1f} MB)")


if __name__ == "__main__":
    if "--kitti" in sys.argv:
        capture_kitti()
    else:
        main()
