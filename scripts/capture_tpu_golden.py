"""Capture the TPU-Pallas golden disparity for the Middlebury demo pair.

Run ON THE REAL CHIP (plain ``python``, axon backend).  Writes
``tests/golden/middlebury_demo_disparity_pallas_tpu.npz`` — the committed
golden that ``bench.py``'s Middlebury job gates against (>= 99% of pixels
within 0.5 px on every subsequent TPU run).  The disparity is stored as
float16: the gate tolerance is 0.5 px, and f16 resolution at the maximum
disparity (262) is 0.25 px.

The demo pair is the reference repo's de-facto correctness harness
(``/root/reference/src/python/data/im0.png``, ``calib.txt`` — SURVEY.md §4);
it is read from the reference mount and never copied into this repo.
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
    main()
