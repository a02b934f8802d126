"""Golden test on the reference repo's shipped Middlebury demo pair.

The reference publishes no accuracy numbers (SURVEY.md §6); its de-facto
correctness harness is visual inspection of this exact pair.  Our golden
statistics were produced by this engine on the real TPU and reproduce
bit-identically on CPU — any drift in the classical pipeline's semantics
shows up here.
"""

import os

import numpy as np
import pytest

DEMO_DIR = "/root/reference/src/python/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DEMO_DIR), reason="reference demo data not mounted")


def test_middlebury_demo_golden_stats():
    from PIL import Image

    from stereo_tpu.core.config import MatchingConfig
    from stereo_tpu.matching.classical import ClassicalStereoEngine

    left = np.asarray(Image.open(os.path.join(DEMO_DIR, "im0.png")),
                      np.float32).transpose(2, 0, 1)
    right = np.asarray(Image.open(os.path.join(DEMO_DIR, "im1.png")),
                       np.float32).transpose(2, 0, 1)
    engine = ClassicalStereoEngine(MatchingConfig())   # calib.txt defaults
    disp = np.asarray(engine.compute_disparity_map(left, right))

    assert disp.shape == (1080, 1920)
    in_range = float(np.mean((disp >= 75) & (disp <= 262)))
    # golden values measured on TPU v5e and reproduced on CPU
    assert abs(float(disp.mean()) - 158.50) < 0.2
    assert abs(in_range - 0.9549) < 0.005
