"""Right-view-synthesis wrapper tests (small model resolution on CPU)."""

import numpy as np

from stereo_tpu.synthesis import RightViewSynthesis


class TestRightViewSynthesis:
    def test_process_shapes_and_range(self):
        rvs = RightViewSynthesis(output_shape=(48, 96),
                                 model_full_shape=(128, 256),
                                 model_down_shape=(32, 64))
        left = np.random.default_rng(0).integers(
            0, 256, (3, 48, 96)).astype(np.float32)
        right = np.asarray(rvs.process(left))
        assert right.shape == (3, 48, 96)
        assert right.min() >= 0.0 and right.max() <= 255.0

    def test_process_batch(self):
        rvs = RightViewSynthesis(output_shape=(48, 96),
                                 model_full_shape=(128, 256),
                                 model_down_shape=(32, 64))
        batch = np.zeros((2, 3, 48, 96), np.float32)
        out = np.asarray(rvs.process_batch(batch))
        assert out.shape == (2, 3, 48, 96)
