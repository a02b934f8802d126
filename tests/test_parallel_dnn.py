"""Sharded DNN inference (GSPMD) equivalence on the virtual 8-device mesh.

The classical engine's sharded path hand-writes collectives and is tested
bit-exactly in test_parallel.py; the DNN path delegates partitioning to the
XLA SPMD compiler (``parallel/dnn.py``), so the property to pin is: the
mesh-sharded forward equals the single-device forward on identical
parameters and inputs (conv halo exchanges are exact — only reduction
reassociation may wiggle the soft-argmax in the last few ulps).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stereo_tpu.core.config import MeshConfig
from stereo_tpu.models import build_stereo_model, init_stereo_params


def _inputs(batch, h, w, seed=0):
    rng = np.random.default_rng(seed)
    left = rng.uniform(0, 255, (batch, 3, h, w)).astype(np.float32)
    right = np.roll(left, -3, axis=-1).copy()
    return left, right


class TestShardedDnnEngine:
    def test_gwcnet_sharded_matches_single_device(self):
        from stereo_tpu.parallel import ShardedDnnEngine
        from stereo_tpu.pipeline.backends import DnnStereoMatchingBackend

        h, w, d = 64, 96, 16
        model = build_stereo_model("gwcnet", max_disparity=d)
        params = init_stereo_params(model, (h, w))
        left, right = _inputs(4, h, w)

        single = DnnStereoMatchingBackend("gwcnet", image_shape=(h, w),
                                          max_disparity=d, params=params)
        ref = np.asarray(single.process_batch(left, right))

        engine = ShardedDnnEngine("gwcnet", (h, w),
                                  MeshConfig(data=2, tile=2, disp=2),
                                  max_disparity=d, params=params)
        out = np.asarray(engine.process_batch(left, right))
        assert out.shape == (4, h, w)
        np.testing.assert_allclose(out, ref, atol=5e-3)

    def test_batch_group_and_height_validation(self):
        from stereo_tpu.parallel import ShardedDnnEngine

        model = build_stereo_model("gwcnet", max_disparity=16)
        params = init_stereo_params(model, (64, 96))
        engine = ShardedDnnEngine("gwcnet", (64, 96),
                                  MeshConfig(data=2, tile=2, disp=2),
                                  max_disparity=16, params=params)
        assert engine.batch_group == 4
        left, right = _inputs(3, 64, 96)
        with pytest.raises(ValueError, match="not divisible"):
            engine.process_batch(left, right)
        with pytest.raises(ValueError, match="height"):
            ShardedDnnEngine("gwcnet", (65, 96),
                             MeshConfig(data=2, tile=2, disp=2),
                             max_disparity=16, params=params)


class TestShardedDnnBackendDispatch:
    def test_pipeline_selects_sharded_backend_under_mesh(self):
        """Config with a multi-device mesh + DNN name must dispatch to the
        GSPMD backend (construction only — the compile is covered above)."""
        from stereo_tpu.pipeline.backends import ShardedDnnBackend
        from stereo_tpu.pipeline.depth_pipeline import DepthEstimationPipeline
        from stereo_tpu.core.config import PipelineConfig

        cfg = PipelineConfig(image_shape=(64, 96), min_disparity=0,
                             max_disparity=32,
                             stereo_matching_backend="gwcnet",
                             mesh=MeshConfig(data=2, tile=2, disp=2))
        pipe = DepthEstimationPipeline(cfg)
        assert isinstance(pipe.stereo_matching, ShardedDnnBackend)

    def test_single_frame_process_replicates(self):
        from stereo_tpu.pipeline.backends import (DnnStereoMatchingBackend,
                                                  ShardedDnnBackend)

        h, w, d = 64, 96, 16
        model = build_stereo_model("gwcnet", max_disparity=d)
        params = init_stereo_params(model, (h, w))
        backend = ShardedDnnBackend.__new__(ShardedDnnBackend)
        from stereo_tpu.parallel import ShardedDnnEngine
        backend.engine = ShardedDnnEngine("gwcnet", (h, w),
                                          MeshConfig(data=2, tile=2, disp=2),
                                          max_disparity=d, params=params)
        left, right = _inputs(1, h, w, seed=3)
        out = np.asarray(backend.process(left[0], right[0]))
        single = DnnStereoMatchingBackend("gwcnet", image_shape=(h, w),
                                          max_disparity=d, params=params)
        ref = np.asarray(single.process(left[0], right[0]))
        assert out.shape == (h, w)
        np.testing.assert_allclose(out, ref, atol=5e-3)
