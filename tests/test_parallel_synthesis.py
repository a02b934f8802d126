"""Sharded single-view engine equivalence on the virtual 8-device mesh.

The flagship scenario (one left view -> disparity; reference
``api.py:25-31``) composed under a (data, tile, disp) mesh
(``parallel/synthesis.py``) must equal the single-device path: Deep3D
``synthesize_batch`` then the single-frame classical matcher per frame.
The matcher half runs the exact single-frame program inside ``shard_map``
(bit-identical); only the GSPMD-partitioned Deep3D convs may reassociate
reductions, so the synthesized-view delta is a few ulps and the disparity
gate allows isolated near-tie WTA flips.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stereo_tpu.core.config import MatchingConfig, MeshConfig


@pytest.fixture(scope="module")
def small_variables():
    from stereo_tpu.models import Deep3D

    full = np.zeros((1, 3, 128, 256), np.float32)
    down = np.zeros((1, 3, 32, 64), np.float32)
    return Deep3D().init(jax.random.PRNGKey(0), full, down, train=False)


def _matching_config(h=64, w=96):
    return MatchingConfig(height=h, width=w, downscale_factor=2,
                          min_disparity=0, max_disparity=15,
                          cost_patch_radius=1, sad_patch_radius=2,
                          threshold=5, small_mbm_radius=1, mid_mbm_radius=1,
                          large_mbm_radius=2)


class TestShardedSingleViewEngine:
    def test_matches_single_device(self, small_variables):
        from stereo_tpu.matching.classical import ClassicalStereoEngine
        from stereo_tpu.parallel import ShardedSingleViewEngine
        from stereo_tpu.synthesis import RightViewSynthesis

        cfg = _matching_config()
        rvs_kwargs = dict(output_shape=(cfg.height, cfg.width),
                          variables=small_variables,
                          model_full_shape=(128, 256),
                          model_down_shape=(32, 64))

        rng = np.random.default_rng(0)
        left = rng.integers(0, 256,
                            (4, 3, cfg.height, cfg.width)).astype(np.float32)

        # Single-device reference: RVS then the single-frame matcher.
        rvs = RightViewSynthesis(**rvs_kwargs)
        right_ref = np.asarray(rvs.process_batch(left))
        single = ClassicalStereoEngine(cfg)
        ref = np.asarray(single.compute_disparity_maps(left, right_ref))

        engine = ShardedSingleViewEngine(
            cfg, MeshConfig(data=2, tile=2, disp=2),
            synthesis=RightViewSynthesis(**rvs_kwargs))
        out = np.asarray(engine.process_batch(left))

        assert out.shape == (4, cfg.height, cfg.width)
        # GSPMD conv reassociation can wiggle the synthesized view by ulps,
        # which may flip isolated near-tie WTA argmaxes; require near-total
        # agreement and a tiny mean delta.
        close = np.mean(np.abs(out - ref) <= 0.5)
        assert close >= 0.99, f"only {close:.4f} of pixels within 0.5px"
        assert float(np.mean(np.abs(out - ref))) < 0.1

    def test_pipeline_dispatch_under_mesh(self, small_variables):
        """``DepthEstimationPipeline.process_batch(left, None)`` under a
        multi-device mesh must route through the sharded single-view
        engine and still return the full result triple."""
        from stereo_tpu.core.config import PipelineConfig
        from stereo_tpu.pipeline import DepthEstimationPipeline
        from stereo_tpu.synthesis import RightViewSynthesis

        cfg = _matching_config()
        pcfg = PipelineConfig(image_shape=(cfg.height, cfg.width),
                              min_disparity=1, max_disparity=15,
                              matching=cfg,
                              mesh=MeshConfig(data=2, tile=2, disp=2))
        rvs = RightViewSynthesis(output_shape=(cfg.height, cfg.width),
                                 variables=small_variables,
                                 model_full_shape=(128, 256),
                                 model_down_shape=(32, 64))
        pipeline = DepthEstimationPipeline(pcfg, synthesis=rvs)
        left = np.random.default_rng(1).integers(
            0, 256, (4, 3, cfg.height, cfg.width)).astype(np.float32)
        result = pipeline.process_batch(left)
        assert result.disparity_map.shape == (4, cfg.height, cfg.width)
        assert result.right_image.shape == left.shape
        assert pipeline._sharded_sv_engine is not None

    def test_batch_and_height_validation(self, small_variables):
        from stereo_tpu.parallel import ShardedSingleViewEngine
        from stereo_tpu.synthesis import RightViewSynthesis

        cfg = _matching_config()
        engine = ShardedSingleViewEngine(
            cfg, MeshConfig(data=2, tile=2, disp=2),
            synthesis=RightViewSynthesis(output_shape=(cfg.height, cfg.width),
                                         variables=small_variables,
                                         model_full_shape=(128, 256),
                                         model_down_shape=(32, 64)))
        assert engine.batch_group == 4
        left = np.zeros((3, 3, cfg.height, cfg.width), np.float32)
        with pytest.raises(ValueError, match="not divisible"):
            engine.process_batch(left)
        with pytest.raises(ValueError, match="height"):
            ShardedSingleViewEngine(_matching_config(h=66),
                                    MeshConfig(data=1, tile=4, disp=2))
