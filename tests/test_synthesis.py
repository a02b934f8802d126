"""Right-view-synthesis wrapper tests (small model resolution on CPU)."""

import numpy as np
import pytest

from stereo_tpu.synthesis import RightViewSynthesis


@pytest.fixture(scope="module")
def small_variables():
    """Fresh small-model variables: passing them explicitly keeps these
    wrapper tests independent of the committed full-size checkpoint (whose
    npz meta would otherwise override the small model shapes)."""
    import jax

    from stereo_tpu.models import Deep3D

    full = np.zeros((1, 3, 128, 256), np.float32)
    down = np.zeros((1, 3, 32, 64), np.float32)
    return Deep3D().init(jax.random.PRNGKey(0), full, down, train=False)


class TestRightViewSynthesis:
    def test_process_shapes_and_range(self, small_variables):
        rvs = RightViewSynthesis(output_shape=(48, 96),
                                 variables=small_variables,
                                 model_full_shape=(128, 256),
                                 model_down_shape=(32, 64))
        left = np.random.default_rng(0).integers(
            0, 256, (3, 48, 96)).astype(np.float32)
        right = np.asarray(rvs.process(left))
        assert right.shape == (3, 48, 96)
        assert right.min() >= 0.0 and right.max() <= 255.0

    def test_process_batch(self, small_variables):
        rvs = RightViewSynthesis(output_shape=(48, 96),
                                 variables=small_variables,
                                 model_full_shape=(128, 256),
                                 model_down_shape=(32, 64))
        batch = np.zeros((2, 3, 48, 96), np.float32)
        out = np.asarray(rvs.process_batch(batch))
        assert out.shape == (2, 3, 48, 96)

    def test_bfloat16_matches_float32(self):
        """The bf16 Deep3D forward must track the f32 one to within a few
        gray levels (the synthesized view is 0..255; bf16 carries ~3
        decimal digits on the 0..1 pre-rescale image)."""
        import jax

        from stereo_tpu.models import Deep3D

        model = Deep3D()
        full = np.zeros((1, 3, 128, 256), np.float32)
        down = np.zeros((1, 3, 32, 64), np.float32)
        variables = model.init(jax.random.PRNGKey(1), full, down, train=False)

        left = np.random.default_rng(2).integers(
            0, 256, (3, 48, 96)).astype(np.float32)
        outs = {}
        for dtype in ("float32", "bfloat16"):
            rvs = RightViewSynthesis(output_shape=(48, 96),
                                     variables=variables,
                                     model_full_shape=(128, 256),
                                     model_down_shape=(32, 64),
                                     compute_dtype=dtype)
            outs[dtype] = np.asarray(rvs.process(left))
        diff = np.abs(outs["bfloat16"] - outs["float32"])
        assert outs["bfloat16"].dtype == np.float32
        assert float(diff.mean()) < 2.0 and float(diff.max()) <= 16.0

    def test_prob_volume_scale_variant_roundtrip(self, tmp_path):
        """The half-res probability-volume ablation variant (an extra
        learned x2 upconv, resize x2 instead of x4): its npz meta must
        rebuild the right model through the wrapper, and the volume must
        come out at full input resolution in both variants."""
        import jax

        from stereo_tpu.models import Deep3D, save_params_npz

        full = np.zeros((1, 3, 128, 256), np.float32)
        down = np.zeros((1, 3, 32, 64), np.float32)
        # scale=4 (the default) is exercised by every other Deep3D test;
        # compiling it again here doubled this test's cost for nothing.
        for scale in (2,):
            model = Deep3D(prob_volume_scale=scale)
            variables = model.init(jax.random.PRNGKey(0), full, down,
                                   train=False)
            prob = model.apply(variables, down,
                               method=Deep3D.disparity_probabilities)
            assert prob.shape == (1, 65, 128, 256)   # full res either way
            path = tmp_path / f"deep3d_s{scale}.npz"
            save_params_npz(variables, str(path), meta={
                "full_shape": [128, 256], "down_shape": [32, 64],
                "prob_volume_scale": scale})
            rvs = RightViewSynthesis(output_shape=(48, 96),
                                     checkpoint_dir=str(path))
            assert rvs.model.prob_volume_scale == scale
            assert rvs.model_full_shape == (128, 256)
            out = np.asarray(rvs.process(np.zeros((3, 48, 96), np.float32)))
            assert out.shape == (3, 48, 96)


class TestSplitInference:
    def test_split_matches_single_graph(self, small_variables):
        """``fused_blend_tail(*synthesize_net_batch(...))`` — the two-
        executable TPU inference path (Mosaic-in-module penalty workaround,
        module docstring) — must compute what ``synthesize_batch`` computes.
        On CPU the Pallas blend runs in interpret mode and the single-graph
        path takes the explicit composition, so this also re-pins the
        fused-vs-explicit equivalence at the wrapper level."""
        import jax.numpy as jnp

        from stereo_tpu.models import Deep3D
        from stereo_tpu.synthesis.right_view_synthesis import (
            fused_blend_tail, synthesize_batch, synthesize_net_batch)

        model = Deep3D()
        left = np.random.default_rng(3).integers(
            0, 256, (1, 3, 128, 256)).astype(np.float32)
        kw = dict(full_shape=(128, 256), down_shape=(32, 64))
        single = np.asarray(synthesize_batch(
            model, small_variables, jnp.asarray(left),
            output_shape=(48, 96), **kw))
        prob_low, full01 = synthesize_net_batch(
            model, small_variables, jnp.asarray(left), **kw)
        assert prob_low.shape == (1, 65, 32, 64)
        split = np.asarray(fused_blend_tail(
            prob_low, full01, scale=4, output_shape=(48, 96),
            full_shape=(128, 256)))
        np.testing.assert_allclose(split, single, atol=0.05)


class TestFusedSingleViewEngine:
    def test_matches_unfused_composition(self, small_variables):
        """The merged tail+matcher executable (``pipeline/single_view.py``)
        must compute the same right view as the synthesis wrapper and the
        same disparity as the standalone classical engine run on that
        right view (two dispatches vs three is the only difference)."""
        from stereo_tpu.core.config import MatchingConfig
        from stereo_tpu.matching.classical import ClassicalStereoEngine
        from stereo_tpu.pipeline.single_view import FusedSingleViewEngine

        cfg = MatchingConfig(height=48, width=96, downscale_factor=2,
                             min_disparity=0, max_disparity=15,
                             cost_patch_radius=1, sad_patch_radius=2,
                             threshold=5, small_mbm_radius=1,
                             mid_mbm_radius=1, large_mbm_radius=2)
        rvs = RightViewSynthesis(output_shape=(48, 96),
                                 variables=small_variables,
                                 model_full_shape=(128, 256),
                                 model_down_shape=(32, 64))
        engine = FusedSingleViewEngine(cfg, rvs)
        left = np.random.default_rng(7).integers(
            0, 256, (2, 3, 48, 96)).astype(np.float32)

        disparity, right = engine.process_batch(left)
        assert disparity.shape == (2, 48, 96)
        assert right.shape == (2, 3, 48, 96)

        # Right view: the engine's tail is the interpret-mode Pallas blend;
        # the wrapper's CPU path is the explicit composition (same 0.05
        # envelope as TestSplitInference).
        right_ref = np.asarray(rvs.process_batch(left))
        np.testing.assert_allclose(np.asarray(right), right_ref, atol=0.05)

        # Disparity: re-run the standalone matcher on the engine's OWN
        # right view — the merged graph must match it exactly (identical
        # matcher stages, only the executable boundary differs).
        disp_ref = ClassicalStereoEngine(cfg).compute_disparity_maps(
            left, np.asarray(right))
        np.testing.assert_allclose(np.asarray(disparity),
                                   np.asarray(disp_ref), atol=1e-5)

    def test_single_frame_process(self, small_variables):
        from stereo_tpu.core.config import MatchingConfig
        from stereo_tpu.pipeline.single_view import FusedSingleViewEngine

        cfg = MatchingConfig(height=48, width=96, downscale_factor=2,
                             min_disparity=0, max_disparity=15,
                             cost_patch_radius=1, sad_patch_radius=2,
                             threshold=5, small_mbm_radius=1,
                             mid_mbm_radius=1, large_mbm_radius=2)
        rvs = RightViewSynthesis(output_shape=(48, 96),
                                 variables=small_variables,
                                 model_full_shape=(128, 256),
                                 model_down_shape=(32, 64))
        engine = FusedSingleViewEngine(cfg, rvs)
        left = np.random.default_rng(8).integers(
            0, 256, (3, 48, 96)).astype(np.float32)
        disparity, right = engine.process(left)
        assert disparity.shape == (48, 96)
        assert right.shape == (3, 48, 96)


class TestCommittedCheckpointQuality:
    def test_committed_deep3d_synthesizes_at_native_point(self):
        """The COMMITTED Deep3D weights must synthesize well AT THEIR
        NATIVE OPERATING POINT (384x1280, disparities 0..64): L1 vs the
        true right view far below what a garbage volume produces (~30+
        gray levels).  Guards the checkpoint AND the protocol: evaluating
        a native checkpoint at a smaller eval shape silently compresses
        its expressible disparity range (65 shift channels cover only
        64 * W_eval / W_model px after the wrapper resize) — the r4 finding
        that made the r3 eval record unreproducible at the eval script's
        old 256x512 default."""
        import jax

        from stereo_tpu.core.config import MatchingConfig
        from stereo_tpu.matching.classical import ClassicalStereoEngine
        from stereo_tpu.train.synthetic import synthetic_stereo_batch

        left_b, _, gt_b = synthetic_stereo_batch(
            jax.random.PRNGKey(20260817), 1, 384, 1280, depth_prior=True)
        left = np.asarray(left_b[0])
        gt = np.asarray(gt_b[0])
        rvs = RightViewSynthesis(output_shape=(384, 1280))
        assert tuple(rvs.model_full_shape) == (384, 1280), \
            "committed checkpoint is no longer native 384x1280"
        right = np.asarray(rvs.process(left))
        cfg = MatchingConfig(height=384, width=1280, min_disparity=0,
                             max_disparity=64)
        disp = np.asarray(ClassicalStereoEngine(cfg).compute_disparity_map(
            left, right))
        mask = (gt > 0) & (gt <= 64)
        d1 = float((np.abs(disp - gt)[mask] > 3.0).mean())
        # The r5 checkpoint (scene-family fix + oracle photometric target)
        # measures ~0.09-0.10 here; the r4 one ~0.47; untrained ~0.9+.
        # Gate at 0.25: loose enough for single-scene variance, tight
        # enough that a recurrence of the r1-r4 mapping bias (global ~3 px
        # disparity shift) fails the suite.
        assert d1 < 0.25, f"committed Deep3D single-view D1 {d1:.3f} >= 0.25"
