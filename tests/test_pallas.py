"""Pallas kernel tests (interpret mode on CPU) against the XLA oracle path."""

import numpy as np
import jax.numpy as jnp
import pytest

from stereo_tpu import ops
from stereo_tpu.core.config import MatchingConfig
from stereo_tpu.matching import classical
from stereo_tpu.ops.pallas import matching_core, sampled_window

RNG = np.random.default_rng(21)


def stereo_pair(h, w, shift):
    left = RNG.integers(0, 256, (h, w)).astype(np.float32)
    left = np.round((left + np.roll(left, 1, 0) + np.roll(left, 1, 1)) / 3)
    right = np.roll(left, -shift, axis=-1)
    return left.astype(np.float32), right.astype(np.float32)


CFG = MatchingConfig(height=32, width=64, downscale_factor=2,
                     min_disparity=0, max_disparity=15, cost_patch_radius=1,
                     sad_patch_radius=2, threshold=5, small_mbm_radius=1,
                     mid_mbm_radius=1, large_mbm_radius=2)

# Middlebury-style: nonzero min disparity, bigger radii
CFG_MIN = MatchingConfig(height=48, width=96, downscale_factor=2,
                         min_disparity=8, max_disparity=23,
                         cost_patch_radius=1, sad_patch_radius=3, threshold=5,
                         small_mbm_radius=1, mid_mbm_radius=2,
                         large_mbm_radius=3)

# min disparity far beyond the halo (the real Middlebury regime: min_dd 37
# vs halo 11 — exercised the negative-right-pad bug)
CFG_BIGMIN = MatchingConfig(height=48, width=128, downscale_factor=2,
                            min_disparity=24, max_disparity=39,
                            cost_patch_radius=1, sad_patch_radius=2,
                            threshold=5, small_mbm_radius=1, mid_mbm_radius=1,
                            large_mbm_radius=2)

# enough disparity planes to force the chunked fori_loop kernel variant
# with a masked tail chunk in both kernels (num_dd = 50 -> 4 balanced
# chunks of 13 with 2 masked planes; num_dense = 105 -> 4 chunks of 27
# with 3 masked)
CFG_FORI = MatchingConfig(height=16, width=224, downscale_factor=2,
                          min_disparity=0, max_disparity=99,
                          cost_patch_radius=1, sad_patch_radius=1,
                          threshold=5, small_mbm_radius=1, mid_mbm_radius=1,
                          large_mbm_radius=1)

# downscaled height with no 8-aligned divisor (Middlebury 540 regime):
# exercises the padded-grid + crop path
CFG_UNALIGNED = MatchingConfig(height=40, width=64, downscale_factor=2,
                               min_disparity=0, max_disparity=11,
                               cost_patch_radius=1, sad_patch_radius=2,
                               threshold=5, small_mbm_radius=1,
                               mid_mbm_radius=1, large_mbm_radius=2)


class TestMatchingCore:
    @pytest.mark.parametrize("cfg", [CFG, CFG_MIN, CFG_BIGMIN, CFG_UNALIGNED, CFG_FORI],
                             ids=["kitti", "middlebury", "bigmin", "unaligned", "fori"])
    def test_matches_xla_path(self, cfg):
        lg, rg = stereo_pair(cfg.height, cfg.width, 2 * cfg.min_disparity // 2 + 6)
        ld = ops.mean_pool(jnp.asarray(lg), cfg.k)
        rd = ops.mean_pool(jnp.asarray(rg), cfg.k)

        vol = ops.sad_cost_volume(ld, rd, cfg.min_disparity_down,
                                  cfg.max_disparity_down,
                                  cfg.cost_patch_radius)
        agg = ops.mbm_aggregate(vol, cfg.small_mbm_radius, cfg.mid_mbm_radius,
                                cfg.large_mbm_radius)
        want_disp = ops.wta_disparity(agg, cfg.min_disparity_down)

        disp, mbm = matching_core(ld, rd, cfg)
        np.testing.assert_allclose(np.asarray(disp), np.asarray(want_disp))

        d_idx = np.asarray(want_disp).astype(np.int64) - cfg.min_disparity_down
        agg_np = np.asarray(agg)
        num_d = agg_np.shape[-1]
        for slot, j in ((0, -1), (1, 0), (2, 1)):
            want = np.take_along_axis(
                agg_np, ((d_idx + j) % num_d)[..., None], axis=-1)[..., 0]
            np.testing.assert_allclose(np.asarray(mbm[slot]), want, rtol=1e-6,
                                       err_msg=f"mbm slot {slot}")


class TestSampledWindow:
    @pytest.mark.parametrize("cfg", [CFG, CFG_MIN, CFG_BIGMIN, CFG_UNALIGNED, CFG_FORI],
                             ids=["kitti", "middlebury", "bigmin", "unaligned", "fori"])
    def test_matches_xla_window(self, cfg):
        from stereo_tpu.ops.refinement import sampled_sad_volume
        from stereo_tpu.ops.gather import take_window_lanes

        lg, rg = stereo_pair(cfg.height, cfg.width, 6)
        ld = ops.mean_pool(jnp.asarray(lg), cfg.k)
        rd = ops.mean_pool(jnp.asarray(rg), cfg.k)
        vol = ops.sad_cost_volume(ld, rd, cfg.min_disparity_down,
                                  cfg.max_disparity_down,
                                  cfg.cost_patch_radius)
        agg = ops.mbm_aggregate(vol, cfg.small_mbm_radius, cfg.mid_mbm_radius,
                                cfg.large_mbm_radius)
        disp = ops.wta_disparity(agg, cfg.min_disparity_down)

        k = cfg.k
        num_dd = agg.shape[-1]
        d_start = k * (cfg.min_disparity_down - 1) - 1
        num_dense = k * (num_dd + 1) + 3
        dense = sampled_sad_volume(jnp.asarray(lg), jnp.asarray(rg), k,
                                   cfg.sad_patch_radius, d_start, num_dense)
        d_idx = disp.astype(jnp.int32) - cfg.min_disparity_down
        want = take_window_lanes(dense, k * d_idx, 2 * k + 3, step=k)

        got = sampled_window(jnp.asarray(lg), jnp.asarray(rg), disp, cfg)
        np.testing.assert_allclose(np.moveaxis(np.asarray(got), 0, -1),
                                   np.asarray(want), rtol=1e-6)

    def test_noninteger_luma_inputs(self):
        """Pin the float-divergence envelope on PRODUCTION-like inputs.

        The phase-split kernel folds the row box into one banded 0/1 MXU
        contraction; that changed summation association is bit-exact for
        integer-valued images but can reassociate fp32 rounding on the real
        pipeline's weighted-luma inputs (``rgb_to_grayscale``, non-integer).
        The envelope must stay well inside the SAD near-tie scale (the
        golden gate separately bounds the end-to-end effect)."""
        from stereo_tpu.ops.refinement import sampled_sad_volume
        from stereo_tpu.ops.gather import take_window_lanes
        from stereo_tpu.ops.imageops import rgb_to_grayscale

        cfg = CFG
        rgb = RNG.integers(0, 256, (3, cfg.height, cfg.width)).astype(np.float32)
        lg = np.asarray(rgb_to_grayscale(jnp.asarray(rgb)))     # non-integer
        rg = np.roll(lg, -6, axis=-1)
        assert not np.allclose(lg, np.round(lg))                # really luma

        ld = ops.mean_pool(jnp.asarray(lg), cfg.k)
        rd = ops.mean_pool(jnp.asarray(rg), cfg.k)
        vol = ops.sad_cost_volume(ld, rd, cfg.min_disparity_down,
                                  cfg.max_disparity_down,
                                  cfg.cost_patch_radius)
        agg = ops.mbm_aggregate(vol, cfg.small_mbm_radius, cfg.mid_mbm_radius,
                                cfg.large_mbm_radius)
        disp = ops.wta_disparity(agg, cfg.min_disparity_down)

        k = cfg.k
        num_dd = agg.shape[-1]
        d_start = k * (cfg.min_disparity_down - 1) - 1
        num_dense = k * (num_dd + 1) + 3
        dense = sampled_sad_volume(jnp.asarray(lg), jnp.asarray(rg), k,
                                   cfg.sad_patch_radius, d_start, num_dense)
        d_idx = disp.astype(jnp.int32) - cfg.min_disparity_down
        want = np.asarray(take_window_lanes(dense, k * d_idx, 2 * k + 3,
                                            step=k))

        got = np.moveaxis(np.asarray(
            sampled_window(jnp.asarray(lg), jnp.asarray(rg), disp, cfg)),
            0, -1)
        # Window costs are patch sums of 255-|dL| terms, O(255 * (2r+1)^2)
        # ~ 6e3; a few fp32 ulps of reassociation is ~1e-2 absolute.
        np.testing.assert_allclose(got, want, rtol=0, atol=2e-2)
        assert float(np.abs(got - want).max()) < 2e-2


class TestFusedPipeline:
    @pytest.mark.parametrize("cfg", [CFG, CFG_MIN, CFG_BIGMIN, CFG_UNALIGNED, CFG_FORI],
                             ids=["kitti", "middlebury", "bigmin", "unaligned", "fori"])
    def test_pallas_impl_equals_xla_impl(self, cfg):
        left = RNG.integers(0, 256, (3, cfg.height, cfg.width)).astype(np.float32)
        right = np.roll(left, -6, axis=-1).astype(np.float32)
        want = np.asarray(classical.compute_disparity_map(
            jnp.asarray(left), jnp.asarray(right), cfg))
        got = np.asarray(classical.compute_disparity_map(
            jnp.asarray(left), jnp.asarray(right),
            cfg.replace(impl="pallas")))
        np.testing.assert_allclose(got, want, atol=1e-4)


class TestUpsampleBlend:
    """Fused volume-upsample + shifted-view blend vs the explicit
    ``jax.image.resize`` + ``weighted_shift_sum`` composition."""

    @staticmethod
    def _reference(prob_low, view, scale):
        import jax

        from stereo_tpu.ops.shift_stack import weighted_shift_sum

        n, d, hl, wl = prob_low.shape
        prob = jax.image.resize(prob_low, (n, d, scale * hl, scale * wl),
                                method="bilinear")
        return weighted_shift_sum(prob, view)

    @pytest.mark.parametrize("scale,h,w,num_d,batch", [
        (4, 16, 32, 9, 1),
        (4, 48, 64, 65, 1),     # the real channel count; odd tile (48)
        (2, 16, 32, 7, 2),      # ablation scale + batched lax.map path
    ])
    def test_matches_reference_composition(self, scale, h, w, num_d, batch):
        from stereo_tpu.ops.pallas.blend import upsample_blend

        rng = np.random.default_rng(5)
        prob = rng.dirichlet(np.ones(num_d),
                             (batch, h // scale, w // scale)).astype(np.float32)
        prob = jnp.transpose(jnp.asarray(prob), (0, 3, 1, 2))
        view = jnp.asarray(
            rng.uniform(0, 255, (batch, 3, h, w)), jnp.float32)

        got = np.asarray(upsample_blend(prob, view, scale))
        want = np.asarray(self._reference(prob, view, scale))
        np.testing.assert_allclose(got, want, rtol=0, atol=2e-4)

    def test_model_inference_parity(self):
        """Deep3D.__call__'s fused path (here: interpret-mode ineligible ->
        explicit path) must equal synthesize_with_probabilities' view."""
        import jax

        from stereo_tpu.models import Deep3D

        model = Deep3D()
        full = jnp.zeros((1, 3, 128, 128), jnp.float32)   # minimum legal
        down = jnp.zeros((1, 3, 32, 32), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), full, down, train=False)
        left = jnp.asarray(np.random.default_rng(6).uniform(
            0, 1, (1, 3, 128, 128)), jnp.float32)
        ld = jnp.asarray(left.reshape(1, 3, 32, 4, 32, 4).mean(axis=(3, 5)))
        out_call = model.apply(variables, left, ld, train=False)
        out_expl, _ = model.apply(variables, left, ld, train=False,
                                  method=Deep3D.synthesize_with_probabilities)
        np.testing.assert_allclose(np.asarray(out_call),
                                   np.asarray(out_expl), atol=1e-5)
