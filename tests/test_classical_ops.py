"""Golden tests: vectorized JAX stage ops vs the loop-based NumPy oracle.

Inputs are integer-valued float32 images (as real uint8 frames are), which
makes every sum up to the aggregation product exactly representable — the
comparisons are bit-exact, not approximate.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import reference_impl as ref
from stereo_tpu import ops
from stereo_tpu.core.config import MatchingConfig
from stereo_tpu.matching import classical

RNG = np.random.default_rng(42)


def random_image(h, w, channels=None):
    shape = (channels, h, w) if channels else (h, w)
    return RNG.integers(0, 256, size=shape).astype(np.float32)


def stereo_pair(h, w, max_d):
    """A right image that is roughly the left shifted by a spatially varying
    disparity, so the pipeline has real structure to match."""
    left = random_image(h, w)
    # smooth the noise a bit so SAD has a basin
    left = np.round((left + np.roll(left, 1, 0) + np.roll(left, 1, 1)) / 3)
    right = np.empty_like(left)
    for x in range(h):
        d = 2 + (x * max_d // (2 * h)) * 2
        right[x] = np.roll(left[x], -d)
    return left.astype(np.float32), right.astype(np.float32)


class TestImageOps:
    def test_rgb_to_grayscale_bit_exact(self):
        img = random_image(9, 11, channels=3)
        got = np.asarray(ops.rgb_to_grayscale(jnp.asarray(img)))
        want = ref.rgb_to_grayscale(img)
        np.testing.assert_array_equal(got, want)

    def test_mean_pool_divisible(self):
        img = random_image(12, 16)
        got = np.asarray(ops.mean_pool(jnp.asarray(img), 2))
        want = ref.mean_pool(img, 2)
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_mean_pool_non_divisible_edge_replicates(self):
        img = random_image(13, 17)
        got = np.asarray(ops.mean_pool(jnp.asarray(img), 4))
        want = ref.mean_pool(img, 4)
        assert got.shape == (4, 5)
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_rescale_generated_view(self):
        x = np.array([[-0.5, 0.0, 0.5, 1.0, 2.0]], np.float32)[None]
        got = np.asarray(ops.rescale_generated_view(jnp.asarray(x)))
        np.testing.assert_array_equal(got[0, 0], [0.0, 0.5, 128.0, 255.0, 255.0])

    def test_rescale_generated_view_fp32_no_round(self):
        """The reference kernel stores ``min(max(x*255+0.5, 0), 255)`` into an
        **fp32** buffer — there is no floor/round
        (``rescale_generated_view.cu:17-18`` writes the clamped float directly
        into the fp32 ``m_output_buffer``, ``right_view_synthesis.cc:10``).
        Non-half-valued inputs must therefore produce the exact non-integer
        fp32 values, not rounded ones."""
        rng = np.random.default_rng(3)
        x = rng.uniform(-0.2, 1.2, (3, 4, 5)).astype(np.float32)
        got = np.asarray(ops.rescale_generated_view(jnp.asarray(x)))
        want = np.minimum(np.maximum(x * np.float32(255.0) + np.float32(0.5),
                                     np.float32(0.0)), np.float32(255.0))
        np.testing.assert_array_equal(got, want)
        interior = (got > 0) & (got < 255)
        assert not np.all(got[interior] == np.round(got[interior]))

    def test_grayscale_gradient_shape(self):
        img = random_image(16, 16)
        got = np.asarray(ops.grayscale_gradient(jnp.asarray(img)))
        assert got.shape == img.shape
        assert np.all(got >= 0)


class TestBoxFilter:
    @pytest.mark.parametrize("radius", [1, 3])
    def test_wrap_box_sum_matches_naive(self, radius):
        x = random_image(10, 14)
        got = np.asarray(ops.box_sum_2d(jnp.asarray(x), radius, radius))
        want = np.zeros_like(x)
        h, w = x.shape
        for i in range(-radius, radius + 1):
            for j in range(-radius, radius + 1):
                want += np.roll(x, (-i, -j), (0, 1))
        np.testing.assert_array_equal(got, want)


class TestCostVolume:
    def test_matches_oracle(self):
        left, right = stereo_pair(12, 16, 6)
        got = np.asarray(ops.sad_cost_volume(jnp.asarray(left), jnp.asarray(right),
                                             0, 6, 1))
        want = ref.cost_volume(left, right, 0, 6, 1)
        np.testing.assert_array_equal(got, want)

    def test_nonzero_min_disparity(self):
        left, right = stereo_pair(8, 16, 4)
        got = np.asarray(ops.sad_cost_volume(jnp.asarray(left), jnp.asarray(right),
                                             2, 5, 1))
        want = ref.cost_volume(left, right, 2, 5, 1)
        np.testing.assert_array_equal(got, want)


class TestAggregation:
    def test_matches_oracle(self):
        cv = RNG.integers(0, 2296, size=(8, 10, 4)).astype(np.float32)
        got = np.asarray(ops.mbm_aggregate(jnp.asarray(cv), 1, 2, 3))
        want = ref.mbm_aggregate(cv, 1, 2, 3)
        np.testing.assert_array_equal(got, want)


class TestWTA:
    def test_matches_oracle_and_tie_breaking(self):
        av = RNG.integers(0, 100, size=(6, 7, 5)).astype(np.float32)
        av[0, 0, :] = 3.0   # all-tie row: first index wins
        av[1, 1, :] = 0.0   # all-zero row: reference init keeps d = 0
        got = np.asarray(ops.wta_disparity(jnp.asarray(av), 2))
        want = ref.wta(av, 2)
        np.testing.assert_array_equal(got, want)
        assert got[0, 0] == 2.0 and got[1, 1] == 2.0


class TestQuadraticPeak:
    def test_matches_oracle_cases(self):
        cases = [
            (5, 10, 6, 8, 4, 7),     # concave: vertex used
            (5, 10, 6, 12, 4, 7),    # rising: vertex of convex combos
            (5, 7, 6, 7, 4, 7),      # flat: a == 0 -> fallback x3
            (5, 1, 6, 9, 4, 2),      # y2 largest
        ]
        for c in cases:
            got = float(ops.quadratic_function_peak(
                *[jnp.float32(v) for v in c]))
            want = float(ref.quadratic_peak(*c))
            assert got == pytest.approx(want, abs=1e-5), c


class TestSecondaryMatching:
    def test_matches_oracle(self):
        k, r_sad, min_d, max_d = 2, 2, 0, 5
        left, right = stereo_pair(16, 24, 2 * max_d)
        left_d = ref.mean_pool(left, k)
        right_d = ref.mean_pool(right, k)
        cv = ref.cost_volume(left_d, right_d, min_d, max_d, 1)
        av = ref.mbm_aggregate(cv, 1, 1, 2)
        disp = ref.wta(av, min_d)

        got = np.asarray(ops.secondary_matching(
            jnp.asarray(left), jnp.asarray(right), jnp.asarray(av),
            jnp.asarray(disp), k, r_sad, min_d))
        want = ref.secondary_matching(left, right, av, disp, r_sad, k, min_d)
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_min_disparity_offset(self):
        k, r_sad, min_d, max_d = 2, 1, 2, 6
        left, right = stereo_pair(12, 24, 2 * max_d)
        left_d = ref.mean_pool(left, k)
        right_d = ref.mean_pool(right, k)
        cv = ref.cost_volume(left_d, right_d, min_d, max_d, 1)
        av = ref.mbm_aggregate(cv, 1, 1, 2)
        disp = ref.wta(av, min_d)

        got = np.asarray(ops.secondary_matching(
            jnp.asarray(left), jnp.asarray(right), jnp.asarray(av),
            jnp.asarray(disp), k, r_sad, min_d))
        want = ref.secondary_matching(left, right, av, disp, r_sad, k, min_d)
        np.testing.assert_allclose(got, want, atol=2e-5)


class TestFills:
    def test_vertical_fill_matches_oracle(self):
        k = 2
        left = random_image(16, 20)
        disp = (RNG.integers(0, 12, size=(8, 10)) / 2.0).astype(np.float32)
        got = np.asarray(ops.upscale_vertical_fill(jnp.asarray(left),
                                                   jnp.asarray(disp), k, 5.0))
        want = ref.upscale_vertical_fill(left, disp, k, 5.0)
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_vertical_fill_k4(self):
        k = 4
        left = random_image(16, 16)
        disp = (RNG.integers(0, 24, size=(4, 4)) / 4.0).astype(np.float32)
        got = np.asarray(ops.upscale_vertical_fill(jnp.asarray(left),
                                                   jnp.asarray(disp), k, 5.0))
        want = ref.upscale_vertical_fill(left, disp, k, 5.0)
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_horizontal_fill_matches_oracle(self):
        k = 2
        left = random_image(12, 20)
        vfilled = (RNG.integers(0, 24, size=(12, 10)) / 2.0).astype(np.float32)
        got = np.asarray(ops.horizontal_fill(jnp.asarray(left),
                                             jnp.asarray(vfilled), k, 5.0))
        want = ref.horizontal_fill(left, vfilled, k, 5.0)
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_horizontal_fill_keeps_grid_columns(self):
        k = 2
        left = random_image(6, 12)
        vfilled = RNG.integers(0, 100, size=(6, 6)).astype(np.float32)
        got = np.asarray(ops.horizontal_fill(jnp.asarray(left),
                                             jnp.asarray(vfilled), k, 5.0))
        np.testing.assert_array_equal(got[:, ::k], vfilled)


class TestEndToEnd:
    def test_full_pipeline_matches_chained_oracle(self):
        cfg = MatchingConfig(height=16, width=32, downscale_factor=2,
                             min_disparity=0, max_disparity=10,
                             cost_patch_radius=1, sad_patch_radius=2,
                             threshold=5, small_mbm_radius=1,
                             mid_mbm_radius=1, large_mbm_radius=2, impl="xla")
        left = random_image(16, 32, channels=3)
        right = np.roll(left, -4, axis=-1).astype(np.float32)

        got = np.asarray(classical.compute_disparity_map(
            jnp.asarray(left), jnp.asarray(right), cfg))

        lg = ref.rgb_to_grayscale(left)
        rg = ref.rgb_to_grayscale(right)
        ld, rd = ref.mean_pool(lg, 2), ref.mean_pool(rg, 2)
        cv = ref.cost_volume(ld, rd, 0, 5, 1)
        av = ref.mbm_aggregate(cv, 1, 1, 2)
        disp = ref.wta(av, 0)
        disp = ref.secondary_matching(lg, rg, av, disp, 2, 2, 0)
        vf = ref.upscale_vertical_fill(lg, disp, 2, 5.0)
        want = ref.horizontal_fill(lg, vf, 2, 5.0)

        assert got.shape == (16, 32)
        np.testing.assert_allclose(got, want, atol=5e-4)

    def test_recovers_constant_disparity(self):
        """A purely shifted pair must produce the true disparity away from
        the wrap-around columns."""
        cfg = MatchingConfig(height=32, width=64, downscale_factor=2,
                             min_disparity=0, max_disparity=16,
                             cost_patch_radius=1, sad_patch_radius=2,
                             threshold=5, small_mbm_radius=1,
                             mid_mbm_radius=2, large_mbm_radius=3, impl="xla")
        left = random_image(32, 64, channels=3)
        true_d = 6
        right = np.roll(left, -true_d, axis=-1).astype(np.float32)
        got = np.asarray(classical.compute_disparity_map(
            jnp.asarray(left), jnp.asarray(right), cfg))
        interior = got[4:-4, 24:-24]
        np.testing.assert_allclose(interior, true_d, atol=0.51)


class TestGatherGuards:
    def test_unroll_ceiling_raises(self):
        from stereo_tpu.ops.gather import take_lane, take_window_lanes

        big = jnp.zeros((2, 2, 600))
        idx = jnp.zeros((2, 2), jnp.int32)
        with pytest.raises(ValueError, match="pallas"):
            take_lane(big, idx)
        with pytest.raises(ValueError, match="pallas"):
            take_window_lanes(big, idx, width=3, step=1)
