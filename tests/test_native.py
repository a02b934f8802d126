"""Native host-runtime tests: PNG decode, layout ops, prefetcher — all
validated against PIL/NumPy references."""

import numpy as np
import pytest
from PIL import Image

from stereo_tpu import _native

pytestmark = pytest.mark.skipif(
    not _native.available(),
    reason=f"native library unavailable: {_native.build_error()}")

RNG = np.random.default_rng(5)


def _save_png(path, arr):
    Image.fromarray(arr).save(path)
    return str(path)


class TestPngDecode:
    @pytest.mark.parametrize("mode,channels", [("RGB", 3), ("L", 1),
                                               ("RGBA", 4)])
    def test_matches_pil(self, tmp_path, mode, channels):
        if mode == "L":
            arr = RNG.integers(0, 256, (37, 53)).astype(np.uint8)
        else:
            arr = RNG.integers(0, 256, (37, 53, channels)).astype(np.uint8)
        path = _save_png(tmp_path / "x.png", arr)
        got = _native.decode_png_padded_chw(path)
        assert got is not None and got.shape == (3, 37, 53)
        want = np.asarray(Image.open(path).convert("RGB"),
                          np.float32).transpose(2, 0, 1)
        np.testing.assert_array_equal(got, want)

    def test_padding_and_scale(self, tmp_path):
        arr = RNG.integers(0, 256, (8, 12, 3)).astype(np.uint8)
        path = _save_png(tmp_path / "x.png", arr)
        got = _native.decode_png_padded_chw(path, pad=(19, 5, 19, 4),
                                            scale=1 / 255.0)
        assert got.shape == (3, 5 + 8 + 4, 19 + 12 + 19)
        assert got[0, 0, 0] == 0.0
        want = arr.astype(np.float32).transpose(2, 0, 1) / 255.0
        np.testing.assert_allclose(got[:, 5:13, 19:31], want, rtol=1e-6)

    def test_shape_probe(self, tmp_path):
        arr = RNG.integers(0, 256, (6, 9, 3)).astype(np.uint8)
        path = _save_png(tmp_path / "x.png", arr)
        assert _native.png_shape(path) == (6, 9, 3)

    def test_real_kitti_sized_frame(self, tmp_path):
        arr = RNG.integers(0, 256, (375, 1242, 3)).astype(np.uint8)
        path = _save_png(tmp_path / "kitti.png", arr)
        got = _native.decode_png_padded_chw(path, pad=(19, 5, 19, 4))
        assert got.shape == (3, 384, 1280)


class TestLayoutOps:
    def test_hwc_to_padded_chw(self):
        hwc = RNG.integers(0, 256, (7, 9, 3)).astype(np.uint8)
        got = _native.hwc_to_padded_chw(hwc, pad=(1, 2, 3, 4))
        want = np.pad(hwc.astype(np.float32).transpose(2, 0, 1),
                      ((0, 0), (2, 4), (1, 3)))
        np.testing.assert_array_equal(got, want)

    def test_mean_pool_matches_jnp(self):
        hw = RNG.uniform(0, 255, (13, 17)).astype(np.float32)
        from stereo_tpu.ops.imageops import mean_pool as jnp_pool
        np.testing.assert_allclose(_native.mean_pool(hw, 4),
                                   np.asarray(jnp_pool(hw, 4)), rtol=1e-5)

    def test_rgb_to_gray_matches_jnp(self):
        chw = RNG.uniform(0, 255, (3, 6, 8)).astype(np.float32)
        from stereo_tpu.ops.imageops import rgb_to_grayscale
        np.testing.assert_allclose(_native.rgb_to_gray(chw),
                                   np.asarray(rgb_to_grayscale(chw)),
                                   rtol=1e-6)

    def test_resize_bilinear_close_to_jax(self):
        chw = RNG.uniform(0, 255, (3, 16, 24)).astype(np.float32)
        got = _native.resize_bilinear_chw(chw, 8, 12)
        import jax
        want = np.asarray(jax.image.resize(chw, (3, 8, 12), "bilinear"))
        np.testing.assert_allclose(got, want, atol=1e-3)


class TestPrefetcher:
    def test_ordered_stream(self, tmp_path):
        paths = []
        frames = []
        for i in range(7):
            arr = RNG.integers(0, 256, (15, 21, 3)).astype(np.uint8)
            frames.append(arr)
            paths.append(_save_png(tmp_path / f"f{i}.png", arr))
        with _native.FramePrefetcher(paths, pad=(1, 1, 1, 1), slots=3,
                                     threads=2) as pf:
            outs = list(pf)
        assert len(outs) == 7
        for arr, out in zip(frames, outs):
            want = arr.astype(np.float32).transpose(2, 0, 1)
            np.testing.assert_array_equal(out[:, 1:16, 1:22], want)

    def test_error_propagates(self, tmp_path):
        good = _save_png(tmp_path / "good.png",
                         RNG.integers(0, 256, (4, 4, 3)).astype(np.uint8))
        bad = str(tmp_path / "missing.png")
        pf = _native.FramePrefetcher([good, bad], slots=2, threads=1)
        next(pf)
        with pytest.raises(RuntimeError):
            next(pf)
        pf.close()
