"""Pipeline-layer tests: metrics, cameras, hooks, runner, utils."""

import os

import numpy as np
import pytest

from stereo_tpu.core.config import MatchingConfig, PipelineConfig
from stereo_tpu.pipeline import (DepthEstimationPipeline,
                                 extract_config_from_camera, reduce_metrics,
                                 run_depth_estimation_pipeline,
                                 run_depth_estimation_pipeline_batched,
                                 run_depth_estimation_pipeline_evaluation,
                                 validate_pipeline_config_wrt_camera)
from stereo_tpu.pipeline.camera import (EvaluationCamera,
                                        MiddleburyStereoCamera,
                                        load_middlebury_calibration)
from stereo_tpu.pipeline.hooks import (ContextFrameSaver, ContextVideoSaver,
                                       DisparityMapSaver, LambdaHook,
                                       PointCloudSaver)
from stereo_tpu.pipeline.metrics import (D1Metric, MAEMetric, ThresholdMetric,
                                         default_metrics)
from stereo_tpu.utils import image_io, pointcloud

RNG = np.random.default_rng(7)

TINY = MatchingConfig(height=16, width=32, downscale_factor=2,
                      min_disparity=0, max_disparity=8, cost_patch_radius=1,
                      sad_patch_radius=1, threshold=5, small_mbm_radius=1,
                      mid_mbm_radius=1, large_mbm_radius=2)


class FakeStereoCamera(EvaluationCamera):
    """Synthetic camera emitting shifted random pairs + perfect GT."""

    def __init__(self, n_frames=2, h=16, w=32, disparity=4):
        self._n = n_frames
        self._h, self._w, self._d = h, w, disparity
        self._frames = [RNG.integers(0, 256, (3, h, w)).astype(np.float32)
                        for _ in range(n_frames)]

    def focal_length(self):
        return 100.0

    def baseline(self):
        return 0.5

    def get_image_shape(self):
        return (self._h, self._w)

    def get_disparity_boundaries(self):
        return (0, 8)

    def stream_image_pairs(self):
        for left in self._frames:
            yield left, np.roll(left, -self._d, axis=-1)

    def stream_image_pairs_with_gt_disparity(self):
        for left, right in self.stream_image_pairs():
            gt = np.full((self._h, self._w), float(self._d), np.float32)
            yield left, right, gt


class TestMetrics:
    def test_d1_manual(self):
        est = np.array([[1.0, 10.0, 5.0, 7.0]], np.float32)
        gt = np.array([[1.0, 5.0, 5.0, 100.0]], np.float32)
        mask = np.array([[True, True, True, False]])
        # only pixel 1 errs by >3 and >5%: D1 = 1/3
        assert D1Metric().process(est, gt, mask) == pytest.approx(1 / 3)

    def test_threshold_and_name(self):
        est = np.array([[0.0, 3.0, 9.0]], np.float32)
        gt = np.array([[1.0, 1.0, 1.0]], np.float32)
        mask = np.ones_like(gt, bool)
        m = ThresholdMetric(2)
        assert m.name() == "Threshold_2"
        assert m.process(est, gt, mask) == pytest.approx(1 / 3)

    def test_mae_masked(self):
        est = np.array([[2.0, 4.0]], np.float32)
        gt = np.array([[1.0, 0.0]], np.float32)
        mask = np.array([[True, False]])
        assert MAEMetric().process(est, gt, mask) == pytest.approx(1.0)

    def test_default_metrics_names(self):
        names = [m.name() for m in default_metrics()]
        assert names == ["D1", "Threshold_1", "Threshold_2", "Threshold_3",
                         "Threshold_5", "MAE"]

    def test_reduce(self):
        r = reduce_metrics({"a": [1.0, 3.0]}, "mean")
        assert r == {"a": 2.0}
        assert reduce_metrics({"a": [1.0, 3.0]}, "sum") == {"a": 4.0}


class TestMiddleburyCalib:
    CALIB = """cam0=[100.5 0 50; 0 101.5 40; 0 0 1]
cam1=[100.5 0 50; 0 101.5 40; 0 0 1]
doffs=0
baseline=20.5
width=32
height=16
ndisp=10
vmin=2
vmax=8
"""

    def _scene(self, tmp_path):
        left = RNG.integers(0, 256, (16, 32, 3)).astype(np.uint8)
        from PIL import Image
        Image.fromarray(left).save(tmp_path / "im0.png")
        Image.fromarray(left).save(tmp_path / "im1.png")
        (tmp_path / "calib.txt").write_text(self.CALIB)
        return str(tmp_path)

    def test_parse(self, tmp_path):
        (tmp_path / "calib.txt").write_text(self.CALIB)
        calib = load_middlebury_calibration(str(tmp_path / "calib.txt"))
        assert calib.fx == 100.5 and calib.fy == 101.5
        assert calib.get_principal_point() == (50.0, 40.0)
        assert (calib.vmin, calib.vmax) == (2, 8)

    def test_camera(self, tmp_path):
        cam = MiddleburyStereoCamera(self._scene(tmp_path))
        assert cam.get_image_shape() == (16, 32)
        assert cam.get_disparity_boundaries() == (2, 8)
        assert cam.focal_length() == 100.5 and cam.baseline() == 20.5
        pairs = list(cam.stream_image_pairs())
        assert len(pairs) == 1
        assert pairs[0][0].shape == (3, 16, 32)
        assert pairs[0][1] is not None


class TestRunner:
    def _pipeline(self):
        cfg = PipelineConfig(image_shape=(16, 32), min_disparity=0,
                             max_disparity=8, matching=TINY,
                             stereo_matching_backend="classical")
        return DepthEstimationPipeline(cfg)

    def test_extract_and_validate(self):
        cam = FakeStereoCamera()
        cfg = extract_config_from_camera(cam)
        assert cfg.image_shape == (16, 32)
        assert (cfg.min_disparity, cfg.max_disparity) == (0, 8)
        validate_pipeline_config_wrt_camera(cfg, cam)
        bad = cfg.update(image_shape=(8, 8))
        with pytest.raises(RuntimeError):
            validate_pipeline_config_wrt_camera(bad, cam)

    def test_compute_dtype_validation(self):
        assert PipelineConfig(compute_dtype="bfloat16").compute_dtype == \
            "bfloat16"
        with pytest.raises(ValueError):
            PipelineConfig(compute_dtype="float16")

    def test_run_with_hooks(self):
        cam = FakeStereoCamera(n_frames=3)
        pipeline = self._pipeline()
        seen = []
        run_depth_estimation_pipeline(cam, pipeline,
                                      [LambdaHook(lambda c: seen.append(c))])
        assert [c.frame_index for c in sorted(seen, key=lambda c: c.frame_index)] == [0, 1, 2]
        assert all(c.disparity_map.shape == (16, 32) for c in seen)

    def test_batched_matches_per_frame(self):
        cam = FakeStereoCamera(n_frames=3)
        pipeline = self._pipeline()
        single, batched = [], []
        run_depth_estimation_pipeline(cam, pipeline,
                                      [LambdaHook(lambda c: single.append(
                                          np.asarray(c.disparity_map)))])
        run_depth_estimation_pipeline_batched(
            cam, pipeline, batch_size=2,
            hooks=[LambdaHook(lambda c: batched.append(
                (c.frame_index, np.asarray(c.disparity_map))))])
        batched = [d for _, d in sorted(batched, key=lambda t: t[0])]
        assert len(batched) == 3
        for a, b in zip(single, batched):
            np.testing.assert_allclose(a, b, atol=1e-5)

    def test_evaluation_recovers_disparity(self):
        cam = FakeStereoCamera(n_frames=2, disparity=4)
        pipeline = self._pipeline()
        results = run_depth_estimation_pipeline_evaluation(
            cam, pipeline, default_metrics(), verbose=False)
        # wrap-around columns dominate the error budget; the bulk must match
        assert results["MAE"] < 1.5
        assert results["D1"] < 0.30
        assert set(results) == {"D1", "Threshold_1", "Threshold_2",
                                "Threshold_3", "Threshold_5", "MAE"}


class TestHooks:
    def _context(self):
        from stereo_tpu.pipeline.depth_pipeline import DepthEstimationPipelineContext
        return DepthEstimationPipelineContext(
            disparity_map=np.full((8, 12), 4.0, np.float32),
            left_image=RNG.integers(0, 256, (3, 8, 12)).astype(np.float32),
            right_image=RNG.integers(0, 256, (3, 8, 12)).astype(np.float32),
            config=PipelineConfig(image_shape=(8, 12)), frame_index=0)

    def test_disparity_saver(self, tmp_path):
        hook = DisparityMapSaver(str(tmp_path))
        hook.process(self._context())
        files = [f for _, _, fs in os.walk(tmp_path) for f in fs]
        assert files == ["disparity_map_000000.png"]

    def test_context_frame_saver(self, tmp_path):
        hook = ContextFrameSaver(str(tmp_path))
        hook.process(self._context())
        files = [f for _, _, fs in os.walk(tmp_path) for f in fs]
        assert files == ["context_frame_000000.png"]

    def test_point_cloud_saver_roundtrip(self, tmp_path):
        hook = PointCloudSaver(focal_length=100.0, baseline=0.5,
                               save_dir=str(tmp_path), invalid_disparity=-1.0)
        hook.process(self._context())
        plys = [os.path.join(r, f) for r, _, fs in os.walk(tmp_path)
                for f in fs if f.endswith(".ply")]
        assert len(plys) == 1
        pts = pointcloud.read_ply(plys[0])
        assert pts.shape == (8 * 12, 3)
        np.testing.assert_allclose(pts[:, 2], 100.0 * 0.5 / 4.0)

    def test_video_saver(self, tmp_path):
        path = str(tmp_path / "out" / "video.mp4")
        hook = ContextVideoSaver(path, fps=5)
        ctx = self._context()
        for i in range(3):
            ctx.frame_index = i
            hook.process(ctx)
        hook.on_pipeline_end()
        assert os.path.exists(path) and os.path.getsize(path) > 0


class TestImageIO:
    def test_read_write_roundtrip(self, tmp_path):
        img = RNG.integers(0, 256, (3, 6, 8)).astype(np.float32)
        p = str(tmp_path / "x.png")
        image_io.write_image_chw(p, img)
        back = image_io.read_image_chw(p)
        np.testing.assert_array_equal(back, img)

    def test_pad_image_order(self):
        img = np.ones((3, 4, 5), np.float32)
        out = image_io.pad_image(img, 1, 2, 3, 4)
        assert out.shape == (3, 4 + 2 + 4, 5 + 1 + 3)
        assert out[0, 0, 0] == 0.0 and out[0, 2, 1] == 1.0

    def test_grid_shape(self):
        imgs = [np.zeros((3, 4, 6)), np.zeros((4, 6))]
        grid = image_io.make_image_grid(image_io.prepare_image_grid(
            [i for i in imgs]), padding=2, pad_value=1.0)
        assert grid.shape == (3, 2 * 4 + 3 * 2, 6 + 2 * 2)

    def test_video_saver_out_of_order_frames(self, tmp_path):
        """Hook tasks can complete out of order on the thread pool; the
        streamed writer must still emit frames in index order."""
        import cv2

        from stereo_tpu.pipeline.depth_pipeline import DepthEstimationPipelineContext

        path = str(tmp_path / "video.mp4")
        hook = ContextVideoSaver(path, fps=5)
        levels = [0.0, 100.0, 200.0]
        contexts = []
        for i, level in enumerate(levels):
            img = np.full((3, 8, 12), level, np.float32)
            contexts.append(DepthEstimationPipelineContext(
                disparity_map=np.full((8, 12), level, np.float32),
                left_image=img, right_image=img,
                config=PipelineConfig(image_shape=(8, 12)), frame_index=i))
        for i in (2, 0, 1):   # deliver out of order
            hook.process(contexts[i])
        hook.on_pipeline_end()

        cap = cv2.VideoCapture(path)
        means = []
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            means.append(frame.mean())
        cap.release()
        assert len(means) == 3
        # dark -> mid -> bright despite out-of-order delivery
        assert means[0] < means[1] < means[2]


class TestRunnerErrorPaths:
    def _pipeline(self):
        cfg = PipelineConfig(image_shape=(16, 32), min_disparity=0,
                             max_disparity=8, matching=TINY,
                             stereo_matching_backend="classical")
        return DepthEstimationPipeline(cfg)

    def test_hook_exception_surfaces(self):
        class Boom(Exception):
            pass

        def explode(context):
            raise Boom("hook failed")

        cam = FakeStereoCamera(n_frames=3)
        with pytest.raises(Boom):
            run_depth_estimation_pipeline(cam, self._pipeline(),
                                          [LambdaHook(explode)])

    def test_batched_mixed_right_views_raises(self):
        class MixedCamera(FakeStereoCamera):
            def stream_image_pairs(self):
                for i, (left, right) in enumerate(
                        super().stream_image_pairs()):
                    yield left, (right if i == 0 else None)

        cam = MixedCamera(n_frames=2)
        with pytest.raises(RuntimeError, match="Mixed batch"):
            run_depth_estimation_pipeline_batched(cam, self._pipeline(),
                                                  batch_size=2)


class TestFusedSingleViewRouting:
    """The TPU fast path (``pipeline/single_view.py``) is gated on
    ``synthesis.split_inference`` (TPU-only); forcing the flag on CPU runs
    the merged executable with interpret-mode Pallas and exercises the
    pipeline's routing + stage timing."""

    def _small_rvs(self, split):
        import jax

        from stereo_tpu.models import Deep3D
        from stereo_tpu.synthesis import RightViewSynthesis

        full = np.zeros((1, 3, 128, 256), np.float32)
        down = np.zeros((1, 3, 32, 64), np.float32)
        variables = Deep3D().init(jax.random.PRNGKey(0), full, down,
                                  train=False)
        rvs = RightViewSynthesis(output_shape=(48, 96), variables=variables,
                                 model_full_shape=(128, 256),
                                 model_down_shape=(32, 64))
        rvs.split_inference = split
        return rvs

    def _config(self):
        small = MatchingConfig(height=48, width=96, downscale_factor=2,
                               min_disparity=0, max_disparity=15,
                               cost_patch_radius=1, sad_patch_radius=2,
                               threshold=5, small_mbm_radius=1,
                               mid_mbm_radius=1, large_mbm_radius=2)
        return PipelineConfig(image_shape=(48, 96), min_disparity=0,
                              max_disparity=15, matching=small,
                              stereo_matching_backend="classical")

    def test_process_routes_through_fused_engine(self):
        pipe = DepthEstimationPipeline(self._config(),
                                       synthesis=self._small_rvs(True))
        left = np.random.default_rng(3).integers(
            0, 256, (3, 48, 96)).astype(np.float32)
        res = pipe.process(left)
        engine = getattr(pipe, "_fused_sv_engine", None)
        assert engine is not None, "fused path did not activate"
        assert res.disparity_map.shape == (48, 96)
        assert res.right_image.shape == (3, 48, 96)
        # identical to the engine called directly
        disp, right = engine.process(left)
        np.testing.assert_array_equal(np.asarray(res.disparity_map),
                                      np.asarray(disp))
        np.testing.assert_array_equal(np.asarray(res.right_image),
                                      np.asarray(right))
        # both logical stages got timed
        times = pipe.stage_times()
        assert set(times) >= {"right_view_generation", "stereo_matching"}

    def test_split_off_keeps_classic_route(self):
        pipe = DepthEstimationPipeline(self._config(),
                                       synthesis=self._small_rvs(False))
        left = np.random.default_rng(4).integers(
            0, 256, (3, 48, 96)).astype(np.float32)
        res = pipe.process(left)
        assert getattr(pipe, "_fused_sv_engine", None) is None
        assert res.disparity_map.shape == (48, 96)

    def test_process_batch_routes_through_fused_engine(self):
        pipe = DepthEstimationPipeline(self._config(),
                                       synthesis=self._small_rvs(True))
        left = np.random.default_rng(5).integers(
            0, 256, (2, 3, 48, 96)).astype(np.float32)
        res = pipe.process_batch(left)
        assert getattr(pipe, "_fused_sv_engine", None) is not None
        assert res.disparity_map.shape == (2, 48, 96)
        assert res.right_image.shape == (2, 3, 48, 96)
