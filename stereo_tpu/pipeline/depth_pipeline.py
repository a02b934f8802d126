"""Depth-estimation pipeline core: config dispatch + single-call processing.

Parity with the reference's ``pipeline/depth_estimation_pipeline.py``:
``DepthEstimationPipeline.process(left, right=None)`` optionally synthesizes
the right view (Deep3D) then runs the selected stereo-matching backend,
timing both stages when ``log_perf_time`` is set (``:55-66``).

TPU-native differences:
* the classical backend is a single jitted XLA graph, not 8 kernel launches;
* right-view synthesis is constructed lazily on the first single-view frame
  (the reference always constructs it, ``:51``), so stereo-pair runs never
  pay Deep3D init;
* ``process_batch`` runs a whole batch of frames through one batched jitted graph —
  the unit of data parallelism on TPU.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..core.config import PipelineConfig
from ..utils.profiling import StageTimer, perf_clock
from .backends import (AVAILABLE_DNN_BACKENDS, ClassicalStereoBackend,
                       DnnStereoMatchingBackend, StereoMatchingBackend)


@dataclasses.dataclass
class DepthEstimationResult:
    """Outputs of one ``process`` call (parity: reference ``:31-35``)."""

    left_image: jax.Array
    right_image: jax.Array
    disparity_map: jax.Array


@dataclasses.dataclass
class DepthEstimationPipelineContext:
    """Per-frame context passed to hooks (parity: reference ``:38-44``)."""

    disparity_map: jax.Array
    left_image: jax.Array
    right_image: jax.Array
    config: PipelineConfig
    frame_index: int


class DepthEstimationPipeline:

    def __init__(self, config: PipelineConfig = PipelineConfig(),
                 synthesis=None):
        self._config = config
        self._right_view_synthesis = synthesis
        self._stereo_matching = self._build_backend()
        self._timer = StageTimer()
        print(f"Using '{config.stereo_matching_backend}' as stereo matching backend.")

    def get_configuration(self) -> PipelineConfig:
        return self._config

    @property
    def stereo_matching(self) -> StereoMatchingBackend:
        return self._stereo_matching

    def process(self, left_image, right_image=None) -> DepthEstimationResult:
        """One frame: (3, H, W) float RGB (0..255) -> disparity (H, W)."""
        cfg = self._config
        if right_image is None and self._fused_single_view() is not None:
            # TPU fast path: Deep3D net + ONE merged (blend tail + matcher)
            # executable — two dispatches per frame instead of three
            # (``pipeline/single_view.py``).  The merged executable spans
            # both logical stages, so its wall time is attributed to
            # "stereo_matching" (the blend tail is ~0.4 of its ~1.9 ms).
            engine = self._fused_single_view()
            # With log_perf_time the timed stages block on their outputs so
            # the clocks record device time; the default path keeps JAX's
            # async dispatch (the timers then record enqueue time only).
            with self._timer.stage("right_view_generation"):
                with perf_clock("Right view generation", cfg.log_perf_time):
                    left = jnp.asarray(left_image, jnp.float32)[None]
                    prob_low, full01 = engine._fn_net(
                        engine.synthesis.variables, left)
                    if cfg.log_perf_time:
                        jax.block_until_ready((prob_low, full01))
            with self._timer.stage("stereo_matching"):
                with perf_clock("Stereo matching", cfg.log_perf_time):
                    disparity, right = engine._fn_tail_match(prob_low,
                                                             full01, left)
                    if cfg.log_perf_time:
                        jax.block_until_ready(disparity)
            return DepthEstimationResult(left_image=left_image,
                                         right_image=right[0],
                                         disparity_map=disparity[0])
        with self._timer.stage("right_view_generation"):
            with perf_clock("Right view generation", cfg.log_perf_time):
                if right_image is None:
                    right_image = self._synthesis().process(left_image)
        with self._timer.stage("stereo_matching"):
            with perf_clock("Stereo matching", cfg.log_perf_time):
                disparity_map = self._stereo_matching.process(left_image,
                                                             right_image)
        return DepthEstimationResult(left_image=left_image,
                                     right_image=right_image,
                                     disparity_map=disparity_map)

    def process_batch(self, left_batch, right_batch=None) -> DepthEstimationResult:
        """A batch of frames: (N, 3, H, W) -> (N, H, W) disparities.

        Under a multi-device mesh with the classical backend, the
        single-view path (``right_batch=None`` — the reference's headline
        scenario, ``api.py:25-31``) runs RVS + matching as ONE sharded
        graph (``parallel/synthesis.py``): Deep3D GSPMD-partitioned over
        batch x rows, the matcher frame-parallel per shard."""
        cfg = self._config
        if (right_batch is None and cfg.mesh is not None
                and cfg.mesh.num_devices > 1
                and cfg.stereo_matching_backend in ("classical", "cuda")):
            disparity, right_batch = self._sharded_single_view().process_batch(
                left_batch, return_right=True)
            return DepthEstimationResult(left_image=left_batch,
                                         right_image=right_batch,
                                         disparity_map=disparity)
        if right_batch is None and self._fused_single_view() is not None:
            disparity, right_batch = self._fused_single_view().process_batch(
                left_batch)
            return DepthEstimationResult(left_image=left_batch,
                                         right_image=right_batch,
                                         disparity_map=disparity)
        if right_batch is None:
            right_batch = self._synthesis().process_batch(left_batch)
        disparity = self._stereo_matching.process_batch(left_batch, right_batch)
        return DepthEstimationResult(left_image=left_batch,
                                     right_image=right_batch,
                                     disparity_map=disparity)

    def stage_times(self) -> dict:
        """Mean seconds per stage across all processed frames.

        On the fused single-view fast path the stages are async-dispatched:
        without ``log_perf_time`` these are enqueue times, not device times
        (set ``log_perf_time=True`` to make the timed stages block on their
        outputs)."""
        return self._timer.summary()

    # ------------------------------------------------------------------
    def _build_backend(self) -> StereoMatchingBackend:
        cfg = self._config
        name = cfg.stereo_matching_backend
        if name in AVAILABLE_DNN_BACKENDS:
            # Cost-volume depth follows the camera's disparity range (div-4
            # for the 1/4-resolution volume); the networks are fully
            # convolutional so the same parameters serve any depth.
            model_d = max(32, -(-int(cfg.max_disparity) // 4) * 4)
            if cfg.mesh is not None and cfg.mesh.num_devices > 1:
                from .backends import ShardedDnnBackend
                return ShardedDnnBackend(name, image_shape=cfg.image_shape,
                                         mesh_config=cfg.mesh,
                                         max_disparity=model_d,
                                         compute_dtype=cfg.compute_dtype)
            return DnnStereoMatchingBackend(name, image_shape=cfg.image_shape,
                                            max_disparity=model_d,
                                            compute_dtype=cfg.compute_dtype)
        if name in ("classical", "cuda"):  # "cuda" kept as a parity alias
            if cfg.mesh is not None and cfg.mesh.num_devices > 1:
                from .backends import ShardedClassicalBackend
                return ShardedClassicalBackend(cfg.matching_config(), cfg.mesh)
            return ClassicalStereoBackend(cfg.matching_config())
        raise RuntimeError(f"Unsupported stereo matching backend: {name}")

    def _synthesis(self):
        if self._right_view_synthesis is None:
            from ..synthesis import RightViewSynthesis
            self._right_view_synthesis = RightViewSynthesis(
                output_shape=self._config.image_shape,
                compute_dtype=self._config.compute_dtype,
                checkpoint_dir=self._config.rvs_checkpoint)
        self._check_disparity_coverage(self._right_view_synthesis)
        return self._right_view_synthesis

    def _check_disparity_coverage(self, synthesis) -> None:
        """Disparity-coverage guard: the synthesized view is blended at
        the MODEL's native width from 65 shift channels, then resized
        to the pipeline shape — at output scale it can express at
        most 64 * W_out / W_model px of disparity.  Asking the
        matcher for more than that reads as a catastrophic rvs_on
        accuracy collapse with no error anywhere (the r4 root cause
        of an unreproducible r3 eval record).  Runs once per pipeline, on
        the synthesis object actually in use — injected or lazily built."""
        if getattr(self, "_coverage_checked", False):
            return
        self._coverage_checked = True
        w_model = getattr(synthesis, "model_full_shape", (None, None))[1]
        if not w_model:          # a test double without a model shape
            return
        from ..models.deep3d import NUM_DISPARITY_CHANNELS
        coverage = (NUM_DISPARITY_CHANNELS - 1) * (
            self._config.image_shape[1] / w_model)
        if self._config.max_disparity > coverage + 0.5:
            import warnings
            warnings.warn(
                f"single-view pipeline at {self._config.image_shape} "
                f"asks for disparities up to {self._config.max_disparity}"
                f" but the {w_model}-wide Deep3D checkpoint can "
                f"synthesize at most ~{coverage:.0f} px at this output "
                f"scale; evaluate at the model's native shape",
                stacklevel=4)

    def _fused_single_view(self):
        """The merged tail+matcher engine for the single-device classical
        single-view path, or ``None`` when ineligible (non-classical
        backend, multi-device mesh, or no TPU split inference)."""
        if getattr(self, "_fused_sv_engine", None) is not None:
            return self._fused_sv_engine
        cfg = self._config
        if cfg.stereo_matching_backend not in ("classical", "cuda"):
            return None
        if cfg.mesh is not None and cfg.mesh.num_devices > 1:
            return None
        if not self._synthesis().split_inference:
            return None
        from .single_view import FusedSingleViewEngine
        self._fused_sv_engine = FusedSingleViewEngine(
            cfg.matching_config(), self._synthesis())
        return self._fused_sv_engine

    def _sharded_single_view(self):
        if getattr(self, "_sharded_sv_engine", None) is None:
            from ..parallel import ShardedSingleViewEngine
            self._sharded_sv_engine = ShardedSingleViewEngine(
                self._config.matching_config(), self._config.mesh,
                synthesis=self._right_view_synthesis,
                checkpoint_dir=self._config.rvs_checkpoint,
                compute_dtype=self._config.compute_dtype)
            self._right_view_synthesis = self._sharded_sv_engine.synthesis
        return self._sharded_sv_engine
