"""Evaluation metrics: D1, Threshold_t, MAE.

Parity with the reference's ``pipeline/depth_estimation_pipeline_metrics.py``
(D1 ``:18-28``, Threshold ``:31-45``, MAE ``:48-56``), re-expressed as
masked reductions so they are jit-compatible (boolean indexing is replaced
by mask-weighted means over static shapes — same value, TPU-friendly).
"""

from __future__ import annotations

from abc import ABC, abstractmethod

import jax
import jax.numpy as jnp


def _masked_mean(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    weight = mask.astype(values.dtype)
    count = jnp.maximum(weight.sum(), 1.0)
    return (values * weight).sum() / count


class DepthEstimationPipelineMetric(ABC):
    """A scalar metric over (estimate, ground truth, validity mask)."""

    @abstractmethod
    def process(self, disparity_estimate, disparity_gt, mask) -> float:
        ...

    @abstractmethod
    def name(self) -> str:
        ...


class D1Metric(DepthEstimationPipelineMetric):
    """KITTI D1: fraction of masked pixels with error > 3px AND > 5% of gt."""

    def process(self, disparity_estimate, disparity_gt, mask) -> float:
        return float(_d1(jnp.asarray(disparity_estimate),
                         jnp.asarray(disparity_gt), jnp.asarray(mask)))

    def name(self) -> str:
        return "D1"


class ThresholdMetric(DepthEstimationPipelineMetric):
    """Fraction of masked pixels with absolute error > threshold."""

    def __init__(self, threshold: float):
        self._threshold = float(threshold)

    def process(self, disparity_estimate, disparity_gt, mask) -> float:
        return float(_threshold(jnp.asarray(disparity_estimate),
                                jnp.asarray(disparity_gt), jnp.asarray(mask),
                                self._threshold))

    def name(self) -> str:
        return f"Threshold_{int(self._threshold)}"


class MAEMetric(DepthEstimationPipelineMetric):
    """Mean absolute disparity error over masked pixels."""

    def process(self, disparity_estimate, disparity_gt, mask) -> float:
        return float(_mae(jnp.asarray(disparity_estimate),
                          jnp.asarray(disparity_gt), jnp.asarray(mask)))

    def name(self) -> str:
        return "MAE"


@jax.jit
def _d1(est, gt, mask):
    err = jnp.abs(est - gt)
    bad = (err > 3.0) & (err / jnp.abs(gt) > 0.05)
    return _masked_mean(bad.astype(jnp.float32), mask)


@jax.jit
def _mae(est, gt, mask):
    return _masked_mean(jnp.abs(est - gt), mask)


def _threshold(est, gt, mask, t):
    return _threshold_jit(est, gt, mask, jnp.float32(t))


@jax.jit
def _threshold_jit(est, gt, mask, t):
    return _masked_mean((jnp.abs(est - gt) > t).astype(jnp.float32), mask)


def default_metrics():
    """The six metrics the reference's evaluation script reports
    (``scripts/evaluate_depth_estimation_pipeline.py:30-43``)."""
    return [D1Metric(), ThresholdMetric(1), ThresholdMetric(2),
            ThresholdMetric(3), ThresholdMetric(5), MAEMetric()]
