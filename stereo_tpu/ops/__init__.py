"""Stage ops for the classical engine and DNN building blocks.

Every op has a pure ``jax.numpy`` implementation (the correctness oracle,
already TPU-ready through XLA) and, for the hot stages, a hand-written
Pallas kernel under ``stereo_tpu.ops.pallas``.
"""

from .imageops import (grayscale_gradient, mean_pool, rescale_generated_view,
                       rgb_to_grayscale)
from .boxfilter import box_sum_1d, box_sum_2d, wrap_pad
from .cost_volume import sad_cost_volume, sad_similarity_plane, MAX_INTENSITY
from .aggregation import mbm_aggregate
from .wta import wta_disparity
from .refinement import (quadratic_function_peak, sampled_sad_volume,
                         secondary_matching)
from .fills import horizontal_fill, upscale_vertical_fill
from .shift_stack import disparity_shift_stack, weighted_shift_sum

__all__ = [
    "grayscale_gradient", "mean_pool", "rescale_generated_view",
    "rgb_to_grayscale", "box_sum_1d", "box_sum_2d", "wrap_pad",
    "sad_cost_volume", "sad_similarity_plane", "MAX_INTENSITY",
    "mbm_aggregate", "wta_disparity", "quadratic_function_peak",
    "sampled_sad_volume", "secondary_matching", "horizontal_fill",
    "upscale_vertical_fill", "disparity_shift_stack", "weighted_shift_sum",
]
