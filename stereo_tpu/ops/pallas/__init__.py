from . import classical_fused
from .kernels import matching_core, sampled_window

__all__ = ["classical_fused", "matching_core", "sampled_window"]
