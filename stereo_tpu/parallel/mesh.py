"""Device-mesh construction and sharding helpers.

The reference's only multi-device construct is ``torch.nn.DataParallel``
(``pipeline/synthesis/trainer.py:36``); everything else is single-GPU CUDA
(SURVEY.md §2.4).  The TPU-native parallelism model is a named mesh:

* ``data`` — batch/video frames (DCN-friendly across hosts),
* ``tile`` — image scanline tiles (ICI neighbor halo exchange),
* ``disp`` — disparity-axis shards (ICI argmax reduction).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import MeshConfig

MESH_AXES = ("data", "tile", "disp")


def make_mesh(config: MeshConfig, devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, tile, disp) mesh from the first
    ``config.num_devices`` available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = config.num_devices
    if len(devices) < n:
        raise RuntimeError(
            f"MeshConfig wants {n} devices but only {len(devices)} present.")
    grid = np.array(devices[:n]).reshape(config.data, config.tile, config.disp)
    return Mesh(grid, MESH_AXES)


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host bring-up (``jax.distributed``).  No-op when single-host
    args are absent — call unconditionally from launchers."""
    if coordinator_address is None:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """(N, ...) frame batches sharded over the data axis."""
    return NamedSharding(mesh, P("data"))


def image_row_sharding(mesh: Mesh) -> NamedSharding:
    """(..., H, W) images sharded by scanline tiles."""
    return NamedSharding(mesh, P(None, "tile", None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
