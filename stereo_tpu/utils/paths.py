"""Project-relative paths and run-directory helpers.

Parity with the reference's ``helpers/paths.py:4-14`` (project root constant,
model artifact locations, timestamped output folders), adapted to the JAX
framework: "traced model" artifacts are Orbax checkpoint directories instead
of TorchScript files.
"""

from __future__ import annotations

import os
from datetime import datetime

PROJECT_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
PACKAGE_ROOT = os.path.join(PROJECT_ROOT, "stereo_tpu")
DATA_ROOT = os.path.join(PROJECT_ROOT, "data")

# Trained right-view-synthesis (Deep3D) parameters; the analog of the
# reference's ``DEEP3D_MODEL_WEIGHTS_PATH`` / ``DEEP3D_MODEL_TRACE_PATH``.
DEEP3D_CHECKPOINT_DIR = os.path.join(DATA_ROOT, "checkpoints", "deep3d")
MODEL_CHECKPOINT_ROOT = os.path.join(DATA_ROOT, "checkpoints")

# The reference repo ships one Middlebury-style demo pair + calib under
# ``src/python/data`` — if that tree is mounted we use it for demos/goldens.
REFERENCE_DEMO_DIR = "/root/reference/src/python/data"


def project_relative_path(*parts: str) -> str:
    return os.path.join(PROJECT_ROOT, *parts)


def data_path(*parts: str) -> str:
    return os.path.join(DATA_ROOT, *parts)


def model_checkpoint_dir(model_name: str) -> str:
    return os.path.join(MODEL_CHECKPOINT_ROOT, model_name)


def timestamp_folder_name() -> str:
    return datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
