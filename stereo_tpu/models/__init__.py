"""Flax stereo/synthesis model registry.

Replaces the reference's traced-TorchScript model registry
(``pipeline/depth/dnn_stereo_matching_backend.py:7-13``): models are native
Flax modules, "traces" are Orbax checkpoints of the variables pytree, and
the compiled artifact is the jitted ``apply``.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .cost_volumes import (build_concat_volume, build_gwc_volume,
                           build_interlaced_volume, disparity_regression,
                           groupwise_correlation)
from .deep3d import Deep3D
from .gwcnet import GWCNET_LOSS_WEIGHTS, GwcNet, gwcnet_loss
from .msnet import MSNET_LOSS_WEIGHTS, MSNet2D, MSNet3D, msnet_loss

_STEREO_MODELS = {
    "gwcnet": GwcNet,
    "msnet2d": MSNet2D,
    "msnet3d": MSNet3D,
}


def build_stereo_model(name: str, max_disparity: int = 192):
    """Construct a stereo network by registry name."""
    try:
        cls = _STEREO_MODELS[name]
    except KeyError:
        raise RuntimeError(f"Unknown stereo model {name!r}; "
                           f"available: {sorted(_STEREO_MODELS)}") from None
    return cls(max_disparity=max_disparity)


def init_stereo_params(model, image_shape: Tuple[int, int], seed: int = 0):
    """Initialize a stereo model's variables for a given image shape.

    Initializes in train mode so the auxiliary-output heads exist — the
    variables then serve both training and inference applies.

    The stereo networks are fully convolutional, so parameters are
    image-shape independent; tracing at a small /32-divisible shape keeps
    init cheap regardless of the serving resolution.  Width must still
    exceed the disparity range so the cost-volume shifts stay non-empty.
    """
    del image_shape
    width = max(128, -(-int(getattr(model, "max_disparity", 64)) // 32) * 32)
    x = jnp.zeros((1, 3, 64, width), jnp.float32)
    key = jax.random.PRNGKey(seed)
    return model.init({"params": key, "dropout": key}, x, x, train=True)


def save_params(variables, checkpoint_dir: str) -> None:
    """Persist a variables pytree with Orbax (the export analog of the
    reference's ``torch.jit.trace`` + ``save``,
    ``scripts/trace_rvs_model_for_cuda_inference.py:7-18``)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(checkpoint_dir)
    checkpointer = ocp.StandardCheckpointer()
    checkpointer.save(path, variables, force=True)
    checkpointer.wait_until_finished()


def load_params(checkpoint_dir: str, template=None):
    """Restore a variables pytree saved by :func:`save_params`."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(checkpoint_dir)
    checkpointer = ocp.StandardCheckpointer()
    if template is not None:
        return checkpointer.restore(path, template)
    return checkpointer.restore(path)


_NPZ_META_PREFIX = "__meta__"


def save_params_npz(variables, npz_path: str, meta=None) -> None:
    """Compact single-file checkpoint: float params stored as float16
    (batch_stats kept float32 — running variances can exceed f16 range),
    zip-compressed.  ~4x smaller than the Orbax tree; the format committed
    to the repo for shipped weights.

    ``meta``: optional dict of small arrays stored alongside the tree
    (e.g. the input resolution a shape-dependent model was trained at).
    """
    import numpy as np

    flat = {}
    for key_path, leaf in jax.tree_util.tree_flatten_with_path(variables)[0]:
        key = jax.tree_util.keystr(key_path)
        arr = np.asarray(leaf)
        if arr.dtype == np.float32 and "batch_stats" not in key:
            arr = arr.astype(np.float16)
        flat[key] = arr
    for name, value in (meta or {}).items():
        flat[_NPZ_META_PREFIX + name] = np.asarray(value)
    os.makedirs(os.path.dirname(os.path.abspath(npz_path)), exist_ok=True)
    np.savez_compressed(npz_path, **flat)


def load_params_npz(npz_path: str):
    """Restore a :func:`save_params_npz` checkpoint (floats back to f32)."""
    import re

    import numpy as np

    data = np.load(npz_path)
    variables: dict = {}
    for key in data.files:
        if key.startswith(_NPZ_META_PREFIX):
            continue
        parts = re.findall(r"\['([^']+)'\]", key)
        node = variables
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        arr = data[key]
        if arr.dtype == np.float16:
            arr = arr.astype(np.float32)
        node[parts[-1]] = jnp.asarray(arr)
    return variables


def load_npz_meta(npz_path: str) -> dict:
    """The ``meta`` dict stored by :func:`save_params_npz` (may be empty)."""
    import numpy as np

    data = np.load(npz_path)
    return {key[len(_NPZ_META_PREFIX):]: np.asarray(data[key])
            for key in data.files if key.startswith(_NPZ_META_PREFIX)}


def _validate_checkpoint_shapes(model, variables, source: str):
    """Fail fast with an actionable message when a checkpoint's parameter
    shapes don't fit this model configuration (e.g. a volume-folding
    network like MSNet2D restored at a different ``max_disparity`` than it
    was trained with) — otherwise flax raises an opaque ScopeParamShapeError
    deep inside the first apply."""
    width = max(128, -(-int(getattr(model, "max_disparity", 64)) // 32) * 32)
    x = jax.ShapeDtypeStruct((1, 3, 64, width), jnp.float32)
    key = jax.random.PRNGKey(0)
    expected = jax.eval_shape(
        lambda a, b: model.init({"params": key, "dropout": key}, a, b,
                                train=True), x, x)
    def as_key(path):
        return "/".join(str(getattr(k, "key", k)) for k in path)

    exp = {as_key(p): v.shape for p, v in
           jax.tree_util.tree_flatten_with_path(expected)[0]}
    got = {as_key(p): jnp.shape(v) for p, v in
           jax.tree_util.tree_flatten_with_path(variables)[0]}
    for path in sorted(set(exp) & set(got)):
        if exp[path] != got[path]:
            pretty = path
            raise ValueError(
                f"Checkpoint {source!r} does not fit this "
                f"{type(model).__name__}(max_disparity="
                f"{getattr(model, 'max_disparity', '?')}): parameter "
                f"{pretty} has shape {got[path]}, expected {exp[path]}. "
                f"Load it with the max_disparity it was trained with, or "
                f"pass params/checkpoint_dir explicitly.")
    return variables


def load_or_init_params(model, name: str, image_shape: Tuple[int, int],
                        checkpoint_dir: Optional[str] = None, seed: int = 0):
    """Restore trained parameters if a checkpoint exists, else initialize.

    Lookup order: explicit ``checkpoint_dir`` arg, then the default
    ``data/checkpoints/<name>`` location.
    """
    from ..utils.paths import model_checkpoint_dir

    candidates = [checkpoint_dir] if checkpoint_dir else []
    candidates.append(model_checkpoint_dir(name))
    for cand in candidates:
        if not cand:
            continue
        if os.path.isfile(cand) and cand.endswith(".npz"):
            return _validate_checkpoint_shapes(model, load_params_npz(cand),
                                               cand)
        npz = cand + ".npz"
        if os.path.isfile(npz):
            return _validate_checkpoint_shapes(model, load_params_npz(npz),
                                               npz)
        if os.path.isdir(cand) and os.listdir(cand):
            return _validate_checkpoint_shapes(model, load_params(cand),
                                               cand)
    return init_stereo_params(model, image_shape, seed)


__all__ = [
    "Deep3D", "GwcNet", "MSNet2D", "MSNet3D",
    "GWCNET_LOSS_WEIGHTS", "MSNET_LOSS_WEIGHTS",
    "gwcnet_loss", "msnet_loss",
    "build_stereo_model", "init_stereo_params", "load_or_init_params",
    "load_params", "save_params",
    "build_concat_volume", "build_gwc_volume", "build_interlaced_volume",
    "disparity_regression", "groupwise_correlation",
]
