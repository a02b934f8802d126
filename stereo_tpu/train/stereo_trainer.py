"""Supervised trainer for the DNN stereo backends (GwcNet / MSNet2D/3D).

The reference has no training loop for these networks (it consumes traced
models only, SURVEY.md §2.3) — weights must be produced here.  Multi-output
smooth-L1 loss per the papers, AdamW, random-crop batches, BatchNorm
statistics carried in the ``batch_stats`` collection, Orbax checkpoints
compatible with ``models.load_or_init_params``.
"""

from __future__ import annotations

import os
import time
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from PIL import Image

from ..core.config import TrainerConfig
from ..models import build_stereo_model, gwcnet_loss, msnet_loss
from ..pipeline.backends import normalize_imagenet

_LOSSES = {"gwcnet": gwcnet_loss, "msnet2d": msnet_loss, "msnet3d": msnet_loss}


class Kitti2015StereoDataset:
    """KITTI-2015-style training triplets: left/right PNGs + uint16 GT
    disparity PNGs (value/256), random-cropped to a fixed (H, W)."""

    def __init__(self, left_paths: Sequence[str], right_paths: Sequence[str],
                 disparity_paths: Sequence[str],
                 crop: Tuple[int, int] = (256, 512)):
        if not (len(left_paths) == len(right_paths) == len(disparity_paths)):
            raise RuntimeError("Mismatched dataset file lists.")
        self.lefts = list(left_paths)
        self.rights = list(right_paths)
        self.disps = list(disparity_paths)
        self.crop = crop

    def __len__(self) -> int:
        return len(self.lefts)

    def load(self, idx: int, rng: np.random.Generator):
        left = _read_chw(self.lefts[idx])
        right = _read_chw(self.rights[idx])
        with Image.open(self.disps[idx]) as im:
            is_uint16 = im.mode in ("I", "I;16", "I;16B", "I;16L")
            disp = np.asarray(im, np.float32)
        if disp.ndim == 3:
            disp = disp[..., 0]
        if is_uint16:                 # KITTI uint16 encoding: value/256 px
            disp = disp / 256.0
        ch, cw = self.crop
        h, w = left.shape[-2:]
        y = int(rng.integers(0, max(1, h - ch + 1)))
        x = int(rng.integers(0, max(1, w - cw + 1)))
        return (left[:, y:y + ch, x:x + cw], right[:, y:y + ch, x:x + cw],
                disp[y:y + ch, x:x + cw])

    def batches(self, batch_size: int, seed: int = 0):
        rng = np.random.default_rng(seed)
        order = rng.permutation(len(self))
        for b in range(len(order) // batch_size):
            idxs = order[b * batch_size:(b + 1) * batch_size]
            items = [self.load(int(i), rng) for i in idxs]
            yield tuple(np.stack(parts) for parts in zip(*items))


def _read_chw(path: str) -> np.ndarray:
    with Image.open(path) as im:
        arr = np.asarray(im.convert("RGB"), dtype=np.float32)
    return np.ascontiguousarray(arr.transpose(2, 0, 1))


class StereoTrainer:
    """Training loop for one stereo network."""

    def __init__(self, model_name: str, max_disparity: int = 192,
                 config: TrainerConfig = TrainerConfig(), variables=None,
                 image_shape: Tuple[int, int] = (256, 512), seed: int = 0):
        self.model_name = model_name
        self.model = build_stereo_model(model_name, max_disparity)
        self.max_disparity = max_disparity
        self.config = config
        self.loss_fn = _LOSSES[model_name]
        if variables is None:
            from ..models import init_stereo_params
            variables = init_stereo_params(self.model, image_shape, seed)
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats", {})
        self.optimizer = optax.adamw(config.learning_rate, b1=config.momentum,
                                     b2=0.999,
                                     weight_decay=config.weight_decay)
        self.opt_state = self.optimizer.init(self.params)
        self.epoch = 0
        self._step = jax.jit(self._train_step, donate_argnums=(0, 1, 2))

    def _train_step(self, params, batch_stats, opt_state, left, right, gt):
        mask = (gt > 0) & (gt < self.max_disparity)

        def loss(p):
            outs, mutated = self.model.apply(
                {"params": p, "batch_stats": batch_stats},
                normalize_imagenet(left), normalize_imagenet(right),
                train=True, mutable=["batch_stats"])
            return self.loss_fn(outs, gt, mask), mutated["batch_stats"]

        (value, new_stats), grads = jax.value_and_grad(loss, has_aux=True)(params)
        updates, opt_state = self.optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, value

    def train(self, dataset: Kitti2015StereoDataset,
              n_epochs: Optional[int] = None) -> List[float]:
        cfg = self.config
        n_epochs = n_epochs if n_epochs is not None else cfg.n_epochs
        epoch_losses = []
        for epoch in range(self.epoch, n_epochs):
            start = time.time()
            losses = []
            for left, right, gt in dataset.batches(cfg.batch_size, seed=epoch):
                self.params, self.batch_stats, self.opt_state, loss = \
                    self._step(self.params, self.batch_stats, self.opt_state,
                               jnp.asarray(left), jnp.asarray(right),
                               jnp.asarray(gt))
                losses.append(loss)
            mean_loss = float(jnp.stack(losses).mean()) if losses else float("nan")
            print(f"[{self.model_name}] epoch {epoch}: loss {mean_loss:.4f} "
                  f"({time.time() - start:.1f}s)")
            epoch_losses.append(mean_loss)
            self.epoch = epoch + 1
            if cfg.save_path:
                self.save_checkpoint(cfg.save_path)
        return epoch_losses

    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}

    def save_checkpoint(self, path: str) -> None:
        import orbax.checkpoint as ocp

        checkpointer = ocp.StandardCheckpointer()
        checkpointer.save(os.path.abspath(path),
                          {"params": self.params,
                           "batch_stats": self.batch_stats,
                           "opt_state": self.opt_state, "epoch": self.epoch},
                          force=True)
        checkpointer.wait_until_finished()

    def export_inference_variables(self, checkpoint_dir: str) -> None:
        from ..models import save_params

        save_params(self.variables(), checkpoint_dir)
