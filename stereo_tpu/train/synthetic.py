"""On-device synthetic stereo scenes + training loops that consume them.

No stereo dataset ships in this container, and the reference's own training
path assumes KITTI raw drives on disk
(``scripts/train_right_view_synthesis_model.py:24-30``).  To make the DNN
backends *real* (trained, not random-init), this module provides a
procedural stereo-scene generator that is pure ``jax.numpy`` — it runs
INSIDE the jitted train step, on the accelerator, keyed by a PRNG key.  No
host-side data loading, no host->device transfer of batches: generation,
forward, backward, and the optimizer update are one fused XLA program.

Scene model
-----------
A scene is a stack of fronto-parallel textured layers (background + rects),
painted far-to-near so occlusions are geometrically consistent in BOTH
views.  Each layer has one disparity ``d`` (fractional allowed) and a
procedural texture ``T(x, yw)`` (mixed sinusoid gratings + a shader-hash
noise term) evaluated at *world* column coordinates:

* right view samples ``T(x, y)``            (world coords == right coords)
* left  view samples ``T(x, y - d)``        (content shifts right by d)

so ``right[y] = left[y + d]`` — the same convention as the reference's
Deep3D shift stack (``deep3d.py:177-180``) and the classical matcher.
Ground-truth disparity is painted in left-frame coordinates with the same
near-last order, so occluded pixels carry the occluder's disparity —
exactly what a left-frame GT map means.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_N_GRATINGS = 6


def _layer_texture(key: jax.Array, x_hw: jnp.ndarray,
                   yw_hw: jnp.ndarray) -> jnp.ndarray:
    """Procedural layer texture at world coords -> (3, H, W) in 0..255.

    A base color plus ``_N_GRATINGS`` oriented sinusoid gratings with
    log-uniform periods (4..128 px, incommensurate — resolves periodic
    matching ambiguity) plus a low-amplitude high-frequency hash-noise
    term.  Being a closed-form function of (x, yw), it can be evaluated at
    fractionally shifted coordinates exactly — fractional disparities give
    exact subpixel training targets.
    """
    kb, kf, kp, ka, kg = jax.random.split(key, 5)
    base = jax.random.uniform(kb, (3, 1, 1), minval=60.0, maxval=195.0)
    period_log2 = jax.random.uniform(kf, (_N_GRATINGS,), minval=2.0,
                                     maxval=7.0)
    freq = (2.0 * jnp.pi) / (2.0 ** period_log2)
    angle = jax.random.uniform(kp, (_N_GRATINGS,), maxval=2.0 * jnp.pi)
    phase = jax.random.uniform(ka, (_N_GRATINGS,), maxval=2.0 * jnp.pi)
    gains = jax.random.uniform(kg, (3, _N_GRATINGS), minval=-28.0,
                               maxval=28.0)
    fx = freq * jnp.sin(angle)
    fy = freq * jnp.cos(angle)
    waves = jnp.sin(fx[:, None, None] * x_hw[None]
                    + fy[:, None, None] * yw_hw[None]
                    + phase[:, None, None])                 # (G, H, W)
    img = base + jnp.einsum("cg,ghw->chw", gains, waves)
    # Shader-style hash noise: deterministic in world coords, consistent
    # across the two views, high-frequency texture for local matching.
    hash_val = jnp.sin(x_hw * 12.9898 + yw_hw * 78.233) * 43758.5453
    noise = (hash_val - jnp.floor(hash_val)) - 0.5
    img = img + 14.0 * noise[None]
    return jnp.clip(img, 0.0, 255.0)


def synthetic_stereo_scene(
        key: jax.Array, height: int, width: int,
        min_disparity: float = 6.0, max_disparity: float = 58.0,
        n_layers: int = 6,
        depth_prior: bool = False,
        with_right_frame_gt: bool = False,
        camera_t: float = 0.0):
    """One scene -> ``(left (3,H,W), right (3,H,W), gt_disparity (H,W))``,
    images float32 in 0..255 (the pipeline's camera contract), GT in
    left-frame full-resolution pixels.  Pure-jnp; jit/vmap safe.

    ``camera_t`` places the stereo rig ``camera_t`` baselines to the right
    of its t=0 position (a traced float — same executable for a whole
    drive): every layer shifts by ``t * d``, so near layers sweep faster
    than far ones — true motion parallax with evolving occlusions.  Holding
    ``key`` fixed and stepping ``camera_t`` yields a temporally coherent
    "drive" through one scene (the demo-video generator); ``left(t=1)``
    equals ``right(t=0)`` by construction (tested).  GT disparities are
    camera-position-independent (depth-determined).

    ``with_right_frame_gt=True`` appends a fourth output: the disparity map
    in RIGHT-frame coordinates (``right[y] = left[y + d_r(y)]``) — the frame
    Deep3D's probability volume lives in, used for disparity supervision.

    ``depth_prior=False`` (stereo-training mode): every layer's disparity is
    random and appearance-independent — nets can only solve the task by
    *matching*, never by memorizing monocular cues.

    ``depth_prior=True`` (single-view / Deep3D mode): a ground-plane-like
    background whose disparity ramps top(far)->bottom(near) and rect
    disparities correlated with their vertical position — the monocular
    structure (KITTI-style "lower is closer") a view-synthesis network
    needs, since it sees only the left image.
    """
    x_hw = jnp.broadcast_to(
        jnp.arange(height, dtype=jnp.float32)[:, None], (height, width))
    y_hw = jnp.broadcast_to(
        jnp.arange(width, dtype=jnp.float32)[None, :], (height, width))

    kd, kbg, klayers = jax.random.split(key, 3)

    if depth_prior:
        # Background: per-row disparity ramp (still row-wise closed-form:
        # left row x samples the texture at y - d_bg(x)).  The ramp's near
        # value is FIXED, not drawn: a random latent would be invisible in
        # the left view, putting an aleatoric floor of several px under any
        # single-view network (measured: disp-D1 plateaus ~0.53 no matter
        # the supervision).  Real monocular cues (ground plane, object
        # size) are deterministic given appearance; the synthetic prior
        # must be too for the eval to measure the network.
        span = max_disparity - min_disparity
        near = min_disparity + span * 0.55
        d_bg_row = min_disparity + (near - min_disparity) * (
            x_hw[:, :1] / max(height - 1, 1)) ** 1.5       # (H, 1)
        d_bg = jnp.broadcast_to(d_bg_row, (height, width))
        ds = None
    else:
        ds = jnp.sort(jax.random.uniform(
            kd, (n_layers,), minval=min_disparity, maxval=max_disparity))
        d_bg = jnp.full((height, width), ds[0])

    t = jnp.float32(camera_t)
    # Camera at +t baselines: a right-view pixel y images world column
    # y + t*d, a left-view pixel y images y + (t-1)*d (t=0 is the original
    # world==right convention).
    right = _layer_texture(kbg, x_hw, y_hw + t * d_bg)
    left = _layer_texture(kbg, x_hw, y_hw + (t - 1.0) * d_bg)
    # The background disparity varies per ROW only (or is constant), so the
    # right-frame map starts identical to the left-frame one.
    disparity = d_bg
    disparity_r = d_bg

    def body(i, state):
        left, right, disparity, disparity_r = state
        k = jax.random.fold_in(klayers, i)
        kr, kt = jax.random.split(k)
        k1, k2, k3, k4, k5 = jax.random.split(kr, 5)
        rect_h = jax.random.uniform(k1, minval=height / 6, maxval=height / 2)
        rect_w = jax.random.uniform(k2, minval=width / 8, maxval=width / 3)
        x0 = jax.random.uniform(k3, minval=-rect_h / 4,
                                maxval=height - rect_h * 0.75)
        y0 = jax.random.uniform(k4, minval=-rect_w / 4,
                                maxval=width - rect_w * 0.75)
        if depth_prior:
            # Disparity tied DETERMINISTICALLY to the rect's vertical
            # center: objects lower in the image are closer (larger d).
            # No random scale factor — an unobservable latent would make
            # the monocular task irreducibly noisy (see the background
            # comment above); del k5 keeps the PRNG stream layout.
            del k5
            center = jnp.clip((x0 + rect_h / 2) / height, 0.0, 1.0)
            d = jnp.clip(min_disparity
                         + (max_disparity - min_disparity) * center,
                         min_disparity, max_disparity)
        else:
            d = ds[i]

        def rect_mask(yw):
            return ((x_hw >= x0) & (x_hw < x0 + rect_h)
                    & (yw >= y0) & (yw < y0 + rect_w))

        mask_r = rect_mask(y_hw + t * d)
        mask_l = rect_mask(y_hw + (t - 1.0) * d)
        tex_r = _layer_texture(kt, x_hw, y_hw + t * d)
        tex_l = _layer_texture(kt, x_hw, y_hw + (t - 1.0) * d)
        right = jnp.where(mask_r[None], tex_r, right)
        left = jnp.where(mask_l[None], tex_l, left)
        disparity = jnp.where(mask_l, d, disparity)
        disparity_r = jnp.where(mask_r, d, disparity_r)
        return left, right, disparity, disparity_r

    left, right, disparity, disparity_r = lax.fori_loop(
        1, n_layers, body, (left, right, disparity, disparity_r))
    if with_right_frame_gt:
        return left, right, disparity, disparity_r
    return left, right, disparity


def synthetic_stereo_batch(key: jax.Array, batch_size: int, height: int,
                           width: int, min_disparity: float = 6.0,
                           max_disparity: float = 58.0, n_layers: int = 6,
                           depth_prior: bool = False,
                           with_right_frame_gt: bool = False):
    """vmapped scenes -> ``(left (N,3,H,W), right, gt (N,H,W))`` (plus
    ``gt_right`` when ``with_right_frame_gt``)."""
    keys = jax.random.split(key, batch_size)
    return jax.vmap(lambda k: synthetic_stereo_scene(
        k, height, width, min_disparity, max_disparity, n_layers,
        depth_prior, with_right_frame_gt))(keys)


# ---------------------------------------------------------------------------
# Stereo-network training on generated scenes
# ---------------------------------------------------------------------------

class SyntheticStereoTrainer:
    """Trains a stereo network (gwcnet / msnet2d / msnet3d) entirely
    on-device: a ``lax.scan`` chunk of steps — each generating its own batch
    — runs as ONE dispatch, so the ~30 ms tunnel RPC and the ~1.3 MB/s
    host->device bandwidth never touch the training loop.

    The reference has no trainer for these nets (it consumes opaque traced
    models, ``dnn_stereo_matching_backend.py:9-13``); this is the subsystem
    that makes the DNN backends produce meaningful disparities.
    """

    def __init__(self, model_name: str, max_disparity: int = 64,
                 height: int = 256, width: int = 512, batch_size: int = 4,
                 learning_rate: float = 1e-3, weight_decay: float = 1e-4,
                 warmup_steps: int = 100, total_steps: int = 2000,
                 min_scene_disparity: float = 6.0,
                 max_scene_disparity: Optional[float] = None,
                 chunk: int = 20, seed: int = 0, variables=None):
        import optax

        from ..models import build_stereo_model, gwcnet_loss, init_stereo_params, msnet_loss
        from ..pipeline.backends import normalize_imagenet

        if max_scene_disparity is None:
            max_scene_disparity = max_disparity - 6.0
        self.model_name = model_name
        self.model = build_stereo_model(model_name, max_disparity)
        self.max_disparity = max_disparity
        self.chunk = chunk
        self.total_steps = total_steps
        self._gen = functools.partial(
            synthetic_stereo_batch, batch_size=batch_size, height=height,
            width=width, min_disparity=min_scene_disparity,
            max_disparity=max_scene_disparity)
        loss_fn = gwcnet_loss if model_name == "gwcnet" else msnet_loss

        if variables is None:
            variables = init_stereo_params(self.model, (height, width), seed)
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats", {})
        schedule = optax.warmup_cosine_decay_schedule(
            init_value=learning_rate * 0.05, peak_value=learning_rate,
            warmup_steps=warmup_steps, decay_steps=total_steps,
            end_value=learning_rate * 0.02)
        self.optimizer = optax.chain(
            optax.clip_by_global_norm(5.0),
            optax.adamw(schedule, weight_decay=weight_decay))
        self.opt_state = self.optimizer.init(self.params)
        self.key = jax.random.PRNGKey(seed + 1)
        self.step_count = 0

        model, optimizer, gen = self.model, self.optimizer, self._gen
        max_d = float(max_disparity)

        def one_step(carry, _):
            params, bstats, opt_state, key = carry
            key, sub = jax.random.split(key)
            left, right, gt = gen(sub)
            mask = (gt > 0.0) & (gt < max_d)

            def loss(p):
                outs, mutated = model.apply(
                    {"params": p, "batch_stats": bstats},
                    normalize_imagenet(left), normalize_imagenet(right),
                    train=True, mutable=["batch_stats"])
                return loss_fn(outs, gt, mask), mutated["batch_stats"]

            (value, new_stats), grads = jax.value_and_grad(
                loss, has_aux=True)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, new_stats, opt_state, key), value

        def run_chunk(params, bstats, opt_state, key):
            (params, bstats, opt_state, key), losses = lax.scan(
                one_step, (params, bstats, opt_state, key), None,
                length=self.chunk)
            return params, bstats, opt_state, key, losses

        self._run_chunk = jax.jit(run_chunk, donate_argnums=(0, 1, 2))

    def train(self, n_steps: Optional[int] = None,
              log_every_chunks: int = 5) -> List[float]:
        """Run ``n_steps`` (rounded up to whole chunks); returns per-step
        losses."""
        import time

        n_steps = n_steps if n_steps is not None else self.total_steps
        n_chunks = -(-n_steps // self.chunk)
        all_losses: List[float] = []
        start = time.time()
        for c in range(n_chunks):
            self.params, self.batch_stats, self.opt_state, self.key, losses = \
                self._run_chunk(self.params, self.batch_stats, self.opt_state,
                                self.key)
            losses = np.asarray(losses)
            all_losses.extend(float(v) for v in losses)
            self.step_count += self.chunk
            if log_every_chunks and (c % log_every_chunks == 0
                                     or c == n_chunks - 1):
                print(f"[{self.model_name}] step {self.step_count}: "
                      f"loss {losses.mean():.4f} "
                      f"({time.time() - start:.1f}s)", flush=True)
        return all_losses

    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}

    def export(self, checkpoint_path: str) -> None:
        """Write inference variables: compact ``.npz`` (the committed
        format) when the path ends in .npz, else an Orbax tree."""
        from ..models import save_params, save_params_npz

        variables = jax.device_get(self.variables())
        if checkpoint_path.endswith(".npz"):
            save_params_npz(variables, checkpoint_path)
        else:
            save_params(variables, checkpoint_path)


# ---------------------------------------------------------------------------
# Deep3D (right-view synthesis) training on generated scenes
# ---------------------------------------------------------------------------

class SyntheticDeep3DTrainer:
    """Trains Deep3D to synthesize the right view from the left, using the
    same on-device scene generator (reference analog:
    ``pipeline/synthesis/trainer.py:49-74`` — L1 loss, Adam 2e-4 — but with
    generated stereo pairs instead of KITTI drives).

    ``disparity_loss_weight > 0`` adds auxiliary supervision the reference
    cannot have (KITTI photometric-only): a Huber loss between the
    soft-argmax of Deep3D's probability volume and the scene's EXACT
    right-frame GT disparity.  Photometric L1 alone leaves the implied
    geometry underdetermined wherever texture is locally ambiguous — the
    aux term pins it, which is what downstream stereo matching on the
    synthesized view actually needs.

    ``photo_target="oracle"`` replaces the photometric target with the
    left view warped by the exact right-frame GT disparity — the reachable
    optimum of the shift-blend synthesis class (the floor record's oracle,
    ``scripts/single_view_floor.py``).  The TRUE right view differs from
    that optimum by ~5.2 gray levels of occluded-in-left content no
    convex-shift architecture can produce; training against it makes the
    irreducible residual a gradient NOISE floor that competes with the
    sub-gray-level geometric signal the downstream matcher needs.  The
    oracle target removes exactly that noise (distillation onto the
    oracle's warp field); "right" keeps reference-parity semantics.

    ``height``/``width`` must make ``(H/4, W/4)`` divisible by 32 (the VGG
    stride on the downscaled branch).
    """

    def __init__(self, height: int = 256, width: int = 512,
                 batch_size: int = 2, learning_rate: float = 2e-4,
                 weight_decay: float = 1e-4, chunk: int = 10, seed: int = 0,
                 min_scene_disparity: float = 6.0,
                 max_scene_disparity: float = 58.0,
                 disparity_loss_weight: float = 0.0,
                 ce_loss_weight: float = 0.0,
                 schedule_steps: int = 0,
                 init_variables=None,
                 prob_volume_scale: int = 4,
                 photo_target: str = "right"):
        import optax

        from ..models import Deep3D

        self.model = Deep3D(prob_volume_scale=prob_volume_scale)
        self.prob_volume_scale = prob_volume_scale
        self.height, self.width = height, width
        key = jax.random.PRNGKey(seed)
        full = jnp.zeros((1, 3, height, width), jnp.float32)
        down = jnp.zeros((1, 3, height // 4, width // 4), jnp.float32)
        variables = self.model.init({"params": key, "dropout": key}, full,
                                    down, train=True)
        self.params = variables["params"]
        if init_variables is not None:
            # Warm start across resolutions/variants: adopt every leaf whose
            # key path exists in the donor with a matching shape (all
            # convs/deconvs — resolution-independent).  Fresh init is kept
            # for the resolution-tied first FF dense layer (15360 x 4096 at
            # native vs 4096 x 4096 at 256x512) and for layers the donor
            # lacks (e.g. the ablation variant's extra upconv stage).
            donor = {jax.tree_util.keystr(p): leaf for p, leaf in
                     jax.tree_util.tree_flatten_with_path(
                         init_variables["params"])[0]}
            n_kept = [0]

            def adopt(path, fresh):
                old = donor.get(jax.tree_util.keystr(path))
                if old is None or old.shape != fresh.shape:
                    return fresh
                n_kept[0] += 1
                return jnp.asarray(old)

            self.params = jax.tree_util.tree_map_with_path(adopt, self.params)
            print(f"[deep3d] warm start: adopted {n_kept[0]} matching-shape "
                  f"leaves", flush=True)
        # schedule_steps > 0: warmup-cosine decay to lr/20 over that horizon
        # (constant-lr runs plateau — the fine geometry never anneals in).
        lr = (optax.warmup_cosine_decay_schedule(
                  init_value=learning_rate * 0.05, peak_value=learning_rate,
                  warmup_steps=max(100, schedule_steps // 100),
                  decay_steps=schedule_steps,
                  end_value=learning_rate * 0.05)
              if schedule_steps > 0 else learning_rate)
        self.optimizer = optax.adamw(lr, weight_decay=weight_decay)
        self.opt_state = self.optimizer.init(self.params)
        self.key = jax.random.PRNGKey(seed + 1)
        self.chunk = chunk
        self.step_count = 0
        model, optimizer = self.model, self.optimizer
        w_disp = float(disparity_loss_weight)
        w_ce = float(ce_loss_weight)
        if photo_target not in ("right", "oracle"):
            raise ValueError("photo_target must be 'right' or 'oracle'")
        oracle_photo = photo_target == "oracle"
        supervised = w_disp > 0.0 or w_ce > 0.0 or oracle_photo
        # depth_prior scenes: single-view synthesis is only learnable when
        # appearance predicts depth (see synthetic_stereo_scene docstring).
        # The (min, max) scene disparities must MATCH the evaluation
        # family's (6.0, 58.0): in depth-prior mode they define the
        # deterministic appearance->depth mapping itself, so a mismatched
        # trainer teaches a systematically shifted mapping.  The r1-r4
        # checkpoints trained with a hardcoded min of 2.0 against the 6.0
        # eval family — a global ~2-4 px disparity bias that read as
        # rvs_on D1 0.29-0.48 while the volume was sharp and confident
        # (diagnosed in results/evaluation/rvs_diagnosis_r05.json).
        gen = functools.partial(
            synthetic_stereo_batch, batch_size=batch_size, height=height,
            width=width, min_disparity=min_scene_disparity,
            max_disparity=max_scene_disparity, depth_prior=True,
            with_right_frame_gt=supervised)
        channels = jnp.arange(65, dtype=jnp.float32)   # Deep3D's 65 shifts

        def one_step(carry, _):
            params, opt_state, key = carry
            key, kgen, kdrop = jax.random.split(key, 3)
            if supervised:
                left, right, _, gt_right = gen(kgen)
            else:
                left, right, _ = gen(kgen)
            left = left / 255.0
            right = right / 255.0
            if oracle_photo:
                # Reachable-optimum photometric target (see class docstring).
                right = oracle_warp_batch(left, gt_right)
            down = _mean_pool_nchw(left, 4)

            def loss(p):
                if not supervised:
                    pred = model.apply({"params": p}, left, down, train=True,
                                       rngs={"dropout": kdrop})
                    return jnp.abs(pred - right).mean()
                pred, prob = model.apply(
                    {"params": p}, left, down, train=True,
                    rngs={"dropout": kdrop},
                    method=Deep3D.synthesize_with_probabilities)
                photo = jnp.abs(pred - right).mean()
                total = photo
                if w_disp > 0.0:
                    # Soft-argmax regression: sub-pixel accurate but can be
                    # satisfied by diffuse (even bimodal) distributions.
                    expected_d = jnp.einsum("ndhw,d->nhw", prob, channels)
                    err = expected_d - gt_right
                    huber = jnp.where(jnp.abs(err) <= 1.0, 0.5 * err * err,
                                      jnp.abs(err) - 0.5)
                    total = total + w_disp * huber.mean()
                if w_ce > 0.0:
                    # Sub-pixel cross-entropy to the two straddling channels
                    # (weights 1-frac / frac): forces a unimodal peak, so
                    # the blended view doesn't ghost — ghosting is what
                    # breaks downstream SAD matching on the synthesized
                    # right view.
                    gt_c = jnp.clip(gt_right, 0.0, 64.0)
                    lo = jnp.floor(gt_c)
                    frac = gt_c - lo
                    logp = jnp.log(prob + 1e-9)
                    lo_i = lo.astype(jnp.int32)[:, None]
                    hi_i = jnp.minimum(lo_i + 1, 64)
                    take = jnp.take_along_axis
                    ce = -((1.0 - frac) * take(logp, lo_i, axis=1)[:, 0]
                           + frac * take(logp, hi_i, axis=1)[:, 0])
                    total = total + w_ce * ce.mean()
                return total

            value, grads = jax.value_and_grad(loss)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, key), value

        def run_chunk(params, opt_state, key):
            (params, opt_state, key), losses = lax.scan(
                one_step, (params, opt_state, key), None, length=self.chunk)
            return params, opt_state, key, losses

        self._run_chunk = jax.jit(run_chunk, donate_argnums=(0, 1))

    def train(self, n_steps: int, log_every_chunks: int = 5) -> List[float]:
        import time

        n_chunks = -(-n_steps // self.chunk)
        all_losses: List[float] = []
        start = time.time()
        for c in range(n_chunks):
            self.params, self.opt_state, self.key, losses = self._run_chunk(
                self.params, self.opt_state, self.key)
            losses = np.asarray(losses)
            all_losses.extend(float(v) for v in losses)
            self.step_count += self.chunk
            if log_every_chunks and (c % log_every_chunks == 0
                                     or c == n_chunks - 1):
                print(f"[deep3d] step {self.step_count}: "
                      f"loss {losses.mean():.4f} "
                      f"({time.time() - start:.1f}s)", flush=True)
        return all_losses

    def export(self, checkpoint_path: str) -> None:
        from ..models import save_params, save_params_npz

        variables = jax.device_get({"params": self.params})
        if checkpoint_path.endswith(".npz"):
            # Deep3D's FF block ties the parameters to the training
            # resolution; record it so the RVS wrapper can adopt it.
            save_params_npz(variables, checkpoint_path, meta={
                "full_shape": [self.height, self.width],
                "down_shape": [self.height // 4, self.width // 4],
                "prob_volume_scale": self.prob_volume_scale})
        else:
            save_params(variables, checkpoint_path)


def _mean_pool_nchw(x: jnp.ndarray, k: int) -> jnp.ndarray:
    n, c, h, w = x.shape
    return x.reshape(n, c, h // k, k, w // k, k).mean(axis=(3, 5))


def oracle_warp_batch(left_nchw: jnp.ndarray,
                      d_right_nhw: jnp.ndarray) -> jnp.ndarray:
    """``out[n, c, x, y] = left[n, c, x, y + d_r(n, x, y)]`` (bilinear) —
    the left views warped by the exact right-frame disparity: the reachable
    optimum of Deep3D's convex-shift synthesis class (fractional
    disparities become the two-tap blend the softmax head can emit).  Same
    math as the floor record's oracle (``scripts/single_view_floor.py``)."""
    n, c, h, w = left_nchw.shape
    y = jnp.arange(w, dtype=jnp.float32)[None, None, :] + d_right_nhw
    y0 = jnp.floor(y)
    frac = (y - y0)[:, None]                                  # (N, 1, H, W)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, w - 1)            # (N, H, W)
    y1i = jnp.clip(y0i + 1, 0, w - 1)
    take = jax.vmap(lambda img, idx: jnp.take_along_axis(
        img, idx[None].repeat(img.shape[0], 0), axis=-1))
    return (1.0 - frac) * take(left_nchw, y0i) + frac * take(left_nchw, y1i)
