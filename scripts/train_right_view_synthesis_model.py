"""Train the Deep3D right-view-synthesis model on KITTI drives.

Parity with the reference's ``scripts/train_right_view_synthesis_model.py``:
long-horizon training (default 130 epochs) over a list of drives with
checkpoint resume; the final inference parameters are exported for the
``RightViewSynthesis`` wrapper (the analog of TorchScript tracing).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stereo_tpu.utils.compile_cache import enable_persistent_cache

# Stall-relaunch insurance (the playbook kills + warm-starts a hung run):
# with the cache, a relaunch skips the ~8 min remote train-step recompile.
enable_persistent_cache(min_compile_secs=10.0)

from stereo_tpu.core.config import TrainerConfig
from stereo_tpu.train import KittiStereoDataset, Trainer
from stereo_tpu.utils.paths import DEEP3D_CHECKPOINT_DIR


def train_synthetic(args) -> None:
    """Dataset-free mode: Deep3D learns right-view synthesis on scenes
    generated inside the jitted step (see stereo_tpu/train/synthetic.py)."""
    import json

    from stereo_tpu.train import SyntheticDeep3DTrainer

    init_variables = None
    if args.warm_start:
        from stereo_tpu.models import load_params_npz

        init_variables = load_params_npz(args.warm_start)
        print(f"Warm-starting from {args.warm_start}")
    trainer = SyntheticDeep3DTrainer(
        height=args.crop[0], width=args.crop[1],
        batch_size=args.batch_size, learning_rate=args.learning_rate,
        chunk=args.chunk, disparity_loss_weight=args.disparity_loss_weight,
        ce_loss_weight=args.ce_loss_weight,
        min_scene_disparity=args.min_scene_disparity,
        schedule_steps=(args.steps if args.cosine_schedule else 0),
        init_variables=init_variables,
        prob_volume_scale=args.prob_volume_scale,
        photo_target=args.photo_target)
    out = args.export_dir
    if not out.endswith(".npz"):
        out = out + ".npz"
    # Segmented training with periodic export: a hung tunnel RPC (observed
    # mid-run) or a preempted job then costs at most one segment, and the
    # run can resume via --warm-start from the last export.  Fetch+compress
    # of the full parameter tree is ~45 s — noise against a segment.
    losses = []
    remaining = args.steps
    while remaining > 0:
        seg = min(args.export_every, remaining)
        losses.extend(trainer.train(seg))
        remaining -= seg
        trainer.export(out)
        print(f"checkpointed at step {trainer.step_count} -> {out}",
              flush=True)
    curve = os.path.join(os.path.dirname(os.path.abspath(out)),
                         "deep3d_synthetic_losses.json")
    with open(curve, "w") as f:
        json.dump({"steps": args.steps,
                   "crop": args.crop,
                   "disparity_loss_weight": args.disparity_loss_weight,
                   "ce_loss_weight": args.ce_loss_weight,
                   "photo_target": args.photo_target,
                   "min_scene_disparity": args.min_scene_disparity,
                   "cosine_schedule": args.cosine_schedule,
                   "batch_size": args.batch_size,
                   "prob_volume_scale": args.prob_volume_scale,
                   "warm_start": args.warm_start,
                   "losses": losses}, f)
    print(f"Exported to {out}; loss curve at {curve}")


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--drive-dirs", nargs="+", default=None)
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--steps", type=int, default=2000)
    parser.add_argument("--chunk", type=int, default=10)
    parser.add_argument("--crop", nargs=2, type=int, default=[256, 512])
    parser.add_argument("--n-epochs", type=int, default=130)
    parser.add_argument("--batch-size", type=int, default=2)
    parser.add_argument("--learning-rate", type=float, default=2e-4)
    parser.add_argument("--disparity-loss-weight", type=float, default=0.0,
                        help="synthetic mode: weight of the auxiliary Huber "
                             "loss between the probability-volume soft-"
                             "argmax and the exact right-frame GT disparity "
                             "(0 = reference-parity photometric-only)")
    parser.add_argument("--ce-loss-weight", type=float, default=0.0,
                        help="synthetic mode: weight of the sub-pixel cross-"
                             "entropy to the GT disparity channel (sharpens "
                             "the probability volume against blend ghosting)")
    parser.add_argument("--min-scene-disparity", type=float, default=6.0,
                        help="synthetic mode: scene-family minimum disparity "
                             "— MUST match the evaluation family (6.0): in "
                             "depth-prior mode it defines the deterministic "
                             "appearance->depth mapping (the r1-r4 hardcoded "
                             "2.0 vs the 6.0 eval family was a global ~3 px "
                             "disparity bias)")
    parser.add_argument("--photo-target", default="right",
                        choices=["right", "oracle"],
                        help="synthetic mode: photometric target — 'right' "
                             "(the true right view, reference parity) or "
                             "'oracle' (the left view warped by exact GT "
                             "disparity: the reachable optimum of the "
                             "shift-blend class, removing the ~5 gray "
                             "levels of irreducible occlusion noise)")
    parser.add_argument("--cosine-schedule", action="store_true",
                        help="synthetic mode: warmup-cosine LR decay over "
                             "--steps instead of a constant learning rate")
    parser.add_argument("--export-every", type=int, default=5000,
                        help="synthetic mode: export the checkpoint every N "
                             "steps (stall/preemption insurance)")
    parser.add_argument("--prob-volume-scale", type=int, default=4,
                        choices=[2, 4],
                        help="synthetic mode: bilinear upsample factor of "
                             "the softmax disparity volume (4 = reference "
                             "parity; 2 = the higher-res ablation variant)")
    parser.add_argument("--warm-start", default=None,
                        help="synthetic mode: .npz checkpoint whose "
                             "matching-shape leaves seed the new model "
                             "(cross-resolution transfer; the resolution-"
                             "tied FF dense layer re-initializes)")
    parser.add_argument("--checkpoint", default="data/checkpoints/deep3d_train")
    parser.add_argument("--export-dir", default=DEEP3D_CHECKPOINT_DIR)
    parser.add_argument("--resume", action="store_true")
    args = parser.parse_args()

    if args.steps <= 0:
        parser.error("--steps must be >= 1")
    if args.export_every <= 0:
        parser.error("--export-every must be >= 1 (it is the segment size "
                     "of the segmented-export loop)")
    if args.synthetic:
        train_synthetic(args)
        return
    if not args.drive_dirs:
        parser.error("--drive-dirs is required without --synthetic")

    config = TrainerConfig(n_epochs=args.n_epochs, batch_size=args.batch_size,
                           learning_rate=args.learning_rate,
                           save_path=args.checkpoint)
    trainer = Trainer(config=config)
    if args.resume and os.path.isdir(args.checkpoint):
        trainer.load_checkpoint(args.checkpoint)
        print(f"Resumed from epoch {trainer.epoch}.")

    dataset = KittiStereoDataset(args.drive_dirs)
    print(f"Training on {len(dataset)} stereo pairs.")
    trainer.train(dataset)
    trainer.export_inference_variables(args.export_dir)
    print(f"Exported inference parameters to {args.export_dir}")


if __name__ == "__main__":
    main()
