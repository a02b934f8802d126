"""Train a DNN stereo backend (GwcNet / MSNet2D / MSNet3D) on KITTI-2015-
style data (left/right PNGs + uint16 disparity GT) or — with
``--synthetic`` — on procedurally generated stereo scenes created inside
the jitted train step (no dataset required; see
``stereo_tpu/train/synthetic.py``).

The reference has no such script — it consumes pre-traced models only
(SURVEY.md §2.3); this produces the checkpoints its DNN backends need.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from stereo_tpu.utils.compile_cache import enable_persistent_cache

# The msnet train graphs take 8-20 min to compile over the TPU tunnel;
# resumed/repeated runs shouldn't pay that twice.
enable_persistent_cache(min_compile_secs=10.0)

from stereo_tpu.core.config import TrainerConfig
from stereo_tpu.train import Kitti2015StereoDataset, StereoTrainer
from stereo_tpu.utils.paths import model_checkpoint_dir


def train_synthetic(args) -> None:
    from stereo_tpu.train import SyntheticStereoTrainer

    variables = None
    if args.resume:
        from stereo_tpu.models import (build_stereo_model,
                                       load_or_init_params)

        variables = load_or_init_params(
            build_stereo_model(args.model, args.max_disparity), args.model,
            tuple(args.crop), checkpoint_dir=args.checkpoint)
        print(f"Resuming {args.model} from existing checkpoint.")
    trainer = SyntheticStereoTrainer(
        args.model, max_disparity=args.max_disparity,
        height=args.crop[0], width=args.crop[1],
        batch_size=args.batch_size, learning_rate=args.learning_rate,
        total_steps=args.steps, chunk=args.chunk, variables=variables)
    out_dir = args.checkpoint or (model_checkpoint_dir(args.model) + ".npz")
    # Segmented export (stall/preemption insurance — hung tunnel RPCs have
    # been observed mid-run; a stall then costs at most one segment and the
    # run resumes via --resume --checkpoint <out>).
    losses = []
    remaining = args.steps
    while remaining > 0:
        seg = min(args.export_every, remaining)
        losses.extend(trainer.train(seg))
        remaining -= seg
        trainer.export(out_dir)
        print(f"checkpointed at step {trainer.step_count} -> {out_dir}",
              flush=True)
    curve_path = os.path.join(os.path.dirname(os.path.abspath(out_dir)),
                              f"{args.model}_synthetic_losses.json")
    with open(curve_path, "w") as f:
        json.dump({"model": args.model, "steps": args.steps,
                   "losses": losses}, f)
    print(f"Exported to {out_dir}; loss curve at {curve_path}")


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", required=True,
                        choices=["gwcnet", "msnet2d", "msnet3d"])
    parser.add_argument("--synthetic", action="store_true",
                        help="train on generated scenes (no dataset needed)")
    parser.add_argument("--steps", type=int, default=2000,
                        help="synthetic mode: number of train steps")
    parser.add_argument("--chunk", type=int, default=20,
                        help="synthetic mode: steps fused per dispatch")
    parser.add_argument("--data-dir", default=None,
                        help="KITTI 2015 training root (image_2/ image_3/ "
                             "disp_occ_0/)")
    parser.add_argument("--max-disparity", type=int, default=192)
    parser.add_argument("--n-epochs", type=int, default=300)
    parser.add_argument("--batch-size", type=int, default=4)
    parser.add_argument("--learning-rate", type=float, default=1e-3)
    parser.add_argument("--crop", nargs=2, type=int, default=[256, 512])
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--export-every", type=int, default=5000,
                        help="synthetic mode: export the checkpoint every "
                             "N steps (stall/preemption insurance)")
    args = parser.parse_args()

    if args.steps <= 0:
        parser.error("--steps must be >= 1")
    if args.export_every <= 0:
        parser.error("--export-every must be >= 1 (it is the segment size "
                     "of the segmented-export loop)")
    if args.synthetic:
        train_synthetic(args)
        return
    if not args.data_dir:
        parser.error("--data-dir is required without --synthetic")

    lefts = sorted(glob.glob(os.path.join(args.data_dir, "image_2", "*_10.png")))
    rights = sorted(glob.glob(os.path.join(args.data_dir, "image_3", "*_10.png")))
    disps = sorted(glob.glob(os.path.join(args.data_dir, "disp_occ_0", "*_10.png")))
    dataset = Kitti2015StereoDataset(lefts, rights, disps,
                                     crop=tuple(args.crop))
    print(f"Training {args.model} on {len(dataset)} pairs.")

    checkpoint = args.checkpoint or f"data/checkpoints/{args.model}_train"
    config = TrainerConfig(n_epochs=args.n_epochs, batch_size=args.batch_size,
                           learning_rate=args.learning_rate,
                           save_path=checkpoint)
    trainer = StereoTrainer(args.model, args.max_disparity, config,
                            image_shape=tuple(args.crop))
    trainer.train(dataset)
    trainer.export_inference_variables(model_checkpoint_dir(args.model))
    print(f"Exported to {model_checkpoint_dir(args.model)}")


if __name__ == "__main__":
    main()
