"""Train a DNN stereo backend (GwcNet / MSNet2D / MSNet3D) on KITTI-2015-
style data (left/right PNGs + uint16 disparity GT).

The reference has no such script — it consumes pre-traced models only
(SURVEY.md §2.3); this produces the checkpoints its DNN backends need.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stereo_tpu.core.config import TrainerConfig
from stereo_tpu.train import Kitti2015StereoDataset, StereoTrainer
from stereo_tpu.utils.paths import model_checkpoint_dir


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", required=True,
                        choices=["gwcnet", "msnet2d", "msnet3d"])
    parser.add_argument("--data-dir", required=True,
                        help="KITTI 2015 training root (image_2/ image_3/ "
                             "disp_occ_0/)")
    parser.add_argument("--max-disparity", type=int, default=192)
    parser.add_argument("--n-epochs", type=int, default=300)
    parser.add_argument("--batch-size", type=int, default=4)
    parser.add_argument("--learning-rate", type=float, default=1e-3)
    parser.add_argument("--crop", nargs=2, type=int, default=[256, 512])
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--resume", action="store_true")
    args = parser.parse_args()

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
