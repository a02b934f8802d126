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

from stereo_tpu.core.config import TrainerConfig
from stereo_tpu.train import KittiStereoDataset, Trainer
from stereo_tpu.utils.paths import DEEP3D_CHECKPOINT_DIR


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--drive-dirs", nargs="+", required=True)
    parser.add_argument("--n-epochs", type=int, default=130)
    parser.add_argument("--batch-size", type=int, default=2)
    parser.add_argument("--learning-rate", type=float, default=2e-4)
    parser.add_argument("--checkpoint", default="data/checkpoints/deep3d_train")
    parser.add_argument("--export-dir", default=DEEP3D_CHECKPOINT_DIR)
    parser.add_argument("--resume", action="store_true")
    args = parser.parse_args()

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
