"""Export trained Deep3D parameters for inference.

The analog of the reference's ``scripts/trace_rvs_model_for_cuda_inference``
(``:7-18``): instead of ``torch.jit.trace`` producing a TorchScript binary,
the inference artifact is an Orbax checkpoint of the parameters — the
compiled executable is (re)produced by ``jax.jit`` at load time and cached.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stereo_tpu.train import Trainer
from stereo_tpu.utils.paths import DEEP3D_CHECKPOINT_DIR


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", required=True,
                        help="training checkpoint directory")
    parser.add_argument("--export-dir", default=DEEP3D_CHECKPOINT_DIR)
    args = parser.parse_args()

    trainer = Trainer()
    trainer.load_checkpoint(args.checkpoint)
    trainer.export_inference_variables(args.export_dir)
    print(f"Exported epoch-{trainer.epoch} parameters to {args.export_dir}")


if __name__ == "__main__":
    main()
