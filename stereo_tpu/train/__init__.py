from .kitti_dataset import KittiStereoDataset, batch_iterator
from .stereo_trainer import Kitti2015StereoDataset, StereoTrainer
from .trainer import Trainer, make_optimizer

__all__ = ["KittiStereoDataset", "batch_iterator", "Kitti2015StereoDataset",
           "StereoTrainer", "Trainer", "make_optimizer"]
