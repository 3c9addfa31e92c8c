"""Dataset layer — public surface mirroring reference vision3d/dataset/__init__.py."""

from vision3d_tpu.data.kitti import KittiDataset, KittiDatasetTrain
from vision3d_tpu.data.loader import DataLoader, collate, pad_points

__all__ = ["DataLoader", "KittiDataset", "KittiDatasetTrain", "collate", "pad_points"]
