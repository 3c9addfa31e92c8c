"""Host preprocessing facade (reference vision3d/core/preprocess.py).

The reference's Preprocessor voxelizes on the host CPU via spconv and pads
point clouds to the batch max (preprocess.py:10-61); TrainPreprocessor adds
dict-of-lists collation (:64-79). In this framework voxelization lives on
device inside the model graph, so the host side only pads points to fixed
capacity — but the same entry points are provided for API familiarity, and
``Preprocessor.voxelize_host`` exposes the host voxelizer (native C++ when
available) for pipelines that want reference-shaped (features, coords,
occupancy) arrays.
"""

import numpy as np

from vision3d_tpu.config import Config
from vision3d_tpu.data.loader import collate, pad_points


class Preprocessor:
    """Build fixed-capacity batch arrays from a dict with 'points' lists."""

    def __init__(self, cfg: Config, seed: int = 0):
        self.cfg = cfg
        self.rng = np.random.default_rng(seed)

    def voxelize_host(self, points: np.ndarray):
        """Reference-shaped host voxelization: (features (Nv, K, C),
        coords (Nv, 3) ZYX, occupancy (Nv,)). Uses the native C++ kernel
        when available, else the numpy reference."""
        from vision3d_tpu.utils import native

        if native.available():
            return native.hard_voxelize(points, self.cfg)
        from vision3d_tpu.core.voxelize import voxelize_np

        return voxelize_np(points, self.cfg)

    def __call__(self, item: dict) -> dict:
        """item['points']: list of (Np, C) arrays -> padded batch arrays
        ('points' (B, P, C), 'num_points' (B,)); other keys pass through."""
        P = self.cfg.capacity.max_points
        padded, nums = [], []
        for p in item["points"]:
            arr, n = pad_points(np.asarray(p, np.float32), P, self.rng)
            padded.append(arr)
            nums.append(n)
        out = dict(item)
        out["points"] = np.stack(padded)
        out["num_points"] = np.asarray(nums, np.int32)
        out["batch_size"] = len(padded)
        return out


class TrainPreprocessor(Preprocessor):
    """Collate a list of dataset samples into one fixed-capacity batch
    (reference TrainPreprocessor.collate, preprocess.py:71-79)."""

    def collate(self, items):
        return collate(items, self.cfg, self.rng)
