"""Core algorithms — public surface mirroring reference
vision3d/core/__init__.py (cfg/AnchorGenerator/Preprocessor/
ProposalTargetAssigner/VisdomLinePlotter find their functional
equivalents here)."""

from vision3d_tpu.config import Config
from vision3d_tpu.core.anchors import make_anchors
from vision3d_tpu.core.boxes import (
    box3d_to_bev_corners,
    decode,
    encode,
    points_in_convex_polygon,
    points_in_cuboids,
    points_not_in_rectangles,
)
from vision3d_tpu.core.targets import (
    Targets,
    assign_refinement_targets_keypoints,
    assign_targets,
    assign_targets_batch,
)
from vision3d_tpu.core.voxelize import mean_vfe, voxelize, voxelize_batch, voxelize_np

__all__ = [
    "Config",
    "Targets",
    "assign_refinement_targets_keypoints",
    "assign_targets",
    "assign_targets_batch",
    "box3d_to_bev_corners",
    "decode",
    "encode",
    "make_anchors",
    "mean_vfe",
    "points_in_convex_polygon",
    "points_in_cuboids",
    "points_not_in_rectangles",
    "voxelize",
    "voxelize_batch",
    "voxelize_np",
]
