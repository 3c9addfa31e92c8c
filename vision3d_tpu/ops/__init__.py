"""Custom ops — public surface mirroring reference vision3d/ops/__init__.py
(Matcher semantics live in core.targets; the rotated IoU/NMS family and
focal loss are first-class TPU ops here)."""

from vision3d_tpu.core.iou import (
    np_pairwise_rotated_iou,
    pairwise_rotated_iou,
    pairwise_rotated_iou_chunked,
    rotated_iou,
)
from vision3d_tpu.core.nms import batched_nms, batched_nms_rotated, nms, nms_rotated
from vision3d_tpu.core.targets import subsample_labels
from vision3d_tpu.eval.kitti_eval import box3d_iou_matrix as box_iou_rotated_3d
from vision3d_tpu.models.losses import sigmoid_focal_loss, smooth_l1
from vision3d_tpu.ops.ball_query import ball_query, group_features
from vision3d_tpu.ops.fps import furthest_point_sample, sample_keypoints

# reference name for the pairwise IoU op (ops/iou_nms.py:9)
box_iou_rotated = pairwise_rotated_iou

__all__ = [
    "ball_query",
    "batched_nms",
    "batched_nms_rotated",
    "box_iou_rotated",
    "box_iou_rotated_3d",
    "furthest_point_sample",
    "group_features",
    "nms",
    "nms_rotated",
    "np_pairwise_rotated_iou",
    "pairwise_rotated_iou",
    "pairwise_rotated_iou_chunked",
    "rotated_iou",
    "sample_keypoints",
    "sigmoid_focal_loss",
    "smooth_l1",
    "subsample_labels",
]
