"""Proposal head: 1x1 convs over the BEV map + on-device decode & NMS.

Behavioral spec from the reference (vision3d/detector/proposal.py:10-97):
two 1x1 convs produce per-anchor class logits (B, n_cls, n_yaw, ny, nx)
and box deltas (..., 7); inference takes sigmoid scores, per-(batch,
class) top-K (K=100), gathers matching anchors, decodes, then runs
multiclass rotated NMS at IoU 0.01 with per-class score thresholds.

TPU redesign: everything stays on device with static shapes — top-K over
the flattened per-class anchor axis, one fixed-K NMS over the pooled
B*n_cls*K candidates with (batch, class) group masking, and a fixed-size
detection output (boxes/scores/class/valid) instead of the reference's
host-side variable-length filtering.

Known intentional divergence: the reference initializes the cls-conv bias
to ``-log(1-p)/p`` (+1.005, proposal.py:26-30), which makes every anchor
initially "positive" (sigmoid ~ 0.73); this looks like a typo of the
standard focal prior ``-log((1-p)/p)`` (-4.595, RetinaNet §4.1) and we use
the latter. Init-only — converted checkpoints overwrite it.
"""

import math
from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vision3d_tpu.config import Config
from vision3d_tpu.core.boxes import decode
from vision3d_tpu.core.nms import nms_rotated


class Detections(NamedTuple):
    """Fixed-capacity detection set; rows with ``valid=False`` are padding."""

    boxes: jax.Array      # (B, n_cls * topk, 7)
    scores: jax.Array     # (B, n_cls * topk)
    class_idx: jax.Array  # (B, n_cls * topk) int32
    valid: jax.Array      # (B, n_cls * topk) bool


class ProposalHead(nn.Module):
    cfg: Config

    @nn.compact
    def __call__(self, bev):
        """bev (B, ny, nx, C) -> cls (B, n_cls, n_yaw, ny, nx),
        reg (B, n_cls, n_yaw, ny, nx, 7)."""
        c = self.cfg
        prior = 0.01
        cls = nn.Conv(
            c.num_classes * c.num_yaw, (1, 1),
            kernel_init=nn.initializers.normal(0.01),
            bias_init=nn.initializers.constant(-math.log((1 - prior) / prior)),
        )(bev)
        reg = nn.Conv(
            c.num_classes * c.num_yaw * c.box_dof, (1, 1),
            kernel_init=nn.initializers.normal(0.01),
            bias_init=nn.initializers.zeros,
        )(bev)
        b, ny, nx, _ = bev.shape
        cls = cls.reshape(b, ny, nx, c.num_classes, c.num_yaw)
        cls = jnp.transpose(cls, (0, 3, 4, 1, 2))
        reg = reg.reshape(b, ny, nx, c.num_classes, c.num_yaw, c.box_dof)
        reg = jnp.transpose(reg, (0, 3, 4, 1, 2, 5))
        return cls, reg


def decode_proposals(cls_map, reg_map, anchors, cfg: Config):
    """Top-K per (batch, class) + box decode (reference proposal.py:61-80).

    anchors: (n_cls, n_yaw, ny, nx, 7) static layout matching the maps.
    Returns boxes (B, n_cls, K, 7), scores (B, n_cls, K).
    """
    b, n_cls = cls_map.shape[:2]
    k = cfg.proposal.topk
    scores_flat = jax.nn.sigmoid(cls_map.reshape(b, n_cls, -1))
    scores, idx = jax.lax.top_k(scores_flat, k)              # (B, n_cls, K)
    deltas = jnp.take_along_axis(
        reg_map.reshape(b, n_cls, -1, cfg.box_dof), idx[..., None], axis=2
    )
    anchors_flat = anchors.reshape(1, n_cls, -1, cfg.box_dof)
    sel_anchors = jnp.take_along_axis(
        jnp.broadcast_to(anchors_flat, (b,) + anchors_flat.shape[1:]),
        idx[..., None], axis=2,
    )
    boxes = decode(deltas, sel_anchors)
    return boxes, scores


def multiclass_nms(boxes, scores, cfg: Config) -> Detections:
    """Pooled rotated NMS with (batch, class) groups + score thresholds
    (reference proposal.py:41-59)."""
    b, n_cls, k, _ = boxes.shape
    flat_boxes = boxes.reshape(b, n_cls * k, 7)
    flat_scores = scores.reshape(b, n_cls * k)
    class_idx = jnp.broadcast_to(
        jnp.arange(n_cls, dtype=jnp.int32)[None, :, None], (b, n_cls, k)
    ).reshape(b, n_cls * k)

    thresh = jnp.asarray([a.score_thresh for a in cfg.anchors[: cfg.num_classes]])

    def per_sample(bx, sc, ci):
        bev = bx[:, jnp.asarray([0, 1, 3, 4, 6])]
        keep = nms_rotated(
            bev, sc, group_idx=ci,
            iou_threshold=cfg.proposal.nms_iou_threshold,
            angle_mode=cfg.iou_angle_mode,
        )
        return keep & (sc > thresh[ci])

    valid = jax.vmap(per_sample)(flat_boxes, flat_scores, class_idx)
    return Detections(flat_boxes, flat_scores, class_idx, valid)


def head_inference(cls_map, reg_map, anchors, cfg: Config) -> Detections:
    boxes, scores = decode_proposals(cls_map, reg_map, anchors, cfg)
    return multiclass_nms(boxes, scores, cfg)


def extract_detections(det: Detections):
    """Host helper: fixed-capacity Detections -> per-sample numpy arrays
    (the reference's variable-length (boxes, batch_idx, class_idx, scores))."""
    import numpy as np

    out = []
    for b in range(det.boxes.shape[0]):
        v = np.asarray(det.valid[b])
        out.append(
            dict(
                boxes=np.asarray(det.boxes[b])[v],
                scores=np.asarray(det.scores[b])[v],
                class_idx=np.asarray(det.class_idx[b])[v],
            )
        )
    return out
