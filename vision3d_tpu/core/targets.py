"""On-device proposal target assignment (anchors vs ground truth).

Behavioral spec from the reference (vision3d/core/proposal_targets.py:10-88
plus the detectron2 Matcher, vision3d/ops/matcher.py:55-130): per class,
compute rotated BEV IoU of that class's gt boxes against the class's anchor
grid, stratify anchors into {background 0, ignore -1, positive +1} by the
class's (low, high) thresholds, optionally rescue best-per-gt matches
(ALLOW_LOW_QUALITY_MATCHES), apply the per-box ignore mask, then build
classification targets (ignore -> mask) and VoxelNet-encoded regression
targets at positive sites. With no gt of a class, every anchor is
background (matcher.py:70-80).

TPU redesign: the reference runs this on CUDA inside dataloader worker
processes (proposal_targets.py:19 pins anchors to the GPU in each worker —
SURVEY §3.5 calls this out). Here assignment is a pure function of padded
(boxes, class_idx, masks) and joins the jit-compiled train step: masked
fixed-capacity gt, one chunked IoU matrix, argmax matching — no host work,
no CUDA-in-worker.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from vision3d_tpu.config import Config
from vision3d_tpu.core.boxes import encode
from vision3d_tpu.core.iou import pairwise_rotated_iou_chunked


class Targets(NamedTuple):
    """All arrays laid out like the anchor grid (n_cls, n_yaw, ny, nx)."""

    G_cls: jax.Array  # float {0, 1} classification target
    M_cls: jax.Array  # bool, False at ignore sites
    G_reg: jax.Array  # (..., 7) encoded box targets (zeros off-positive)
    M_reg: jax.Array  # bool, True at positive sites


def assign_targets(boxes, class_idx, gt_mask, box_ignore, anchors, cfg: Config,
                   iou_chunk: int = 8192) -> Targets:
    """Single-sample assignment.

    Args:
      boxes: (G, 7) padded gt boxes.
      class_idx: (G,) int32 class of each gt.
      gt_mask: (G,) bool validity of each gt row.
      box_ignore: (G,) bool — anchors matched to these boxes become ignore
        (reference proposal_targets.py:62-65).
      anchors: (n_cls, n_yaw, ny, nx, 7).
    """
    n_cls = cfg.num_classes
    grid_shape = anchors.shape[:-1]
    anchors_flat = anchors.reshape(n_cls, -1, cfg.box_dof)  # (n_cls, A, 7)
    a = anchors_flat.shape[1]

    bev_cols = jnp.asarray([0, 1, 3, 4, 6])
    iou_all = pairwise_rotated_iou_chunked(
        boxes[:, bev_cols],
        anchors_flat.reshape(-1, cfg.box_dof)[:, bev_cols],
        angle_mode=cfg.iou_angle_mode,
        chunk=iou_chunk,
    ).reshape(-1, n_cls, a)  # (G, n_cls, A)

    lows = jnp.asarray([c.iou_thresh[0] for c in cfg.anchors[:n_cls]])
    highs = jnp.asarray([c.iou_thresh[1] for c in cfg.anchors[:n_cls]])

    # gt row g participates in class c's matching iff valid and of class c
    participates = gt_mask[:, None] & (class_idx[:, None] == jnp.arange(n_cls))
    iou = jnp.where(participates[:, :, None], iou_all, 0.0)  # (G, n_cls, A)

    matched_vals = iou.max(axis=0)        # (n_cls, A)
    matches = iou.argmax(axis=0)          # (n_cls, A) gt index (0 if no gt)

    labels = jnp.where(matched_vals < lows[:, None], 0, 1)
    labels = jnp.where(
        (matched_vals >= lows[:, None]) & (matched_vals < highs[:, None]),
        -1, labels,
    )

    if cfg.allow_low_quality_matches:
        # best anchor(s) per gt (ties included) get label 1
        # (matcher.py:98-130); only meaningful where the gt participates.
        best_per_gt = jnp.where(
            participates, iou.max(axis=2), -1.0
        )  # (G, n_cls)
        rescue = (iou == best_per_gt[:, :, None]) & participates[:, :, None]
        labels = jnp.where(rescue.any(axis=0), 1, labels)

    # per-box ignore: any non-ignore anchor whose argmax gt is ignored
    # becomes ignore (reference proposal_targets.py:62-65; note the
    # reference dataset always passes box_ignore=False, kitti_dataset.py:128)
    ignored_match = box_ignore[matches] & (labels != -1)
    labels = jnp.where(ignored_match, -1, labels)

    M_cls = labels != -1
    G_cls = jnp.maximum(labels, 0).astype(jnp.float32)
    M_reg = labels == 1

    matched_boxes = boxes[matches]                    # (n_cls, A, 7)
    G_reg = encode(matched_boxes, anchors_flat)
    G_reg = jnp.where(M_reg[..., None], G_reg, 0.0)

    return Targets(
        G_cls=G_cls.reshape(grid_shape),
        M_cls=M_cls.reshape(grid_shape),
        G_reg=G_reg.reshape(grid_shape + (cfg.box_dof,)),
        M_reg=M_reg.reshape(grid_shape),
    )


def assign_targets_batch(boxes, class_idx, gt_mask, box_ignore, anchors,
                         cfg: Config, iou_chunk: int = 8192) -> Targets:
    """vmapped assignment over the batch dim."""
    return jax.vmap(
        lambda b, c, m, i: assign_targets(b, c, m, i, anchors, cfg, iou_chunk)
    )(boxes, class_idx, gt_mask, box_ignore)


def subsample_labels(key, labels, num_samples, positive_fraction, bg_label=0):
    """Pos/neg balanced random subsample (reference matcher.py:133-174;
    unused by the reference's models but part of its public ops API).

    Returns a bool keep-mask over ``labels`` (fixed shape) marking at most
    ``positive_fraction * num_samples`` positives and the remainder
    negatives, chosen uniformly at random.
    """
    n = labels.shape[0]
    pos = (labels != -1) & (labels != bg_label)
    neg = labels == bg_label
    num_pos_avail = pos.sum()
    num_pos = jnp.minimum(
        jnp.int32(num_samples * positive_fraction), num_pos_avail
    )
    num_neg = jnp.minimum(num_samples - num_pos, neg.sum())

    kp, kn = jax.random.split(key)

    def pick(k, mask, count):
        scores = jax.random.uniform(k, (n,))
        scores = jnp.where(mask, scores, 2.0)     # non-members sort last
        order = jnp.argsort(scores)
        rank = jnp.argsort(order)
        return rank < count

    return pick(kp, pos, num_pos), pick(kn, neg, num_neg)


def assign_refinement_targets_keypoints(key, keypoints, gt_boxes, gt_class,
                                        gt_mask, cfg: Config):
    """Keypoint-radius refinement targets — the design the reference
    sketches but never finishes (vision3d/core/refinement_targets.py:5-101:
    its forward raises NotImplementedError and the required per-class
    ``anchor['radius']`` key is absent from its config; our AnchorConfig
    adds ``radius``).

    Role split vs models/refinement.py: the production PV-RCNN two-stage
    train step supervises the refinement head with proposal-IoU-based
    targets (models/refinement.py: refinement_loss), which is what the
    head actually consumes; this keypoint-radius assigner is the
    completed parity API for the reference's P7 component and feeds the
    keypoint-segmentation auxiliary supervision (PV-RCNN's predicted
    keypoint weighting) when enabled.

    Per the reference's sketch: a keypoint within a class's spherical
    radius of a gt center is a positive of that class; one-hot cls targets
    carry background and ignore channels (background seeded with
    TRAIN.REFINEMENT_NUM_NEGATIVES random keypoints, positives overwrite,
    multi-class-ambiguous keypoints fall back to background); reg targets
    are (center offset, size residual relative to the class's mean anchor
    size, yaw) at positive keypoints.

    Args: keypoints (K, 3); gt_boxes (G, 7); gt_class (G,); gt_mask (G,).
    Returns (cls_targets (K, n_cls + 2) one-hot, reg_targets (K, n_cls, 7)).
    """
    n_cls = cfg.num_classes
    k = keypoints.shape[0]
    radii = jnp.asarray([a.radius for a in cfg.anchors[:n_cls]])
    sizes = jnp.asarray([a.wlh for a in cfg.anchors[:n_cls]])

    d = jnp.linalg.norm(
        keypoints[:, None, :] - gt_boxes[None, :, 0:3], axis=-1
    )  # (K, G)
    in_radius = (d < radii[gt_class][None, :]) & gt_mask[None, :]

    # per class: is the keypoint within radius of any gt of that class?
    cls_onehot = jax.nn.one_hot(gt_class, n_cls, dtype=bool)  # (G, n_cls)
    per_cls = (in_radius[:, :, None] & cls_onehot[None, :, :]).any(axis=1)

    cls_t = jnp.zeros((k, n_cls + 2))
    cls_t = cls_t.at[:, -1].set(1.0)  # everything starts as ignore
    # random negatives (reference fill_negatives)
    neg = jax.random.randint(
        key, (cfg.train.refinement_num_negatives,), 0, k
    )
    cls_t = cls_t.at[neg, -2].set(1.0).at[neg, -1].set(0.0)
    # positives overwrite; ambiguous (multi-class) fall back to background
    n_hit = per_cls.sum(axis=1)
    pos = n_hit == 1
    ambiguous = n_hit > 1
    cls_t = jnp.where(
        pos[:, None],
        jnp.concatenate([per_cls.astype(cls_t.dtype),
                         jnp.zeros((k, 2))], axis=1),
        cls_t,
    )
    bg_row = jnp.zeros((n_cls + 2,)).at[-2].set(1.0)
    cls_t = jnp.where(ambiguous[:, None], bg_row[None, :], cls_t)

    # reg targets: nearest in-radius gt of each class per keypoint
    d_cls = jnp.where(
        cls_onehot.T[:, None, :] & in_radius[None, :, :], d[None, :, :], jnp.inf
    )  # (n_cls, K, G)
    g_idx = d_cls.argmin(axis=-1)  # (n_cls, K)
    gt_sel = gt_boxes[g_idx]       # (n_cls, K, 7)
    reg = jnp.concatenate(
        [
            gt_sel[..., 0:3] - keypoints[None, :, :],
            (gt_sel[..., 3:6] - sizes[:, None, :]) / sizes[:, None, :],
            gt_sel[..., 6:7],
        ],
        axis=-1,
    )  # (n_cls, K, 7)
    reg = jnp.where(per_cls.T[..., None], reg, 0.0)
    return cls_t, jnp.transpose(reg, (1, 0, 2))
