"""KITTI 3D detection AP evaluation (R40), host-side numpy.

The reference ships NO quantitative evaluation (SURVEY §6: qualitative
images only); this module supplies the Car 3D AP@R40 metric the baseline
targets. It follows the official KITTI protocol's structure:

  * 3D IoU = (exact BEV polygon intersection x z-overlap) / union, true
    radian geometry (eval always uses correct angles, independent of the
    training-time degrees-compat mode).
  * Greedy matching: detections in descending score order match the
    highest-IoU unmatched gt above the class threshold (Car 0.7,
    Pedestrian/Cyclist 0.5).
  * AP@R40: mean of max-precision-at-recall>=r over the 40 recall points
    r = 1/40 ... 40/40 (the 2019 protocol revision).
  * Difficulty: gt with level > difficulty are "ignored" — matches to
    them count neither as TP nor FP, and they don't enter the recall
    denominator.

Simplifications vs the official C++ evaluator (documented divergences):
no 2D-bbox height filtering of detections, no don't-care regions, and no
AOS — none of which the reference pipeline produces inputs for.
"""

from collections import defaultdict

import numpy as np

CLASS_IOU_THRESH = {0: 0.7, 1: 0.5, 2: 0.5}
N_RECALL_POINTS = 40


def box3d_iou_matrix(boxes1, boxes2):
    """(M, 7) x (N, 7) -> (M, N) 3D IoU with exact rotated BEV footprints."""
    if len(boxes1) == 0 or len(boxes2) == 0:
        return np.zeros((len(boxes1), len(boxes2)), np.float32)
    bev_cols = [0, 1, 3, 4, 6]
    b1 = boxes1[:, None, :]
    b2 = boxes2[None, :, :]
    from vision3d_tpu.core.iou import rotated_box_intersection

    bev_inter = rotated_box_intersection(
        b1[..., bev_cols], b2[..., bev_cols], angle_mode="radians", xp=np
    )
    z1lo = b1[..., 2] - b1[..., 5] / 2
    z1hi = b1[..., 2] + b1[..., 5] / 2
    z2lo = b2[..., 2] - b2[..., 5] / 2
    z2hi = b2[..., 2] + b2[..., 5] / 2
    zo = np.maximum(np.minimum(z1hi, z2hi) - np.maximum(z1lo, z2lo), 0.0)
    inter = bev_inter * zo
    v1 = b1[..., 3] * b1[..., 4] * b1[..., 5]
    v2 = b2[..., 3] * b2[..., 4] * b2[..., 5]
    union = v1 + v2 - inter
    return np.where(union > 0, inter / np.maximum(union, 1e-9), 0.0)


def _match_frame(det_boxes, det_scores, gt_boxes, gt_ignored, iou_thresh):
    """Returns (tp_flags, fp_flags) per detection + n_valid_gt."""
    order = np.argsort(-det_scores, kind="stable")
    n_gt = len(gt_boxes)
    gt_taken = np.zeros(n_gt, bool)
    tp = np.zeros(len(det_boxes), bool)
    fp = np.zeros(len(det_boxes), bool)
    iou = box3d_iou_matrix(det_boxes, gt_boxes) if n_gt else None
    for i in order:
        if n_gt:
            cand = np.where(~gt_taken, iou[i], -1.0)
            j = int(np.argmax(cand))
            if cand[j] >= iou_thresh:
                gt_taken[j] = True
                if not gt_ignored[j]:
                    tp[i] = True
                # match to an ignored gt: neither TP nor FP
                continue
        fp[i] = True
    return tp, fp


def average_precision_r40(scores, tp, fp, n_gt):
    """AP at 40 recall positions from pooled detections."""
    if n_gt == 0 or len(scores) == 0:
        return 0.0
    order = np.argsort(-scores, kind="stable")
    tp_c = np.cumsum(tp[order])
    fp_c = np.cumsum(fp[order])
    recall = tp_c / n_gt
    precision = tp_c / np.maximum(tp_c + fp_c, 1)
    ap = 0.0
    for r in np.linspace(1 / N_RECALL_POINTS, 1.0, N_RECALL_POINTS):
        mask = recall >= r
        ap += precision[mask].max() if mask.any() else 0.0
    return 100.0 * ap / N_RECALL_POINTS


def evaluate(detections, ground_truths, class_idx=0, difficulty=2):
    """Compute 3D AP@R40 for one class at one difficulty.

    Args:
      detections: list per frame of dict(boxes (D,7), scores (D,),
        class_idx (D,)).
      ground_truths: list per frame of dict(boxes (G,7), class_idx (G,),
        levels (G,) — KITTI difficulty level 1/2/3/4).
      difficulty: 1 easy, 2 moderate, 3 hard (gt above it is ignored).
    """
    thresh = CLASS_IOU_THRESH.get(class_idx, 0.5)
    all_scores, all_tp, all_fp = [], [], []
    n_gt_total = 0
    for det, gt in zip(detections, ground_truths):
        dsel = det["class_idx"] == class_idx
        dboxes = det["boxes"][dsel]
        dscores = det["scores"][dsel]
        gsel = gt["class_idx"] == class_idx
        gboxes = gt["boxes"][gsel]
        glevels = gt.get("levels", np.full(gsel.sum(), 1))[gsel]
        gignored = (glevels > difficulty) | (glevels < 0)
        n_gt_total += int((~gignored).sum())
        tp, fp = _match_frame(dboxes, dscores, gboxes, gignored, thresh)
        all_scores.append(dscores)
        all_tp.append(tp)
        all_fp.append(fp)
    scores = np.concatenate(all_scores) if all_scores else np.zeros(0)
    tp = np.concatenate(all_tp) if all_tp else np.zeros(0, bool)
    fp = np.concatenate(all_fp) if all_fp else np.zeros(0, bool)
    return average_precision_r40(scores, tp, fp, n_gt_total)


def evaluate_all(detections, ground_truths, num_classes=3):
    """AP table {class -> {difficulty -> AP}}."""
    out = defaultdict(dict)
    for c in range(num_classes):
        for d, name in [(1, "easy"), (2, "moderate"), (3, "hard")]:
            out[c][name] = evaluate(detections, ground_truths, c, d)
    return dict(out)
