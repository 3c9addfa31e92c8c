"""On-device greedy NMS over rotated BEV boxes, fixed capacity.

Behavioral spec from the reference (vision3d/ops/csrc/nms_rotated/
nms_rotated_cpu.cpp:7-59 — greedy suppression in descending score order —
and vision3d/ops/iou_nms.py:90-134 — batched variant that isolates
(batch, class) groups). The reference's CUDA path computes a bitmask on
device and reduces it serially on the host (nms_rotated_cuda.cu:106-128),
a D2H sync per inference batch. Here the candidate set is tiny
(B * num_classes * topk <= a few hundred), so we compute the full KxK
same-group IoU matrix and run the greedy scan as a fori_loop entirely on
device — no host round-trip, one jit graph.

Axis-aligned NMS (reference ops/iou_nms.py:16-33 via torchvision) is the
angle=0 specialization of the same machinery.
"""

import jax
import jax.numpy as jnp

from vision3d_tpu.core.iou import rotated_iou

NEG_INF = -1e10


def nms_rotated(
    boxes, scores, group_idx=None, valid=None, iou_threshold=0.01,
    angle_mode="degrees",
):
    """Greedy rotated NMS with static shapes.

    Args:
      boxes: (K, 5) rotated BEV boxes (x, y, w, h, angle).
      scores: (K,) scores.
      group_idx: optional (K,) int groups; suppression only within a group
        (replaces the reference's coordinate-offset trick,
        iou_nms.py:121-133, with an explicit pair mask).
      valid: optional (K,) bool; invalid entries never kept nor suppressing.
      iou_threshold: boxes with IoU > threshold to a kept higher-scoring
        box are suppressed (strict >, matching nms_rotated_cpu.cpp:52).

    Returns:
      keep: (K,) bool mask over the ORIGINAL box order.
    """
    k = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((k,), dtype=bool)
    masked_scores = jnp.where(valid, scores, NEG_INF)
    order = jnp.argsort(-masked_scores)  # descending; invalid sink to the end

    b = boxes[order]
    v = valid[order]
    iou = rotated_iou(b[:, None, :], b[None, :, :], angle_mode, jnp)
    suppress = iou > iou_threshold
    if group_idx is not None:
        g = group_idx[order]
        suppress &= g[:, None] == g[None, :]
    suppress &= v[:, None] & v[None, :]
    # only strictly higher-ranked boxes can suppress (upper triangle)
    rank = jnp.arange(k)
    suppress &= rank[:, None] < rank[None, :]

    # Exact greedy NMS as a fixpoint iteration instead of a K-step serial
    # scan: keep' [i] = no kept higher-ranked box suppresses i. Starting
    # from all-valid, this alternately over/under-prunes along suppression
    # chains and converges to the unique greedy solution in at most
    # chain-depth steps (typically 2-3) — each step one vectorized
    # (K, K) masked reduction instead of K sequential rounds.
    def cond(carry):
        keep, prev, it = carry
        return (it < k) & (keep != prev).any()

    def step(carry):
        keep, _, it = carry
        killed = (suppress & keep[:, None]).any(axis=0)
        return v & ~killed, keep, it + 1

    keep0 = v
    keep1, _, _ = step((keep0, jnp.zeros_like(v), 0))
    keep_sorted, _, _ = jax.lax.while_loop(cond, step, (keep1, keep0, 1))
    return jnp.zeros((k,), dtype=bool).at[order].set(keep_sorted)


def batched_nms_rotated(boxes, scores, idxs, valid=None, iou_threshold=0.01,
                        angle_mode="degrees"):
    """Per-group rotated NMS (reference ops/iou_nms.py:90-134)."""
    return nms_rotated(boxes, scores, idxs, valid, iou_threshold, angle_mode)


def nms(boxes_xyxy, scores, valid=None, iou_threshold=0.5):
    """Axis-aligned NMS over (K, 4) corner boxes (reference iou_nms.py:16-33).

    Converts to center form and reuses the rotated machinery at angle 0.
    """
    x1, y1, x2, y2 = (boxes_xyxy[:, i] for i in range(4))
    ctr = jnp.stack(
        [(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1, jnp.zeros_like(x1)],
        axis=-1,
    )
    return nms_rotated(ctr, scores, None, valid, iou_threshold, "radians")


def batched_nms(boxes_xyxy, scores, idxs, valid=None, iou_threshold=0.5):
    """Per-group axis-aligned NMS (reference ops/iou_nms.py:16-33)."""
    x1, y1, x2, y2 = (boxes_xyxy[:, i] for i in range(4))
    ctr = jnp.stack(
        [(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1, jnp.zeros_like(x1)],
        axis=-1,
    )
    return nms_rotated(ctr, scores, idxs, valid, iou_threshold, "radians")
