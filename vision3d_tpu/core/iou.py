"""Exact rotated-box IoU, fully vectorized (no sequential clipping loop).

Behavioral spec from the reference CUDA/C++ kernel
(vision3d/ops/csrc/box_iou_rotated/box_iou_rotated_utils.h): boxes are
(x_ctr, y_ctr, w, h, angle); the kernel interprets ``angle`` as DEGREES
(``theta = a * 0.01745...``, box_iou_rotated_utils.h:61) even though every
in-repo caller passes radians, making its IoU nearly axis-aligned in
practice. ``angle_mode="degrees"`` reproduces that quirk (the parity
default via Config.iou_angle_mode); ``"radians"`` is the corrected mode.

Algorithm (TPU-first redesign of the reference's Graham-scan approach):
the intersection of two convex quads is convex with <= 8 vertices drawn
from 24 candidates — 16 edge-pair intersections plus each quad's 4 vertices
contained in the other. We build all 24 candidates in parallel with a
validity mask, order them by angle about the candidate mean, and take a
masked shoelace area. This maps to pure VPU elementwise work plus one
small sort — no data-dependent loops — so it vectorizes over millions of
box pairs. Works with ``xp=numpy`` (host) or ``xp=jax.numpy`` (device).
"""

import math

import jax.numpy as jnp
import numpy as np

_DEG2RAD = math.pi / 180.0
_EPS = 1e-14


def _corners(boxes, angle_mode, xp):
    """(..., 5) -> (..., 4, 2) ccw corners; boxes are (x, y, w, h, angle)."""
    theta = boxes[..., 4]
    if angle_mode == "degrees":
        theta = theta * _DEG2RAD
    c, s = xp.cos(theta), xp.sin(theta)
    w2 = boxes[..., 2] * 0.5
    h2 = boxes[..., 3] * 0.5
    # Local-frame corners (+-w/2, +-h/2) rotated by theta, ccw order.
    lx = xp.stack([-w2, w2, w2, -w2], axis=-1)
    ly = xp.stack([-h2, -h2, h2, h2], axis=-1)
    gx = lx * c[..., None] - ly * s[..., None] + boxes[..., 0:1]
    gy = lx * s[..., None] + ly * c[..., None] + boxes[..., 1:2]
    return xp.stack([gx, gy], axis=-1)


def _cross(o, a, b):
    return (a[..., 0] - o[..., 0]) * (b[..., 1] - o[..., 1]) - (
        a[..., 1] - o[..., 1]
    ) * (b[..., 0] - o[..., 0])


def _segment_intersections(p1, p2, xp):
    """All 16 intersection points of quad p1's edges with quad p2's edges.

    p1, p2: (..., 4, 2). Returns points (..., 16, 2), valid (..., 16).
    """
    a = p1                                  # (..., 4, 2) edge starts of quad 1
    b = xp.roll(p1, -1, axis=-2)            # edge ends
    c = p2
    d = xp.roll(p2, -1, axis=-2)
    # Broadcast to (..., 4, 4, 2): axis -3 = quad-1 edge, axis -2 = quad-2 edge.
    a_, b_ = a[..., :, None, :], b[..., :, None, :]
    c_, d_ = c[..., None, :, :], d[..., None, :, :]
    r = b_ - a_
    s = d_ - c_
    denom = r[..., 0] * s[..., 1] - r[..., 1] * s[..., 0]
    qp = c_ - a_
    t_num = qp[..., 0] * s[..., 1] - qp[..., 1] * s[..., 0]
    u_num = qp[..., 0] * r[..., 1] - qp[..., 1] * r[..., 0]
    safe = xp.where(xp.abs(denom) > _EPS, denom, xp.ones_like(denom))
    t = t_num / safe
    u = u_num / safe
    valid = (
        (xp.abs(denom) > _EPS) & (t >= 0.0) & (t <= 1.0) & (u >= 0.0) & (u <= 1.0)
    )
    pts = a_ + t[..., None] * r
    shape = valid.shape[:-2] + (16,)
    return pts.reshape(shape + (2,)), valid.reshape(shape)


def _points_in_quad(pts, quad, xp):
    """pts (..., K, 2) inside convex ccw quad (..., 4, 2) -> (..., K) bool."""
    a = quad[..., None, :, :]                       # (..., 1, 4, 2)
    b = xp.roll(quad, -1, axis=-2)[..., None, :, :]
    p = pts[..., :, None, :]                        # (..., K, 1, 2)
    cross = (b[..., 0] - a[..., 0]) * (p[..., 1] - a[..., 1]) - (
        b[..., 1] - a[..., 1]
    ) * (p[..., 0] - a[..., 0])
    return (cross >= -1e-12).all(axis=-1)


def _masked_convex_area(pts, valid, xp):
    """Area of the convex polygon formed by the valid subset of pts.

    pts (..., K, 2), valid (..., K). Orders valid points by angle about
    their mean, routes invalid slots onto a valid vertex (zero-area
    contribution), and applies the shoelace formula.

    On device the ordering uses a multi-operand lax.sort carrying the
    coordinates as payload — argsort + take_along_axis would lower to a
    batched GatherOp that costs ~20x more than the whole area computation
    at NMS/assignment scales.
    """
    vf = valid.astype(pts.dtype)
    n = vf.sum(axis=-1, keepdims=True)
    center = (pts * vf[..., None]).sum(axis=-2, keepdims=True) / xp.maximum(n[..., None], 1.0)
    rel = pts - center
    ang = xp.arctan2(rel[..., 1], rel[..., 0])
    big = xp.asarray(1e9, dtype=pts.dtype)
    key = xp.where(valid, ang, big)          # invalid slots sort to the end

    if xp is jnp:
        import jax

        key_s, xs, ys, val_s = jax.lax.sort(
            (key, pts[..., 0], pts[..., 1], valid.astype(pts.dtype)),
            dimension=-1, num_keys=1,
        )
        pts_s = xp.stack([xs, ys], axis=-1)
        val_b = val_s > 0.5
    else:
        order = xp.argsort(key, axis=-1)
        pts_s = xp.take_along_axis(pts, order[..., None], axis=-2)
        val_b = xp.take_along_axis(valid, order, axis=-1)
    # Replace invalid slots with the first (valid) vertex -> degenerate edges.
    first = pts_s[..., 0:1, :]
    pts_s = xp.where(val_b[..., None], pts_s, first)
    nxt = xp.roll(pts_s, -1, axis=-2)
    cross = pts_s[..., 0] * nxt[..., 1] - pts_s[..., 1] * nxt[..., 0]
    area = 0.5 * xp.abs(cross.sum(axis=-1))
    return xp.where(n[..., 0] >= 3, area, xp.zeros_like(area))


def rotated_box_intersection(boxes1, boxes2, angle_mode="degrees", xp=jnp):
    """Intersection area of broadcast-compatible (..., 5) rotated boxes."""
    # Shift into a pair-local frame for precision (reference
    # box_iou_rotated_utils.h:317-329 does the same with box1's center).
    shape = xp.broadcast_shapes(boxes1.shape, boxes2.shape)
    boxes1 = xp.broadcast_to(boxes1, shape)
    boxes2 = xp.broadcast_to(boxes2, shape)
    shift = boxes1[..., 0:2]
    b1 = xp.concatenate([boxes1[..., 0:2] - shift, boxes1[..., 2:5]], axis=-1)
    b2 = xp.concatenate([boxes2[..., 0:2] - shift, boxes2[..., 2:5]], axis=-1)
    q1 = _corners(b1, angle_mode, xp)
    q2 = _corners(b2, angle_mode, xp)
    ipts, ivalid = _segment_intersections(q1, q2, xp)
    in12 = _points_in_quad(q1, q2, xp)   # quad1 vertices inside quad2
    in21 = _points_in_quad(q2, q1, xp)
    pts = xp.concatenate([ipts, q1, q2], axis=-2)        # (..., 24, 2)
    valid = xp.concatenate([ivalid, in12, in21], axis=-1)
    return _masked_convex_area(pts, valid, xp)


def rotated_iou(boxes1, boxes2, angle_mode="degrees", xp=jnp):
    """Elementwise IoU of broadcast-compatible (..., 5) rotated boxes."""
    inter = rotated_box_intersection(boxes1, boxes2, angle_mode, xp)
    a1 = boxes1[..., 2] * boxes1[..., 3]
    a2 = boxes2[..., 2] * boxes2[..., 3]
    union = a1 + a2 - inter
    return xp.where(union > 0, inter / xp.maximum(union, _EPS), xp.zeros_like(inter))


def pairwise_rotated_iou(boxes1, boxes2, angle_mode="degrees", xp=jnp):
    """(M, 5) x (N, 5) -> (M, N) IoU matrix (reference _C.box_iou_rotated)."""
    return rotated_iou(boxes1[:, None, :], boxes2[None, :, :], angle_mode, xp)


def pairwise_rotated_iou_chunked(boxes1, boxes2, angle_mode="degrees", chunk=4096):
    """Device-side (M, N) IoU computed in N-chunks to bound peak memory.

    Used for gt-vs-anchor matrices where N ~ 70k (SURVEY §3.5); candidate
    buffers are 24 points/pair so an unchunked matrix would be GBs.
    """
    import jax

    n = boxes2.shape[0]
    pad = (-n) % chunk
    b2 = jnp.pad(boxes2, ((0, pad), (0, 0)))
    b2 = b2.reshape(-1, chunk, 5)
    out = jax.lax.map(
        lambda blk: pairwise_rotated_iou(boxes1, blk, angle_mode, jnp), b2
    )  # (n_chunks, M, chunk)
    out = jnp.moveaxis(out, 0, 1).reshape(boxes1.shape[0], -1)
    return out[:, :n]


def np_pairwise_rotated_iou(boxes1, boxes2, angle_mode="degrees"):
    """Host (numpy) pairwise IoU for the augmentation collision filter
    (reference dataset/augmentation.py:141-150 ran this on CUDA in-worker)."""
    b1 = np.asarray(boxes1, dtype=np.float64)[:, None, :]
    b2 = np.asarray(boxes2, dtype=np.float64)[None, :, :]
    return rotated_iou(b1, b2, angle_mode, np).astype(np.float32)
