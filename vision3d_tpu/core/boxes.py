"""Box encode/decode and BEV geometry, backend-generic (numpy or jax.numpy).

Behavioral spec from the reference (vision3d/core/box_encode.py:5-36,
vision3d/core/geometry.py:4-24). VoxelNet-style encoding: xy normalized by
the anchor's BEV diagonal, z by anchor height, wlh as log ratios, and an
asymmetric yaw treatment — encode wraps the residual mod pi, decode adds the
raw residual to the anchor yaw.

All functions are pure and shape-polymorphic over leading dims; pass
``xp=numpy`` for host-side use or ``xp=jax.numpy`` (default) on device.
"""

import math

import jax.numpy as jnp
import numpy as np


def _anchor_diagonal(A_wlh, xp):
    """Per-anchor normalizer: BEV diagonal for x/y and z; height for h.

    Matches reference core/box_encode.py:5-11 — the wl-norm is broadcast
    over the first two (x, y) slots and h fills the third.
    """
    diag = xp.sqrt(A_wlh[..., 0:1] ** 2 + A_wlh[..., 1:2] ** 2)
    return xp.concatenate([diag, diag, A_wlh[..., 2:3]], axis=-1)


def encode(boxes, anchors, xp=jnp):
    """Encode (*, 7) boxes against (*, 7) anchors -> (*, 7) deltas.

    Reference core/box_encode.py:26-36; yaw residual wrapped into [0, pi).
    """
    G_xyz, G_wlh, G_yaw = boxes[..., 0:3], boxes[..., 3:6], boxes[..., 6:7]
    A_xyz, A_wlh, A_yaw = anchors[..., 0:3], anchors[..., 3:6], anchors[..., 6:7]
    A_norm = _anchor_diagonal(A_wlh, xp)
    return xp.concatenate(
        [
            (G_xyz - A_xyz) / A_norm,
            xp.log(G_wlh / A_wlh),
            (G_yaw - A_yaw) % math.pi,
        ],
        axis=-1,
    )


def decode(deltas, anchors, xp=jnp, max_wlh_delta=10.0):
    """Decode (*, 7) deltas against (*, 7) anchors -> (*, 7) boxes.

    Reference core/box_encode.py:13-23; note the raw (unwrapped) yaw add —
    this asymmetry is part of the reference contract.

    ``max_wlh_delta`` clamps the log-size residual before exp (serving
    safety: an untrained or adversarial delta can otherwise overflow to
    inf; e^10 ~ 22000x is far beyond any trained residual, so this never
    binds on real checkpoints). Pass None for raw reference behavior.
    """
    P_xyz, P_wlh, P_yaw = deltas[..., 0:3], deltas[..., 3:6], deltas[..., 6:7]
    if max_wlh_delta is not None:
        P_wlh = xp.clip(P_wlh, -max_wlh_delta, max_wlh_delta)
    A_xyz, A_wlh, A_yaw = anchors[..., 0:3], anchors[..., 3:6], anchors[..., 6:7]
    A_norm = _anchor_diagonal(A_wlh, xp)
    return xp.concatenate(
        [P_xyz * A_norm + A_xyz, xp.exp(P_wlh) * A_wlh, P_yaw + A_yaw],
        axis=-1,
    )


def box3d_to_bev_corners(boxes, xp=np):
    """(N, 7) boxes -> (N, 4, 2) BEV corner polygons, counter-clockwise.

    Reference core/geometry.py:13-24. Box layout is (x, y, z, w, l, h, yaw);
    w spans the box's local x-extent and l its local y-extent before rotation,
    matching the reference's ``wl * [[-1,-1],[+1,-1],[+1,+1],[-1,+1]] / 2``.
    """
    xy = boxes[..., 0:2]
    wl = boxes[..., 3:5]
    yaw = boxes[..., 6]
    c, s = xp.cos(yaw), xp.sin(yaw)
    # Rotation matrix R = [[c, -s], [s, c]] applied to each corner.
    unit = xp.asarray(
        [[-0.5, -0.5], [0.5, -0.5], [0.5, 0.5], [-0.5, 0.5]], dtype=boxes.dtype
    )
    corners = wl[..., None, :] * unit  # (N, 4, 2) in box frame
    cx = corners[..., 0] * c[..., None] - corners[..., 1] * s[..., None]
    cy = corners[..., 0] * s[..., None] + corners[..., 1] * c[..., None]
    return xp.stack([cx, cy], axis=-1) + xy[..., None, :]


def points_in_convex_polygon(points, polygons, xp=np, ccw=True):
    """points (N, 2), polygons (M, V, 2) -> mask (N, M).

    True where point n lies strictly inside convex polygon m
    (reference core/geometry.py:4-10).
    """
    rolled = xp.roll(polygons, shift=1, axis=1)
    sign = -1.0 if ccw else 1.0
    side = sign * (polygons - rolled)[None]          # (1, M, V, 2)
    v2p = polygons[None] - points[:, None, None]     # (N, M, V, 2)
    cross = side[..., 0] * v2p[..., 1] - side[..., 1] * v2p[..., 0]
    return (cross > 0).all(axis=2)


def points_in_cuboids_mask(points, boxes, xp=np):
    """points (N, >=3), boxes (M, 7) -> (N, M) bool membership mask.

    Combines the z-slab test with the BEV polygon test
    (reference core/geometry.py:27-50, PointsInCuboids).
    """
    z = points[:, None, 2]
    z_c, h = boxes[:, 2], boxes[:, 5]
    zmask = (z > z_c - h / 2) & (z < z_c + h / 2)
    polygons = box3d_to_bev_corners(boxes, xp=xp)
    return zmask & points_in_convex_polygon(points[:, :2], polygons, xp=xp)


def points_in_cuboids(points, boxes):
    """Host helper: list of per-box point arrays (reference PointsInCuboids)."""
    mask = points_in_cuboids_mask(points, boxes, xp=np).T
    return [points[m] for m in mask]


def points_not_in_rectangles(points, boxes):
    """Host helper: points outside every box's BEV footprint
    (reference core/geometry.py:56-65, PointsNotInRectangles)."""
    polygons = box3d_to_bev_corners(boxes, xp=np)
    mask = points_in_convex_polygon(points[:, :2], polygons, xp=np)
    return points[~mask.any(axis=1)]
