import pathlib

import jax.numpy as jnp
import numpy as np

from vision3d_tpu.core import boxes as B

GOLD = pathlib.Path(__file__).parent / "goldens"


def test_encode_decode_golden():
    g = np.load(GOLD / "box_encode.npz")
    enc = np.asarray(B.encode(jnp.asarray(g["boxes"]), jnp.asarray(g["anchors"])))
    dec = np.asarray(B.decode(jnp.asarray(g["deltas"]), jnp.asarray(g["anchors"])))
    # f32 log/exp differ by a few ULP between XLA and torch
    np.testing.assert_allclose(enc, g["encoded"], rtol=1e-5, atol=2e-4)
    np.testing.assert_allclose(dec, g["decoded"], rtol=1e-5, atol=2e-4)


def test_encode_decode_numpy_backend_matches_jax():
    g = np.load(GOLD / "box_encode.npz")
    enc_np = B.encode(g["boxes"], g["anchors"], xp=np)
    enc_jx = np.asarray(B.encode(jnp.asarray(g["boxes"]), jnp.asarray(g["anchors"])))
    np.testing.assert_allclose(enc_np, enc_jx, rtol=1e-5, atol=2e-4)


def test_decode_encode_roundtrip():
    """decode(encode(b)) == b when yaw residual is within [0, pi)."""
    rng = np.random.default_rng(1)
    anchors = np.column_stack(
        [
            rng.uniform(-10, 10, (32, 3)).reshape(32, 3),
            rng.uniform(1, 3, (32, 3)),
            np.zeros((32, 1)),
        ]
    ).astype(np.float32)
    boxes = anchors.copy()
    boxes[:, :3] += rng.normal(0, 1, (32, 3)).astype(np.float32)
    boxes[:, 3:6] *= np.exp(rng.normal(0, 0.1, (32, 3))).astype(np.float32)
    boxes[:, 6] = rng.uniform(0, np.pi - 1e-3, 32).astype(np.float32)
    out = B.decode(B.encode(boxes, anchors, xp=np), anchors, xp=np)
    np.testing.assert_allclose(out, boxes, rtol=1e-4, atol=1e-4)


def test_bev_corners_axis_aligned():
    box = np.array([[1.0, 2.0, 0.0, 2.0, 4.0, 1.0, 0.0]], dtype=np.float32)
    corners = B.box3d_to_bev_corners(box)
    expect = np.array([[[0, 0], [2, 0], [2, 4], [0, 4]]], dtype=np.float32)
    np.testing.assert_allclose(corners, expect, atol=1e-6)


def test_bev_corners_rotation_90deg():
    box = np.array([[0.0, 0.0, 0.0, 2.0, 4.0, 1.0, np.pi / 2]], dtype=np.float32)
    corners = B.box3d_to_bev_corners(box)
    # after +90deg ccw rotation, w-extent lies along y and l-extent along -x
    np.testing.assert_allclose(np.abs(corners[0, :, 0]).max(), 2.0, atol=1e-5)
    np.testing.assert_allclose(np.abs(corners[0, :, 1]).max(), 1.0, atol=1e-5)


def test_points_in_cuboids():
    boxes = np.array(
        [[0, 0, 0, 2, 2, 2, 0], [10, 10, 0, 2, 2, 2, np.pi / 4]], dtype=np.float32
    )
    pts = np.array(
        [
            [0, 0, 0, 1.0],       # inside box 0
            [0.9, 0.9, 0, 1.0],   # inside box 0
            [1.5, 0, 0, 1.0],     # outside both
            [10, 10, 0, 1.0],     # inside box 1
            [10.9, 10.9, 0, 1.0], # outside rotated box 1 (corner cut off)
            [0, 0, 3.0, 1.0],     # above box 0 z-slab
        ],
        dtype=np.float32,
    )
    per_box = B.points_in_cuboids(pts, boxes)
    assert len(per_box[0]) == 2
    assert len(per_box[1]) == 1
    rest = B.points_not_in_rectangles(pts, boxes)
    # z is ignored for the rectangle variant: point 5 is inside box 0's footprint
    assert rest.shape[0] == 2


def test_corner_golden_consistency_with_reference_geometry():
    """Our corners must satisfy the same ccw polygon test as the reference's."""
    rng = np.random.default_rng(2)
    boxes = np.column_stack(
        [
            rng.uniform(-5, 5, (20, 2)).reshape(20, 2),
            np.zeros((20, 1)),
            rng.uniform(1, 4, (20, 2)),
            np.ones((20, 1)),
            rng.uniform(-np.pi, np.pi, (20, 1)),
        ]
    ).astype(np.float32)
    corners = B.box3d_to_bev_corners(boxes)
    # box centers are strictly inside their own polygons
    mask = B.points_in_convex_polygon(boxes[:, :2], corners)
    assert bool(np.all(np.diag(mask)))
