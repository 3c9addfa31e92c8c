import pathlib

import jax.numpy as jnp
import numpy as np
import pytest

from vision3d_tpu.core import iou as I

GOLD = pathlib.Path(__file__).parent / "goldens"


def test_rotated_iou_matches_reference_kernel():
    """408 pairs evaluated through the reference C++ kernel
    (box_iou_rotated_utils.h), including degenerate/touching cases."""
    g = np.load(GOLD / "rotated_iou.npz")
    pairs = g["pairs"]
    b1 = jnp.asarray(pairs[:, :5], dtype=jnp.float32)
    b2 = jnp.asarray(pairs[:, 5:], dtype=jnp.float32)
    ours = np.asarray(I.rotated_iou(b1, b2, angle_mode="degrees"))
    np.testing.assert_allclose(ours, g["ious"], atol=2e-4)


def test_rotated_iou_numpy_backend_matches_reference_kernel():
    g = np.load(GOLD / "rotated_iou.npz")
    pairs = g["pairs"]
    ours = I.rotated_iou(pairs[:, :5], pairs[:, 5:], "degrees", np)
    np.testing.assert_allclose(ours, g["ious"], atol=1e-6)


def test_identical_boxes():
    b = jnp.asarray([[1.0, 2.0, 3.0, 4.0, 0.7]])
    assert np.isclose(float(I.rotated_iou(b, b, "radians")[0]), 1.0, atol=1e-5)


def test_disjoint_boxes():
    b1 = jnp.asarray([[0.0, 0.0, 2.0, 2.0, 0.3]])
    b2 = jnp.asarray([[100.0, 0.0, 2.0, 2.0, 0.9]])
    assert float(I.rotated_iou(b1, b2, "radians")[0]) == 0.0


def test_axis_aligned_half_overlap():
    b1 = jnp.asarray([[0.0, 0.0, 2.0, 2.0, 0.0]])
    b2 = jnp.asarray([[1.0, 0.0, 2.0, 2.0, 0.0]])
    # intersection 1x2=2, union 4+4-2=6
    assert np.isclose(float(I.rotated_iou(b1, b2, "radians")[0]), 2 / 6, atol=1e-5)


def test_rotated_45deg_square_analytic():
    """Unit square vs itself rotated 45deg: intersection is the regular
    octagon with area 2*(sqrt(2)-1), giving IoU = 1/sqrt(2)."""
    b1 = jnp.asarray([[0.0, 0.0, 1.0, 1.0, 0.0]])
    b2 = jnp.asarray([[0.0, 0.0, 1.0, 1.0, np.pi / 4]])
    inter = 2 * (np.sqrt(2) - 1)
    np.testing.assert_allclose(
        float(I.rotated_box_intersection(b1, b2, "radians")[0]), inter, atol=1e-4
    )
    np.testing.assert_allclose(
        float(I.rotated_iou(b1, b2, "radians")[0]), 1 / np.sqrt(2), atol=1e-4
    )


def test_contained_box():
    b1 = jnp.asarray([[0.0, 0.0, 4.0, 4.0, 0.0]])
    b2 = jnp.asarray([[0.0, 0.0, 2.0, 2.0, 1.1]])  # rotated, fully inside
    assert np.isclose(float(I.rotated_iou(b1, b2, "radians")[0]), 4 / 16, atol=1e-4)


@pytest.mark.parametrize("angle_mode", ["radians", "degrees"])
def test_monte_carlo_agreement(angle_mode, rng):
    """Randomized cross-check of intersection areas via point sampling."""
    n = 12
    boxes1 = np.column_stack(
        [
            rng.uniform(-2, 2, (n, 2)).reshape(n, 2),
            rng.uniform(1, 5, (n, 2)),
            rng.uniform(-3, 3, (n, 1)),
        ]
    ).astype(np.float32)
    boxes2 = np.column_stack(
        [
            rng.uniform(-2, 2, (n, 2)).reshape(n, 2),
            rng.uniform(1, 5, (n, 2)),
            rng.uniform(-3, 3, (n, 1)),
        ]
    ).astype(np.float32)
    ours = np.asarray(
        I.rotated_box_intersection(jnp.asarray(boxes1), jnp.asarray(boxes2), angle_mode)
    )
    scale = np.pi / 180 if angle_mode == "degrees" else 1.0
    pts = rng.uniform(-8, 8, (200_000, 2))
    for i in range(n):
        def inside(box):
            d = pts - box[:2]
            c, s = np.cos(scale * box[4]), np.sin(scale * box[4])
            lx = d[:, 0] * c + d[:, 1] * s
            ly = -d[:, 0] * s + d[:, 1] * c
            return (np.abs(lx) <= box[2] / 2) & (np.abs(ly) <= box[3] / 2)

        mc = (inside(boxes1[i]) & inside(boxes2[i])).mean() * 16.0 * 16.0
        assert abs(mc - ours[i]) < 0.25, (i, mc, ours[i])


def test_pairwise_chunked_matches_dense():
    rng = np.random.default_rng(4)
    b1 = rng.uniform(0, 10, (5, 5)).astype(np.float32)
    b2 = rng.uniform(0, 10, (1000, 5)).astype(np.float32)
    b1[:, 2:4] += 1
    b2[:, 2:4] += 1
    dense = np.asarray(I.pairwise_rotated_iou(jnp.asarray(b1), jnp.asarray(b2)))
    chunked = np.asarray(
        I.pairwise_rotated_iou_chunked(jnp.asarray(b1), jnp.asarray(b2), chunk=128)
    )
    np.testing.assert_allclose(dense, chunked, atol=1e-6)
