"""Native C++ host library vs the pure-Python references."""

import numpy as np
import pytest

from vision3d_tpu.utils import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def test_native_voxelize_matches_python(tiny_cfg, rng):
    from vision3d_tpu.core.voxelize import voxelize_np

    lo = np.asarray(tiny_cfg.grid_bounds[:3])
    hi = np.asarray(tiny_cfg.grid_bounds[3:])
    pts = np.concatenate(
        [rng.uniform(lo, hi, (3000, 3)), rng.uniform(0, 1, (3000, 1))], 1
    ).astype(np.float32)
    pts[::40, 0] = -10  # out of range

    f1, c1, o1 = native.hard_voxelize(pts, tiny_cfg)
    f2, c2, o2 = voxelize_np(pts, tiny_cfg)
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(o1, o2)
    np.testing.assert_array_equal(f1, f2)


def test_native_points_in_cuboids(rng):
    from vision3d_tpu.core.boxes import points_in_cuboids_mask

    boxes = np.array(
        [[0, 0, 0, 2, 4, 2, 0.5], [8, 8, 0, 1, 2, 1, -0.7]], np.float32
    )
    pts = rng.uniform(-5, 12, (500, 4)).astype(np.float32)
    ours = native.points_in_cuboids_mask(pts, boxes)
    ref = points_in_cuboids_mask(pts, boxes)
    # boundary semantics: native uses strict <, python uses cross>0 strict
    # polygon test; random points never sit exactly on a boundary
    np.testing.assert_array_equal(ours, ref)


def test_native_fov_filter(rng):
    from vision3d_tpu.data.kitti import Calib, filter_camera_fov

    V2C = np.array([[0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0]], np.float32)
    calib = Calib(
        P2=np.array([[700, 0, 612, 0], [0, 700, 185, 0], [0, 0, 1, 0]], np.float32),
        R0=np.eye(3, dtype=np.float32),
        V2C=V2C,
    )
    pts = rng.uniform([-20, -20, -2, 0], [30, 20, 1, 1], (2000, 4)).astype(np.float32)
    ours = native.filter_camera_fov(calib, pts)
    ref = filter_camera_fov(calib, pts)
    np.testing.assert_allclose(ours, ref)
