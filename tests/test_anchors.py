import pathlib

import numpy as np

from vision3d_tpu.config import Config
from vision3d_tpu.core.anchors import make_anchors

GOLD = pathlib.Path(__file__).parent / "goldens"


def test_anchor_grid_matches_reference():
    """Full layout/ordering parity with reference core/anchor_generator.py:73.

    Exception: the reference's per-class center_z assignment aliases through
    an expanded tensor so the last class's value overwrites all classes (a
    confirmed reference bug — see vision3d_tpu/core/anchors.py docstring).
    We compare everything except the z column, then check z per class.
    """
    g = np.load(GOLD / "anchors.npz")
    cfg = Config()
    anchors = make_anchors(cfg)
    assert tuple(anchors.shape) == tuple(g["shape"])
    not_z = [0, 1, 3, 4, 5, 6]
    np.testing.assert_allclose(
        anchors[:, :, ::17, ::13][..., not_z], g["sample"][..., not_z], atol=1e-5
    )
    np.testing.assert_allclose(anchors[:, :, 0, 0][..., not_z],
                               g["corner000"][..., not_z], atol=1e-5)
    np.testing.assert_allclose(anchors[:, :, -1, -1][..., not_z],
                               g["corner_end"][..., not_z], atol=1e-5)
    # reference collapses all center_z to the last class's value...
    assert np.allclose(g["sample"][..., 2], cfg.anchors[-1].center_z)
    # ...we keep them per class as configured
    for c, a in enumerate(cfg.anchors):
        assert np.allclose(anchors[c, ..., 2], a.center_z)


def test_anchor_midpoints():
    cfg = Config()
    anchors = make_anchors(cfg)
    # first x center = lower bound + half pixel at stride 8
    pixel = cfg.voxel_size[0] * cfg.strides[-1]
    assert np.isclose(anchors[0, 0, 0, 0, 0], cfg.grid_bounds[0] + pixel / 2)
    assert np.isclose(anchors[0, 0, 0, 0, 1], cfg.grid_bounds[1] + pixel / 2)
    # x varies along the last spatial axis, y along the second-to-last
    assert np.all(np.diff(anchors[0, 0, 0, :, 0]) > 0)
    assert np.all(np.diff(anchors[0, 0, :, 0, 1]) > 0)
