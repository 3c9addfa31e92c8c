"""Stage capacities must cover the dilated active sets on realistic clouds.

Round 1 shipped capacities that silently truncated up to 88% of late-stage
active sites; this test pins the fix: at the default (honest) capacities,
the runtime overflow detector (downsample_active_set's n_dropped return)
must report ZERO dropped sites for KITTI-density synthetic clouds through
the full SpMiddleFHD stage chain (kernels/strides/pads from the reference
vision3d/detector/sparse_cnn.py:151-175).
"""

import pathlib
import sys

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from vision3d_tpu.config import Config
from vision3d_tpu.core.voxelize import voxelize_np
from vision3d_tpu.ops import sparse as sp

STAGE_DOWN = [
    ((41, 1600, 1408), (3, 3, 3), (2, 2, 2), (1, 1, 1)),
    ((21, 800, 704), (3, 3, 3), (2, 2, 2), (1, 1, 1)),
    ((11, 400, 352), (3, 3, 3), (2, 2, 2), (0, 1, 1)),
    ((5, 200, 176), (3, 1, 1), (2, 1, 1), (0, 0, 0)),
]


@pytest.mark.slow
def test_honest_capacities_zero_dropped():
    from bench import kitti_like_points

    cfg = Config()
    rng = np.random.default_rng(3)
    for sample in range(2):
        pts = kitti_like_points(rng, 29000)[:18000]
        _, coords, _ = voxelize_np(pts, cfg)
        keys = np.sort(
            np.asarray(sp.coords_to_keys(coords.astype(np.int32), STAGE_DOWN[0][0]))
        )
        cap0 = cfg.stage_voxel_capacity(0)
        assert len(keys) <= cap0
        k = np.full(cap0, sp.sentinel_key(STAGE_DOWN[0][0]), np.int32)
        k[: len(keys)] = keys
        m = np.zeros(cap0, bool)
        m[: len(keys)] = True
        k, m = jnp.asarray(k), jnp.asarray(m)
        for si, (grid, kern, stride, pad) in enumerate(STAGE_DOWN):
            cap = cfg.stage_voxel_capacity(si + 1)
            k, m, nd = sp.downsample_active_set(k, m, grid, kern, stride,
                                                pad, cap)
            assert int(nd) == 0, (
                f"stage {si + 1} capacity {cap} dropped {int(nd)} real sites"
            )
