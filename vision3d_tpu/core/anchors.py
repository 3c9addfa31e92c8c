"""Dense BEV anchor grid generation.

Behavioral spec from the reference (vision3d/core/anchor_generator.py:5-74):
anchor centers are bin midpoints of the BEV grid at the final stride, per
class with per-class (wlh, center_z) and ``num_yaw`` yaw bins. Output layout
is (num_classes, num_yaw, ny, nx, 7), matching the reference's final
``permute(3, 2, 1, 0, 4)`` so flattened anchor indices line up with the
proposal head's flattened score/reg maps.

Pure numpy — anchors are static given the config; compute once at build time
and close over them as a constant in jit graphs.

Known intentional divergence: the reference assigns per-class ``center_z``
through an ``.expand()``-aliased tensor (anchor_generator.py:55-58), so in
multi-class configs the LAST class's center_z silently overwrites every
class (confirmed by running the reference; torch warns about the aliased
index_put_). We implement the evidently-intended per-class behavior; for the
shipped single-class car.yaml the two are identical.
"""

import numpy as np

from vision3d_tpu.config import Config


def _linspace_midpoint(x0, x1, nx):
    """nx bin midpoints of [x0, x1) (reference anchor_generator.py:5-12)."""
    dx = (x1 - x0) / nx
    return x0 + dx / 2 + dx * np.arange(nx, dtype=np.float64)


def make_anchors(cfg: Config) -> np.ndarray:
    """Build the anchor grid, shape (num_classes, num_yaw, ny, nx, 7) f32."""
    stride = cfg.strides[-1]
    pixel = np.asarray(cfg.voxel_size[:2]) * stride
    lower = np.asarray(cfg.grid_bounds[:2], dtype=np.float64)
    upper = np.asarray(cfg.grid_bounds[3:5], dtype=np.float64)
    # round, don't truncate: e.g. 38.4/0.8 is 47.999... in float64; a
    # truncating cast desyncs the anchor grid from the CNN's BEV map
    # (identical at the reference geometry where the ratios are exact)
    nx, ny = np.round((upper - lower) / pixel).astype(np.int64)

    xs = _linspace_midpoint(lower[0], upper[0], nx)  # (nx,)
    ys = _linspace_midpoint(lower[1], upper[1], ny)  # (ny,)

    n_cls, n_yaw = cfg.num_classes, cfg.num_yaw
    anchors = np.zeros((n_cls, n_yaw, ny, nx, 7), dtype=np.float32)
    anchors[..., 0] = xs[None, None, None, :]
    anchors[..., 1] = ys[None, None, :, None]
    for c, a in enumerate(cfg.anchors[:n_cls]):
        anchors[c, ..., 2] = a.center_z
        anchors[c, ..., 3:6] = np.asarray(a.wlh, dtype=np.float32)
        for j in range(n_yaw):
            anchors[c, j, ..., 6] = a.yaw[j]
    return anchors
