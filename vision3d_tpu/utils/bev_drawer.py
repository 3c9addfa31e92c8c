"""BEV occupancy visualization (reference vision3d/core/bev_drawer.py:7-84).

Scatter points into a top-down occupancy image with robust percentile
normalization and draw rotated box outlines. cv2 is optional — with it
absent (as in minimal TPU pods) boxes are rasterized with a tiny numpy
line drawer, and the image is returned as an RGB array either way.
"""

import numpy as np

from vision3d_tpu.core.boxes import box3d_to_bev_corners

try:
    import cv2
except ImportError:  # pragma: no cover - env without opencv
    cv2 = None


def clipped_percentile(x, p=1):
    """Robust [0, 1] normalization (reference bev_drawer.py:7-11)."""
    p0, p1 = np.percentile(x, [p, 100 - p])
    return (np.clip(x, p0, p1) - p0) / (p1 - p0 + 1e-1)


def make_bev_map(points_xy, pixel_size, bounds):
    """Point density image (reference bev_drawer.py:14-24)."""
    lo = bounds[:2]
    hi = bounds[2:]
    mask = ((points_xy > lo) & (points_xy < hi)).all(axis=1)
    shape = np.int32(np.ceil((hi - lo) / pixel_size))[::-1]
    pix = np.int32(np.floor((points_xy[mask] - lo) / pixel_size))
    img = np.zeros(shape, np.float32)
    np.add.at(img, (pix[:, 1], pix[:, 0]), 1.0)
    return clipped_percentile(img)


def _draw_line_np(img, p0, p1, color):
    n = int(max(abs(p1[0] - p0[0]), abs(p1[1] - p0[1]), 1)) * 2
    xs = np.linspace(p0[0], p1[0], n).astype(int)
    ys = np.linspace(p0[1], p1[1], n).astype(int)
    ok = (xs >= 0) & (xs < img.shape[1]) & (ys >= 0) & (ys < img.shape[0])
    img[ys[ok], xs[ok]] = color


class Drawer:
    """Build `.image` (H, W, 3 uint8) from points + box sets
    (reference bev_drawer.py:27-84)."""

    def __init__(self, points, boxes_sets=(), labels=(),
                 pixel_size=(0.1, 0.1), bounds=(0, -30, 60, 30)):
        self.pixel_size = np.asarray(pixel_size, np.float32)
        self.bounds = np.asarray(bounds, np.float32)
        gray = (make_bev_map(points[:, :2], self.pixel_size, self.bounds)
                * 255).astype(np.uint8)
        self.image = np.stack([gray] * 3, axis=-1)
        for boxes in boxes_sets:
            self.draw_boxes(np.asarray(boxes))

    def draw_boxes(self, boxes, color=(0, 255, 0)):
        if len(boxes) == 0:
            return
        factor = np.asarray(self.image.shape[:2][::-1]) / (
            self.bounds[2:] - self.bounds[:2]
        )
        corners = (box3d_to_bev_corners(boxes) - self.bounds[:2]) * factor
        for quad in corners:
            for i in range(4):
                p0 = quad[i]
                p1 = quad[(i + 1) % 4]
                if cv2 is not None:
                    cv2.line(
                        self.image,
                        tuple(np.int32(p0)), tuple(np.int32(p1)),
                        color, thickness=2,
                    )
                else:
                    _draw_line_np(self.image, p0, p1, np.asarray(color, np.uint8))
