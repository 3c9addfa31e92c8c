"""Detectors — public surface mirroring reference vision3d/detector/__init__.py."""

from vision3d_tpu.models.losses import proposal_loss, sigmoid_focal_loss
from vision3d_tpu.models.pvrcnn import PV_RCNN, create_pvrcnn
from vision3d_tpu.models.second import Second, create_second

__all__ = [
    "PV_RCNN",
    "Second",
    "create_pvrcnn",
    "create_second",
    "proposal_loss",
    "sigmoid_focal_loss",
]
