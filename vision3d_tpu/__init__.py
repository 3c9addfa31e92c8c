"""vision3d-tpu: a TPU-native (JAX/XLA/Pallas) LiDAR 3D detection framework.

Re-implements the full capability surface of jhultman/vision3d (SECOND and
PV-RCNN detectors on KITTI) as a functional, jit-compiled, statically-shaped
pipeline designed for TPU hardware: fixed-capacity voxelization, rulebook
gather-GEMM-scatter sparse convolutions, on-device target assignment and
rotated NMS, and mesh data parallelism via jax.sharding.
"""

from vision3d_tpu.config import Config

__version__ = "0.1.0"

__all__ = ["Config"]
