"""Test harness: force CPU with a virtual 8-device mesh so every sharding
path compiles and executes without TPU hardware (SURVEY §4 test strategy).

Note: this environment's sitecustomize imports jax at interpreter startup
(registering an 'axon' TPU platform), so env vars alone are too late —
we must also flip jax_platforms via jax.config before first backend use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def tiny_cfg():
    """A small config for fast end-to-end tests on CPU."""
    from vision3d_tpu.config import Config

    cfg = Config()
    return cfg.replace(
        max_voxels=512,
        voxel_size=(0.4, 0.4, 0.1),  # z=0.1 keeps the 41->21->11->5->2 chain
        grid_bounds=(0.0, -12.8, -3.0, 25.6, 12.8, 1.0),
        num_classes=1,
        anchors=cfg.anchors[:1],
        capacity=cfg.capacity.__class__(
            max_points=2048, max_gt_boxes=8, max_detections=32
        ),
        proposal=cfg.proposal.__class__(c_in=128, topk=16),
    )
