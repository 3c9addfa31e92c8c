"""3-class SECOND (BASELINE config #2: car/ped/cyclist batched inference)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision3d_tpu.config import Config
from vision3d_tpu.core.anchors import make_anchors
from vision3d_tpu.core.targets import assign_targets
from vision3d_tpu.models.second import Second, create_second


@pytest.fixture(scope="module")
def cfg3():
    cfg = Config()
    return cfg.replace(
        max_voxels=512,
        voxel_size=(0.4, 0.4, 0.1),
        grid_bounds=(0.0, -12.8, -3.0, 25.6, 12.8, 1.0),
        capacity=cfg.capacity.__class__(
            max_points=2048, max_gt_boxes=8, max_detections=48
        ),
        proposal=cfg.proposal.__class__(c_in=128, topk=16),
    )  # keeps all 3 default anchor classes


def test_three_class_inference(cfg3):
    assert cfg3.num_classes == 3
    rng = np.random.default_rng(0)
    lo = np.asarray(cfg3.grid_bounds[:3])
    hi = np.asarray(cfg3.grid_bounds[3:])
    pts = np.concatenate(
        [rng.uniform(lo, hi, (2, 800, 3)), rng.uniform(0, 1, (2, 800, 1))], -1
    ).astype(np.float32)
    points, num = jnp.asarray(pts), jnp.full((2,), 800, jnp.int32)
    model, variables = create_second(cfg3, jax.random.PRNGKey(0), (points[:1], num[:1]))
    anchors = jnp.asarray(make_anchors(cfg3))
    assert anchors.shape[0] == 3

    cls_map, reg_map = model.apply(variables, points, num)
    ny, nx = cfg3.bev_shape
    assert cls_map.shape == (2, 3, 2, ny, nx)

    det = jax.jit(
        lambda p, n: model.apply(variables, p, n, anchors, method=Second.inference)
    )(points, num)
    assert det.boxes.shape == (2, 3 * cfg3.proposal.topk, 7)
    # class indices span all three classes in the candidate set
    assert set(np.unique(np.asarray(det.class_idx))) == {0, 1, 2}


def test_three_class_target_assignment(cfg3):
    anchors = jnp.asarray(make_anchors(cfg3))
    G = cfg3.capacity.max_gt_boxes
    boxes = np.zeros((G, 7), np.float32)
    # one gt per class, each sitting exactly on an anchor of its class
    for c in range(3):
        boxes[c] = np.asarray(anchors[c, 0, 2 + c, 3 + c])
    class_idx = np.arange(G, dtype=np.int32) % 3
    gt_mask = np.zeros((G,), bool)
    gt_mask[:3] = True
    t = assign_targets(
        jnp.asarray(boxes), jnp.asarray(class_idx), jnp.asarray(gt_mask),
        jnp.zeros((G,), bool), anchors, cfg3,
    )
    g = np.asarray(t.G_cls)
    for c in range(3):
        assert g[c, 0, 2 + c, 3 + c] == 1.0, c
    # no cross-class positives at those sites
    assert g[1, 0, 2, 3] == 0 and g[0, 0, 3, 4] == 0
