"""End-to-end learning sanity: overfit one synthetic scene and verify the
full pipeline (voxelize -> sparse CNN -> RPN -> head -> decode -> NMS)
detects the planted object (SURVEY §4d: train smoke beyond loss-decrease)."""

import jax
import jax.numpy as jnp
import numpy as np

from vision3d_tpu.config import Config
from vision3d_tpu.core.anchors import make_anchors
from vision3d_tpu.models.head import extract_detections
from vision3d_tpu.models.second import Second
from vision3d_tpu.training.train import create_train_state, make_train_step


def test_overfit_single_scene_detects_box():
    cfg = Config()
    cfg = cfg.replace(
        max_voxels=512,
        voxel_size=(0.4, 0.4, 0.1),
        grid_bounds=(0.0, -12.8, -3.0, 25.6, 12.8, 1.0),
        num_classes=1,
        anchors=cfg.anchors[:1],
        capacity=cfg.capacity.__class__(max_points=1024, max_gt_boxes=8),
        proposal=cfg.proposal.__class__(c_in=128, topk=8),
        train=cfg.train.__class__(max_lr=0.003, epochs=1),
    )
    rng = np.random.default_rng(0)
    # plant a car-sized box exactly on an anchor site (the toy grid's 3.2m
    # anchor spacing otherwise leaves every anchor below the 0.6 IoU
    # positive threshold — production spacing is 0.4m)
    box = np.asarray(make_anchors(cfg)[0, 0, 4, 4], np.float32)
    n_in, n_bg = 200, 600
    local = (rng.uniform(-0.5, 0.5, (n_in, 3)) * box[3:6]).astype(np.float32) + box[:3]
    bg = rng.uniform([0, -12, -2.5, 0], [25, 12, 0.5, 1], (n_bg, 4)).astype(np.float32)
    pts = np.concatenate(
        [np.concatenate([local, rng.uniform(0, 1, (n_in, 1)).astype(np.float32)], 1), bg]
    )
    rng.shuffle(pts)
    P = cfg.capacity.max_points
    pad = pts[rng.integers(0, len(pts), P - len(pts))]
    points = jnp.asarray(np.concatenate([pts, pad]))[None]
    num = jnp.asarray([len(pts)], jnp.int32)
    G = cfg.capacity.max_gt_boxes
    boxes = np.zeros((1, G, 7), np.float32)
    boxes[0, 0] = box
    gt_mask = np.zeros((1, G), bool)
    gt_mask[0, 0] = True
    batch = dict(
        points=points, num_points=num, boxes=jnp.asarray(boxes),
        class_idx=jnp.zeros((1, G), jnp.int32), gt_mask=jnp.asarray(gt_mask),
        box_ignore=jnp.zeros((1, G), bool),
    )

    model, tx, state = create_train_state(cfg, jax.random.PRNGKey(0), 160,
                                          (points, num))
    step = jax.jit(make_train_step(model, tx, cfg), donate_argnums=0)
    first = None
    for i in range(160):
        state, losses = step(state, batch)
        if first is None:
            first = float(losses["loss"])
    assert float(losses["loss"]) < first

    anchors = jnp.asarray(make_anchors(cfg))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    det = jax.jit(
        lambda p, n: model.apply(variables, p, n, anchors, method=Second.inference)
    )(points, num)
    d = extract_detections(det)[0]
    assert len(d["boxes"]) > 0, "no detections after overfitting"
    top3 = np.argsort(-d["scores"])[:3]
    errs = [np.linalg.norm(d["boxes"][i][:3] - box[:3]) for i in top3]
    assert min(errs) < 2.5, f"top-3 detections miss gt {box[:3]} (errs {errs})"
