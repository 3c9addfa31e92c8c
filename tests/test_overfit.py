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


def test_overfit_off_anchor_multi_object_rotated():
    """Localization quality beyond the on-anchor case (VERDICT r3 item 5):
    two gt boxes planted BETWEEN anchor sites with non-axis yaws; after
    overfitting, each gt must be matched by a decoded detection with 3D
    IoU >= 0.7 (the KITTI Car matching threshold). This exercises the
    decode path (reference proposal.py:61-80) off anchor centers — the
    blind spot an AP=0-class bug would hide in."""
    from vision3d_tpu.eval.kitti_eval import box3d_iou_matrix

    cfg = Config()
    cfg = cfg.replace(
        max_voxels=768,
        # 0.2m voxels, small extent -> 64x64 grid -> 8x8 BEV -> 1.6m
        # anchor spacing (same compute budget as the on-anchor test)
        voxel_size=(0.2, 0.2, 0.1),
        grid_bounds=(0.0, -6.4, -3.0, 12.8, 6.4, 1.0),
        num_classes=1,
        anchors=cfg.anchors[:1],
        capacity=cfg.capacity.__class__(max_points=2048, max_gt_boxes=8),
        proposal=cfg.proposal.__class__(c_in=128, topk=8),
        train=cfg.train.__class__(max_lr=0.003, epochs=1),
        # the toy grid's 1.6m anchor spacing leaves these rotated
        # off-anchor gts at max anchor-IoU ~0.26-0.30 < the 0.45 low
        # threshold; the reference's own rescue option (Matcher
        # allow_low_quality_matches, config.py:49) makes the best anchor
        # per gt positive — production 0.4m spacing doesn't need it
        allow_low_quality_matches=True,
    )
    rng = np.random.default_rng(1)
    sites = np.asarray(make_anchors(cfg))  # (1, n_yaw, ny, nx, 7)
    # offsets of ~half the anchor spacing + rotations far from the 0/90
    # anchor yaws: nothing aligns with an anchor
    gt = np.stack([
        sites[0, 0, 2, 2] + [0.8, 0.7, 0.3, 0, 0, 0, 0.45],
        sites[0, 0, 5, 5] + [-0.7, 0.9, 0.2, 0, 0, 0, -0.35],
    ]).astype(np.float32)

    def surface_points(box, n):
        """LiDAR-like points on the box's visible faces (rotated)."""
        u = rng.uniform(-0.5, 0.5, n)
        v = rng.uniform(0, 1, n)
        face = rng.integers(0, 3, n)
        lx = np.where(face == 0, -0.5, np.where(face == 1, u, u))
        ly = np.where(face == 0, u, np.where(face == 1, -0.5, u * 0))
        lz = np.where(face < 2, v - 0.5, 0.5)
        lx, ly = lx * box[4], ly * box[3]  # l along heading, w across
        c, s = np.cos(box[6]), np.sin(box[6])
        wx = c * lx - s * ly + box[0]
        wy = s * lx + c * ly + box[1]
        wz = lz * box[5] + box[2]
        return np.stack([wx, wy, wz], -1).astype(np.float32)

    pts = np.concatenate([surface_points(b, 300) for b in gt])
    bg = rng.uniform([0, -12, -2.5], [25, 12, 0.5], (700, 3)).astype(np.float32)
    xyz = np.concatenate([pts, bg])
    pts4 = np.concatenate(
        [xyz, rng.uniform(0, 1, (len(xyz), 1)).astype(np.float32)], 1
    )
    rng.shuffle(pts4)
    P = cfg.capacity.max_points
    pad = pts4[rng.integers(0, len(pts4), P - len(pts4))]
    points = jnp.asarray(np.concatenate([pts4, pad]))[None]
    num = jnp.asarray([len(pts4)], jnp.int32)
    G = cfg.capacity.max_gt_boxes
    boxes = np.zeros((1, G, 7), np.float32)
    boxes[0, :2] = gt
    gt_mask = np.zeros((1, G), bool)
    gt_mask[0, :2] = True
    batch = dict(
        points=points, num_points=num, boxes=jnp.asarray(boxes),
        class_idx=jnp.zeros((1, G), jnp.int32), gt_mask=jnp.asarray(gt_mask),
        box_ignore=jnp.zeros((1, G), bool),
    )

    # 600 steps: rotated off-anchor localization converges slowly here
    # (diagnostic trace: IoU 0.46 @ 240 steps, 0.73 @ 420, 0.94 @ 600)
    model, tx, state = create_train_state(cfg, jax.random.PRNGKey(0), 600,
                                          (points, num))
    step = jax.jit(make_train_step(model, tx, cfg), donate_argnums=0)
    for i in range(600):
        state, losses = step(state, batch)
    assert np.isfinite(float(losses["loss"]))

    anchors = jnp.asarray(make_anchors(cfg))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    det = jax.jit(
        lambda p, n: model.apply(variables, p, n, anchors, method=Second.inference)
    )(points, num)
    d = extract_detections(det)[0]
    assert len(d["boxes"]) >= 2, "need at least one detection per object"
    iou = box3d_iou_matrix(np.asarray(d["boxes"]), gt)  # (D, 2)
    best = iou.max(axis=0)
    assert (best >= 0.7).all(), (
        f"decoded boxes miss rotated off-anchor gts (best IoU {best}); "
        f"dets={np.round(np.asarray(d['boxes']), 2)} gt={np.round(gt, 2)}"
    )
