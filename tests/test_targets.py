import pathlib

import jax.numpy as jnp
import numpy as np

from vision3d_tpu.core.anchors import make_anchors
from vision3d_tpu.core.targets import assign_targets, subsample_labels

GOLD = pathlib.Path(__file__).parent / "goldens"


def test_matcher_stratification_golden():
    """Label stratification boundaries match detectron2 Matcher semantics
    (golden from reference ops/matcher.py on a random IoU matrix)."""
    g = np.load(GOLD / "matcher_allow0.npz")
    iou = g["iou"]  # (6, 500)
    vals = iou.max(0)
    matches = iou.argmax(0)
    labels = np.where(vals < 0.45, 0, 1)
    labels[(vals >= 0.45) & (vals < 0.6)] = -1
    np.testing.assert_array_equal(labels, g["labels"])
    np.testing.assert_array_equal(matches, g["matches"])


def test_matcher_low_quality_golden():
    g = np.load(GOLD / "matcher_allow1.npz")
    iou = g["iou"]
    vals = iou.max(0)
    labels = np.where(vals < 0.45, 0, 1)
    labels[(vals >= 0.45) & (vals < 0.6)] = -1
    best_per_gt = iou.max(1)
    rescue = (iou == best_per_gt[:, None]).any(0)
    labels[rescue] = 1
    np.testing.assert_array_equal(labels, g["labels"])


def test_assign_targets_perfect_anchor(tiny_cfg):
    """A gt box sitting exactly on an anchor yields a positive there with
    zero residual; all-ignore band and background behave as configured."""
    cfg = tiny_cfg
    anchors = jnp.asarray(make_anchors(cfg))
    a = np.asarray(anchors[0, 0, 4, 4])  # (7,) an anchor center
    boxes = np.zeros((cfg.capacity.max_gt_boxes, 7), np.float32)
    boxes[0] = a
    class_idx = np.zeros((cfg.capacity.max_gt_boxes,), np.int32)
    gt_mask = np.zeros((cfg.capacity.max_gt_boxes,), bool)
    gt_mask[0] = True
    box_ignore = np.zeros_like(gt_mask)

    t = assign_targets(
        jnp.asarray(boxes), jnp.asarray(class_idx), jnp.asarray(gt_mask),
        jnp.asarray(box_ignore), anchors, cfg,
    )
    assert t.G_cls.shape == anchors.shape[:-1]
    g = np.asarray(t.G_cls)
    m_reg = np.asarray(t.M_reg)
    assert g[0, 0, 4, 4] == 1.0
    assert m_reg[0, 0, 4, 4]
    np.testing.assert_allclose(np.asarray(t.G_reg)[0, 0, 4, 4], 0.0, atol=1e-6)
    # the same-yaw anchor is positive; most of the grid is background
    assert np.asarray(t.M_cls).mean() > 0.9


def test_assign_targets_no_gt(tiny_cfg):
    """No valid gt -> everything background (matcher.py:70-80)."""
    cfg = tiny_cfg
    anchors = jnp.asarray(make_anchors(cfg))
    G = cfg.capacity.max_gt_boxes
    t = assign_targets(
        jnp.zeros((G, 7)), jnp.zeros((G,), jnp.int32),
        jnp.zeros((G,), bool), jnp.zeros((G,), bool), anchors, cfg,
    )
    assert np.asarray(t.G_cls).sum() == 0
    assert np.asarray(t.M_cls).all()
    assert not np.asarray(t.M_reg).any()


def test_assign_targets_ignore_box(tiny_cfg):
    cfg = tiny_cfg
    anchors = jnp.asarray(make_anchors(cfg))
    a = np.asarray(anchors[0, 0, 4, 4])
    G = cfg.capacity.max_gt_boxes
    boxes = np.zeros((G, 7), np.float32)
    boxes[0] = a
    gt_mask = np.zeros((G,), bool); gt_mask[0] = True
    ignore = np.zeros((G,), bool); ignore[0] = True
    t = assign_targets(
        jnp.asarray(boxes), jnp.zeros((G,), jnp.int32), jnp.asarray(gt_mask),
        jnp.asarray(ignore), anchors, cfg,
    )
    # the would-be positive is now masked out of the cls loss
    assert not np.asarray(t.M_cls)[0, 0, 4, 4]
    assert not np.asarray(t.M_reg).any()


def test_assign_targets_wrong_class_is_background(tiny_cfg):
    """gt of class 1 must not create positives for class-0 anchors."""
    cfg = tiny_cfg.replace(num_classes=1)
    anchors = jnp.asarray(make_anchors(cfg))
    a = np.asarray(anchors[0, 0, 4, 4])
    G = cfg.capacity.max_gt_boxes
    boxes = np.zeros((G, 7), np.float32)
    boxes[0] = a
    gt_mask = np.zeros((G,), bool); gt_mask[0] = True
    class_idx = np.ones((G,), np.int32)  # class 1, not class 0
    t = assign_targets(
        jnp.asarray(boxes), jnp.asarray(class_idx), jnp.asarray(gt_mask),
        jnp.zeros((G,), bool), anchors, cfg,
    )
    assert np.asarray(t.G_cls).sum() == 0


def test_subsample_labels():
    import jax

    labels = jnp.asarray([1, 1, 1, 0, 0, 0, 0, -1, -1, 2])
    pos_m, neg_m = subsample_labels(jax.random.PRNGKey(0), labels, 4, 0.5)
    pos_m, neg_m = np.asarray(pos_m), np.asarray(neg_m)
    assert pos_m.sum() == 2 and neg_m.sum() == 2
    assert np.isin(np.flatnonzero(pos_m), [0, 1, 2, 9]).all()
    assert np.isin(np.flatnonzero(neg_m), [3, 4, 5, 6]).all()
