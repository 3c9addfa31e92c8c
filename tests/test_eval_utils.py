"""Tests for KITTI AP eval, BEV drawer, metrics, checkpointing."""

import numpy as np

from vision3d_tpu.eval.kitti_eval import (
    average_precision_r40,
    box3d_iou_matrix,
    evaluate,
    evaluate_pooled,
    get_thresholds,
)


def _frame(boxes, scores=None, cls=0, levels=None):
    boxes = np.asarray(boxes, np.float32).reshape(-1, 7)
    d = dict(boxes=boxes, class_idx=np.full(len(boxes), cls))
    if scores is not None:
        d["scores"] = np.asarray(scores, np.float32)
    if levels is not None:
        d["levels"] = np.asarray(levels)
    else:
        d["levels"] = np.ones(len(boxes), np.int64)
    return d


def test_3d_iou_identical_and_disjoint():
    a = np.array([[0, 0, 0, 2, 4, 1.5, 0.3]], np.float32)
    b = np.array([[50, 0, 0, 2, 4, 1.5, 0.3]], np.float32)
    m = box3d_iou_matrix(a, a)
    np.testing.assert_allclose(m, [[1.0]], atol=1e-5)
    assert box3d_iou_matrix(a, b)[0, 0] == 0.0


def test_3d_iou_z_offset():
    a = np.array([[0, 0, 0.0, 2, 2, 2, 0]], np.float32)
    b = np.array([[0, 0, 1.0, 2, 2, 2, 0]], np.float32)
    # BEV identical; z overlap 1 of 2 -> inter 4, union 8+8-4
    np.testing.assert_allclose(box3d_iou_matrix(a, b), [[4 / 12]], atol=1e-5)


def test_perfect_detection_ap():
    gt = [_frame([[10, 0, 0, 2, 4, 1.5, 0.1]])]
    det = [_frame([[10, 0, 0, 2, 4, 1.5, 0.1]], scores=[0.9])]
    assert evaluate_pooled(det, gt, class_idx=0) == 100.0


def test_missed_and_false_positive():
    gt = [_frame([[10, 0, 0, 2, 4, 1.5, 0.1], [20, 5, 0, 2, 4, 1.5, 0.0]])]
    det = [
        _frame(
            [[10, 0, 0, 2, 4, 1.5, 0.1], [40, -5, 0, 2, 4, 1.5, 0.0]],
            scores=[0.9, 0.8],
        )
    ]
    ap = evaluate_pooled(det, gt, class_idx=0)
    assert 0 < ap < 100  # one TP of two gt + one FP


def test_ignored_difficulty_not_counted():
    # hard gt ignored at moderate difficulty: matching det is neither TP/FP
    gt = [_frame([[10, 0, 0, 2, 4, 1.5, 0.1]], levels=[3])]
    det = [_frame([[10, 0, 0, 2, 4, 1.5, 0.1]], scores=[0.9])]
    assert evaluate_pooled(det, gt, class_idx=0, difficulty=2) == 0.0
    assert evaluate_pooled(det, gt, class_idx=0, difficulty=3) == 100.0
    # official protocol agrees that ignored gt contributes nothing
    assert evaluate(det, gt, class_idx=0, difficulty=2) == 0.0


def test_ap_r40_half_precision():
    # 1 TP then 1 FP at lower score over 1 gt: recall reaches 1 at p=1
    ap = average_precision_r40(
        np.array([0.9, 0.8]), np.array([True, False]), np.array([False, True]), 1
    )
    assert ap == 100.0


def test_bev_drawer():
    from vision3d_tpu.utils.bev_drawer import Drawer

    rng = np.random.default_rng(0)
    pts = rng.uniform([0, -30, -2, 0], [60, 30, 1, 1], (500, 4)).astype(np.float32)
    boxes = np.array([[20, 0, -1, 2, 4, 1.5, 0.5]], np.float32)
    d = Drawer(pts, [boxes])
    assert d.image.dtype == np.uint8
    assert d.image.ndim == 3
    # box outline drew green pixels
    green = (d.image[..., 1] > d.image[..., 0]).sum()
    assert green > 0


def test_metric_logger(capsys):
    from vision3d_tpu.training.metrics import MetricLogger, StdoutWriter

    log = MetricLogger([StdoutWriter()], interval=2)
    log.update(1, dict(loss=2.0))
    log.update(2, dict(loss=1.0))
    out = capsys.readouterr().out
    assert "loss_cur=1.0000" in out
    assert "loss_avg=1.5000" in out


def test_checkpoint_roundtrip(tmp_path, tiny_cfg):
    import jax

    from vision3d_tpu.training.checkpoint import maybe_resume, save_checkpoint
    from vision3d_tpu.training.train import create_train_state

    model, tx, state = create_train_state(tiny_cfg, jax.random.PRNGKey(0), 10)
    state = state.replace(step=state.step + 7)
    save_checkpoint(str(tmp_path), state, epoch=3)
    restored, next_epoch = maybe_resume(str(tmp_path), state.replace(step=state.step * 0))
    assert next_epoch == 4
    assert int(restored.step) == 7
    a = jax.tree_util.tree_leaves(state.params)[0]
    b = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # empty dir -> epoch 0, untouched
    _, e0 = maybe_resume(str(tmp_path / "nothing"), state)
    assert e0 == 0


def _grid_boxes(n, spacing=10.0):
    boxes = np.zeros((n, 7), np.float32)
    for i in range(n):
        boxes[i, :3] = [spacing * (i % 8), spacing * (i // 8), 0]
        boxes[i, 3:6] = [2, 4, 1.5]
    return boxes


def test_official_perfect_dense_is_100():
    """>= 41 gts with distinct-score perfect detections saturate every
    recall bin of the official threshold subsampling."""
    boxes = _grid_boxes(48)
    scores = np.linspace(0.99, 0.5, 48).astype(np.float32)
    gt = [_frame(boxes)]
    det = [_frame(boxes, scores=scores)]
    assert evaluate(det, gt, class_idx=0) == 100.0


def test_official_single_gt_quirk():
    """Protocol quirk (devkit eval.cpp): one perfect detection of one gt
    scores 0 under R40 — the single threshold lands on precision[0],
    which the R40 average (points 1..40) excludes."""
    gt = [_frame([[10, 0, 0, 2, 4, 1.5, 0.1]])]
    det = [_frame([[10, 0, 0, 2, 4, 1.5, 0.1]], scores=[0.9])]
    assert evaluate(det, gt, class_idx=0) == 0.0
    assert evaluate_pooled(det, gt, class_idx=0) == 100.0


def test_official_half_recall_exact():
    """40 gts, first 20 detected perfectly, no FPs: official threshold
    quantization yields exactly 47.5 (19 saturated points of 40) while
    the exact pooled integral yields 50."""
    boxes = _grid_boxes(40)
    gt = [_frame(boxes)]
    det = [_frame(boxes[:20], scores=np.linspace(0.9, 0.5, 20))]
    assert evaluate(det, gt, class_idx=0) == 47.5
    assert evaluate_pooled(det, gt, class_idx=0) == 50.0


def test_get_thresholds_recall_steps():
    scores = np.linspace(1.0, 0.1, 200)
    th = get_thresholds(scores, n_gt=200)
    assert len(th) == 41
    assert all(a > b for a, b in zip(th, th[1:]))


def test_official_vs_pooled_converge_at_scale():
    """On a large randomized set the protocol quantization error is small:
    the two computations must agree within 2 AP points."""
    rng = np.random.default_rng(7)
    gts, dets = [], []
    for _ in range(40):
        n = rng.integers(4, 10)
        boxes = np.zeros((n, 7), np.float32)
        boxes[:, :3] = rng.uniform([0, -30, -1], [60, 30, 0], (n, 3))
        boxes[:, 3:6] = [1.8, 4.2, 1.5]
        boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
        gts.append(_frame(boxes))
        # detect ~75% with small jitter, score anti-correlated with jitter
        keep = rng.uniform(size=n) < 0.75
        jitter = rng.normal(0, 0.15, (keep.sum(), 3))
        db = boxes[keep].copy()
        db[:, :3] += jitter
        ds = np.clip(0.95 - 2.0 * np.abs(jitter).sum(1), 0.05, 1.0)
        # plus false positives
        nf = rng.integers(0, 4)
        fb = np.zeros((nf, 7), np.float32)
        fb[:, :3] = rng.uniform([0, -30, -1], [60, 30, 0], (nf, 3))
        fb[:, 3:6] = [1.8, 4.2, 1.5]
        dets.append(
            _frame(
                np.concatenate([db, fb]),
                scores=np.concatenate(
                    [ds, rng.uniform(0.05, 0.6, nf)]
                ).astype(np.float32),
            )
        )
    ap_official = evaluate(dets, gts, class_idx=0)
    ap_pooled = evaluate_pooled(dets, gts, class_idx=0)
    assert 20 < ap_official < 100
    assert abs(ap_official - ap_pooled) < 2.0, (ap_official, ap_pooled)
