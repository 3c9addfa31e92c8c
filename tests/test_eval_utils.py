"""Tests for KITTI AP eval, BEV drawer, metrics, checkpointing."""

import numpy as np

from vision3d_tpu.eval.kitti_eval import (
    average_precision_r40,
    box3d_iou_matrix,
    evaluate,
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
    assert evaluate(det, gt, class_idx=0) == 100.0


def test_missed_and_false_positive():
    gt = [_frame([[10, 0, 0, 2, 4, 1.5, 0.1], [20, 5, 0, 2, 4, 1.5, 0.0]])]
    det = [
        _frame(
            [[10, 0, 0, 2, 4, 1.5, 0.1], [40, -5, 0, 2, 4, 1.5, 0.0]],
            scores=[0.9, 0.8],
        )
    ]
    ap = evaluate(det, gt, class_idx=0)
    assert 0 < ap < 100  # one TP of two gt + one FP


def test_ignored_difficulty_not_counted():
    # hard gt ignored at moderate difficulty: matching det is neither TP/FP
    gt = [_frame([[10, 0, 0, 2, 4, 1.5, 0.1]], levels=[3])]
    det = [_frame([[10, 0, 0, 2, 4, 1.5, 0.1]], scores=[0.9])]
    assert evaluate(det, gt, class_idx=0, difficulty=2) == 0.0  # no valid gt
    assert evaluate(det, gt, class_idx=0, difficulty=3) == 100.0


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
