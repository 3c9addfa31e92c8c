import jax.numpy as jnp
import numpy as np

from vision3d_tpu.core.iou import np_pairwise_rotated_iou
from vision3d_tpu.core.nms import batched_nms_rotated, nms, nms_rotated


def greedy_nms_reference(boxes, scores, iou_threshold, groups=None):
    """O(n^2) host reference mirroring nms_rotated_cpu.cpp:7-59 semantics."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), dtype=bool)
    iou = np_pairwise_rotated_iou(boxes, boxes)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if j == i or suppressed[j]:
                continue
            if groups is not None and groups[i] != groups[j]:
                continue
            if scores[j] <= scores[i] and iou[i, j] > iou_threshold:
                # only lower-scored boxes can be suppressed by i
                if np.where(order == j)[0][0] > np.where(order == i)[0][0]:
                    suppressed[j] = True
    return np.array(sorted(keep))


def test_nms_rotated_matches_host_reference(rng):
    n = 64
    boxes = np.column_stack(
        [
            rng.uniform(0, 20, (n, 2)).reshape(n, 2),
            rng.uniform(2, 6, (n, 2)),
            rng.uniform(-3, 3, (n, 1)),
        ]
    ).astype(np.float32)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    for thresh in (0.01, 0.3, 0.7):
        keep = np.asarray(
            nms_rotated(jnp.asarray(boxes), jnp.asarray(scores), iou_threshold=thresh)
        )
        expect = greedy_nms_reference(boxes, scores, thresh)
        np.testing.assert_array_equal(np.flatnonzero(keep), expect)


def test_batched_nms_groups_do_not_interact(rng):
    # identical boxes in different groups must both survive
    boxes = np.tile(np.array([[5.0, 5.0, 2.0, 2.0, 0.0]], np.float32), (4, 1))
    scores = np.array([0.9, 0.8, 0.7, 0.6], np.float32)
    groups = np.array([0, 0, 1, 1], np.int32)
    keep = np.asarray(
        batched_nms_rotated(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(groups),
            iou_threshold=0.01,
        )
    )
    np.testing.assert_array_equal(keep, [True, False, True, False])


def test_nms_valid_mask(rng):
    boxes = np.tile(np.array([[5.0, 5.0, 2.0, 2.0, 0.0]], np.float32), (3, 1))
    scores = np.array([0.5, 0.9, 0.7], np.float32)
    valid = np.array([True, False, True])
    keep = np.asarray(
        nms_rotated(
            jnp.asarray(boxes), jnp.asarray(scores), valid=jnp.asarray(valid),
            iou_threshold=0.01,
        )
    )
    # invalid highest-scoring box neither kept nor suppressing
    np.testing.assert_array_equal(keep, [False, False, True])


def test_axis_aligned_nms():
    boxes = np.array(
        [[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], dtype=np.float32
    )
    scores = np.array([0.9, 0.8, 0.7], dtype=np.float32)
    keep = np.asarray(nms(jnp.asarray(boxes), jnp.asarray(scores), iou_threshold=0.5))
    np.testing.assert_array_equal(keep, [True, False, True])


def test_nms_is_jittable():
    import jax

    f = jax.jit(lambda b, s: nms_rotated(b, s, iou_threshold=0.01))
    b = jnp.asarray(np.random.default_rng(0).uniform(1, 5, (16, 5)), jnp.float32)
    s = jnp.linspace(0, 1, 16)
    assert f(b, s).shape == (16,)


def test_fixpoint_nms_matches_sequential_many_seeds():
    """The while_loop fixpoint formulation must equal the sequential greedy
    scan on dense suppression chains (A kills B, B would kill C, ...)."""
    import jax

    for seed in range(12):
        r = np.random.default_rng(seed)
        n = 48
        # tight clusters to force long suppression chains
        centers = np.repeat(r.uniform(0, 10, (6, 2)), 8, axis=0)
        boxes = np.column_stack(
            [
                centers + r.normal(0, 0.4, (n, 2)),
                r.uniform(2, 4, (n, 2)),
                r.uniform(-3, 3, (n, 1)),
            ]
        ).astype(np.float32)
        scores = r.uniform(0, 1, n).astype(np.float32)
        for thresh in (0.1, 0.3, 0.5):
            keep = np.asarray(
                nms_rotated(
                    jnp.asarray(boxes), jnp.asarray(scores), iou_threshold=thresh
                )
            )
            expect = greedy_nms_reference(boxes, scores, thresh)
            np.testing.assert_array_equal(
                np.flatnonzero(keep), expect, err_msg=f"seed={seed} t={thresh}"
            )
