import jax
import jax.numpy as jnp
import numpy as np

from vision3d_tpu.config import Config
from vision3d_tpu.core.targets import assign_refinement_targets_keypoints


def _cfg():
    cfg = Config()
    anchors = tuple(
        a.__class__(**{**a.__dict__, "radius": 2.0}) for a in cfg.anchors
    )
    return cfg.replace(anchors=anchors)


def test_keypoint_refinement_targets():
    cfg = _cfg()
    keypoints = jnp.asarray(
        [[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [50.0, 50.0, 0.0], [10.0, 10.0, 0.0]]
    )
    gt = jnp.asarray([[0.5, 0.0, 0.0, 1.6, 3.9, 1.56, 0.3]])
    cls_t, reg_t = assign_refinement_targets_keypoints(
        jax.random.PRNGKey(0), keypoints, gt,
        jnp.asarray([0], jnp.int32), jnp.asarray([True]), cfg,
    )
    n_cls = cfg.num_classes
    assert cls_t.shape == (4, n_cls + 2)
    assert reg_t.shape == (4, n_cls, 7)
    # keypoints 0,1 within radius 2.0 of the gt center -> positive class 0
    assert cls_t[0, 0] == 1 and cls_t[1, 0] == 1
    assert cls_t[0, -1] == 0 and cls_t[0, -2] == 0
    # far keypoint 2: background or ignore, never positive
    assert cls_t[2, :n_cls].sum() == 0
    # reg target: center offset for keypoint 0 is gt_center - keypoint
    np.testing.assert_allclose(np.asarray(reg_t)[0, 0, :3], [0.5, 0, 0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(reg_t)[0, 0, 6], 0.3, atol=1e-5)
    # size residual relative to class anchor wlh
    wlh = np.asarray(cfg.anchors[0].wlh)
    np.testing.assert_allclose(
        np.asarray(reg_t)[0, 0, 3:6], ([1.6, 3.9, 1.56] - wlh) / wlh, atol=1e-5
    )
    # non-positive keypoints have zero reg targets
    assert np.asarray(reg_t)[2].sum() == 0


def test_keypoint_refinement_no_gt():
    cfg = _cfg()
    keypoints = jnp.zeros((8, 3))
    cls_t, reg_t = assign_refinement_targets_keypoints(
        jax.random.PRNGKey(1), keypoints, jnp.zeros((2, 7)),
        jnp.zeros((2,), jnp.int32), jnp.zeros((2,), bool), cfg,
    )
    assert cls_t[:, : cfg.num_classes].sum() == 0
    # ignore + seeded random negatives only
    assert ((cls_t[:, -1] == 1) | (cls_t[:, -2] == 1)).all()
