"""End-to-end SECOND forward/inference on the tiny config (SURVEY §4c)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision3d_tpu.core.anchors import make_anchors
from vision3d_tpu.models.head import extract_detections
from vision3d_tpu.models.second import Second, create_second


def synthetic_batch(cfg, rng, batch=2, n=1200):
    lo = np.asarray(cfg.grid_bounds[:3])
    hi = np.asarray(cfg.grid_bounds[3:])
    pts = rng.uniform(lo, hi, (batch, n, 3))
    i = rng.uniform(0, 1, (batch, n, 1))
    points = np.concatenate([pts, i], -1).astype(np.float32)
    return jnp.asarray(points), jnp.full((batch,), n, jnp.int32)


@pytest.fixture(scope="module")
def model_and_vars(tiny_cfg):
    rng = np.random.default_rng(0)
    points, num = synthetic_batch(tiny_cfg, rng, batch=1, n=256)
    model, variables = create_second(
        tiny_cfg, jax.random.PRNGKey(0), (points, num)
    )
    # Warm the BN running stats with one train-mode pass; otherwise
    # eval-mode activations are wildly out of scale at init and decode's
    # exp overflows (the torch reference behaves identically).
    _, mutated = model.apply(
        variables, points, num, train=True, mutable=["batch_stats"]
    )
    variables = {**variables, "batch_stats": mutated["batch_stats"]}
    return model, variables


def test_forward_shapes(tiny_cfg, model_and_vars):
    model, variables = model_and_vars
    rng = np.random.default_rng(1)
    points, num = synthetic_batch(tiny_cfg, rng)
    cls_map, reg_map = model.apply(variables, points, num, train=False)
    ny, nx = tiny_cfg.bev_shape
    assert cls_map.shape == (2, 1, 2, ny, nx)
    assert reg_map.shape == (2, 1, 2, ny, nx, 7)
    assert np.isfinite(np.asarray(cls_map)).all()
    assert np.isfinite(np.asarray(reg_map)).all()


def test_inference_jit(tiny_cfg, model_and_vars):
    model, variables = model_and_vars
    rng = np.random.default_rng(2)
    points, num = synthetic_batch(tiny_cfg, rng)
    anchors = jnp.asarray(make_anchors(tiny_cfg))

    @jax.jit
    def infer(points, num):
        return model.apply(variables, points, num, anchors,
                           method=Second.inference)

    det = infer(points, num)
    k = tiny_cfg.num_classes * tiny_cfg.proposal.topk
    assert det.boxes.shape == (2, k, 7)
    assert det.scores.shape == (2, k)
    assert det.valid.dtype == bool
    # decoded boxes at valid slots are finite and inside a sane range
    per_sample = extract_detections(det)
    for d in per_sample:
        assert np.isfinite(d["boxes"]).all()
        assert (d["scores"] > tiny_cfg.anchors[0].score_thresh - 1e-6).all()


def test_train_mode_updates_batch_stats(tiny_cfg, model_and_vars):
    model, variables = model_and_vars
    rng = np.random.default_rng(3)
    points, num = synthetic_batch(tiny_cfg, rng)
    out, mutated = model.apply(
        variables, points, num, train=True, mutable=["batch_stats"]
    )
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(before, after)
    )


def test_empty_pointcloud_is_safe(tiny_cfg, model_and_vars):
    """Zero real points must not produce NaNs (masked BN, masked VFE)."""
    model, variables = model_and_vars
    points = jnp.zeros((1, 256, 4), jnp.float32)
    num = jnp.zeros((1,), jnp.int32)
    cls_map, reg_map = model.apply(variables, points, num, train=False)
    assert np.isfinite(np.asarray(cls_map)).all()
    assert np.isfinite(np.asarray(reg_map)).all()


def test_inference_sharded_8dev(tiny_cfg, model_and_vars):
    """Batch-sharded pjit inference over the virtual 8-device mesh: pre-NMS
    maps match the single-device run, the full decode+NMS graph executes
    sharded (train-side mesh coverage lives in test_train.py)."""
    from vision3d_tpu.parallel.mesh import make_mesh, replicate, shard_batch

    assert len(jax.devices()) == 8
    model, variables = model_and_vars
    rng = np.random.default_rng(3)
    points, num = synthetic_batch(tiny_cfg, rng, batch=8, n=256)
    anchors = jnp.asarray(make_anchors(tiny_cfg))

    def infer(variables, points, num, anchors):
        return model.apply(
            variables, points, num, anchors, method=Second.inference
        )

    cls_ref, reg_ref = jax.jit(
        lambda v, p, n: model.apply(v, p, n, train=False)
    )(variables, points, num)

    mesh = make_mesh()
    vars_r = replicate(variables, mesh)
    anchors_r = replicate(anchors, mesh)
    pts_s, num_s = shard_batch((points, num), mesh)

    # pre-NMS maps are smooth -> must match the single-device run closely
    cls_s, reg_s = jax.jit(
        lambda v, p, n: model.apply(v, p, n, train=False)
    )(vars_r, pts_s, num_s)
    assert len(cls_s.sharding.device_set) == 8
    np.testing.assert_allclose(
        np.asarray(cls_s), np.asarray(cls_ref), rtol=5e-3, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(reg_s), np.asarray(reg_ref), rtol=5e-3, atol=1e-3
    )

    # full inference graph (decode + NMS) compiles and executes sharded;
    # NMS keep bits near the IoU threshold are not bitwise stable across
    # shardings with untrained weights, so check structure not equality
    det = jax.jit(infer)(vars_r, pts_s, num_s, anchors_r)
    assert len(det.scores.sharding.device_set) == 8
    assert det.boxes.shape[0] == 8
    assert np.isfinite(np.asarray(det.boxes)).all()
    assert np.isfinite(np.asarray(det.scores)).all()
    assert np.asarray(det.valid).any()
