"""Train-step smoke tests: finite grads, decreasing loss, mesh sharding
(SURVEY §4d)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision3d_tpu.core.anchors import make_anchors
from vision3d_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from vision3d_tpu.training.train import (
    create_train_state,
    make_lr_schedule,
    make_train_step,
)


def synthetic_train_batch(cfg, rng, batch=2, n=512):
    """Points clustered inside a few gt boxes + background clutter."""
    lo = np.asarray(cfg.grid_bounds[:3])
    hi = np.asarray(cfg.grid_bounds[3:])
    G = cfg.capacity.max_gt_boxes
    boxes = np.zeros((batch, G, 7), np.float32)
    gt_mask = np.zeros((batch, G), bool)
    points = rng.uniform(lo, hi, (batch, n, 3))
    for b in range(batch):
        for g in range(2):
            center = rng.uniform(0.8 * lo + 0.2 * hi, 0.2 * lo + 0.8 * hi)
            boxes[b, g] = [*center, 1.6, 3.9, 1.56, rng.uniform(-np.pi, np.pi)]
            gt_mask[b, g] = True
            points[b, g * 50 : (g + 1) * 50] = center + rng.normal(
                0, 0.5, (50, 3)
            )
    pts = np.concatenate(
        [points, rng.uniform(0, 1, (batch, n, 1))], -1
    ).astype(np.float32)
    return dict(
        points=jnp.asarray(pts),
        num_points=jnp.full((batch,), n, jnp.int32),
        boxes=jnp.asarray(boxes),
        class_idx=jnp.zeros((batch, G), jnp.int32),
        gt_mask=jnp.asarray(gt_mask),
        box_ignore=jnp.zeros((batch, G), bool),
    )


def test_lr_schedule_shape(tiny_cfg):
    sched = make_lr_schedule(tiny_cfg.replace(), steps_per_epoch=100)
    total = tiny_cfg.train.epochs * 100
    warm = sched(int(0.3 * total))
    assert float(sched(0)) < float(warm)
    np.testing.assert_allclose(float(warm), tiny_cfg.train.max_lr, rtol=1e-2)
    assert float(sched(total - 1)) < float(sched(0))


def test_train_step_loss_decreases(tiny_cfg):
    rng = np.random.default_rng(0)
    batch = synthetic_train_batch(tiny_cfg, rng)
    model, tx, state = create_train_state(
        tiny_cfg, jax.random.PRNGKey(0), steps_per_epoch=10,
        example_batch=(batch["points"][:1], batch["num_points"][:1]),
    )
    step = jax.jit(make_train_step(model, tx, tiny_cfg))
    losses = []
    for _ in range(12):
        state, out = step(state, batch)
        losses.append(float(out["loss"]))
        assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 12


def test_train_step_sharded_8dev(tiny_cfg):
    """Data-parallel step over the virtual 8-device CPU mesh."""
    assert len(jax.devices()) == 8
    mesh = make_mesh()
    rng = np.random.default_rng(1)
    batch = synthetic_train_batch(tiny_cfg, rng, batch=8, n=256)
    model, tx, state = create_train_state(
        tiny_cfg, jax.random.PRNGKey(0), steps_per_epoch=10,
        example_batch=(batch["points"][:1], batch["num_points"][:1]),
    )
    state = replicate(state, mesh)
    batch = shard_batch(batch, mesh)
    step = jax.jit(make_train_step(model, tx, tiny_cfg), donate_argnums=0)
    state2, out = step(state, batch)
    assert np.isfinite(float(out["loss"]))
    # grads were all-reduced: params stay replicated and identical
    leaf = jax.tree_util.tree_leaves(state2.params)[0]
    assert len(leaf.sharding.device_set) == 8


def test_pvrcnn_two_stage_train_step():
    """One PV-RCNN two-stage step: finite joint loss, all grads flow."""
    from vision3d_tpu.config import Config
    from vision3d_tpu.training.train import (
        create_pvrcnn_train_state,
        make_pvrcnn_train_step,
    )

    cfg = Config()
    cfg = cfg.replace(
        max_voxels=256,
        voxel_size=(0.4, 0.4, 0.1),
        grid_bounds=(0.0, -12.8, -3.0, 25.6, 12.8, 1.0),
        num_classes=1,
        num_keypoints=32,
        anchors=cfg.anchors[:1],
        capacity=cfg.capacity.__class__(max_points=512, max_gt_boxes=8),
        proposal=cfg.proposal.__class__(c_in=128, topk=8),
        gridpool=cfg.gridpool.__class__(
            num_gridpoints=4,
            radii_pn=(0.8, 1.6),
            mlps_pn=((512, 32, 16), (512, 32, 16)),
            mlps_reduction=(4 * 32, 32, 32),
        ),
        refinement=cfg.refinement.__class__(mlps=(32, 16)),
    )
    rng = np.random.default_rng(0)
    batch = synthetic_train_batch(cfg, rng, batch=1, n=256)
    model, tx, state = create_pvrcnn_train_state(
        cfg, jax.random.PRNGKey(0), steps_per_epoch=10,
        example_batch=(batch["points"], batch["num_points"]),
    )
    step = jax.jit(make_pvrcnn_train_step(model, tx, cfg))
    state2, losses = step(state, batch)
    for k in ["loss", "cls_loss", "reg_loss", "refine_cls_loss", "refine_reg_loss"]:
        assert np.isfinite(float(losses[k])), k
    # refinement params actually updated
    p0 = jax.tree_util.tree_leaves(state.params["refinement"])[0]
    p1 = jax.tree_util.tree_leaves(state2.params["refinement"])[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))
