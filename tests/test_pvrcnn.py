"""PV-RCNN stage-1 + two-stage end-to-end tests (SURVEY configs 4 & 5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision3d_tpu.core.anchors import make_anchors
from vision3d_tpu.models.pvrcnn import PV_RCNN, bev_bilinear_gather, create_pvrcnn
from vision3d_tpu.models.refinement import (
    apply_refinements,
    refinement_loss,
    sample_gridpoints,
)


@pytest.fixture(scope="module")
def pv_cfg():
    from vision3d_tpu.config import Config

    cfg = Config()
    return cfg.replace(
        max_voxels=256,
        voxel_size=(0.4, 0.4, 0.1),
        grid_bounds=(0.0, -12.8, -3.0, 25.6, 12.8, 1.0),
        num_classes=1,
        num_keypoints=64,
        anchors=cfg.anchors[:1],
        capacity=cfg.capacity.__class__(
            max_points=512, max_gt_boxes=8, max_detections=16
        ),
        proposal=cfg.proposal.__class__(c_in=128, topk=8),
        gridpool=cfg.gridpool.__class__(
            num_gridpoints=4,
            radii_pn=(0.8, 1.6),
            mlps_pn=((512, 32, 16), (512, 32, 16)),
            mlps_reduction=(4 * 32, 32, 32),
        ),
        refinement=cfg.refinement.__class__(mlps=(32, 16)),
    )


def batch(cfg, rng, b=1, n=300):
    lo = np.asarray(cfg.grid_bounds[:3])
    hi = np.asarray(cfg.grid_bounds[3:])
    pts = np.concatenate(
        [rng.uniform(lo, hi, (b, n, 3)), rng.uniform(0, 1, (b, n, 1))], -1
    ).astype(np.float32)
    return jnp.asarray(pts), jnp.full((b,), n, jnp.int32)


@pytest.fixture(scope="module")
def pv_model(pv_cfg):
    rng = np.random.default_rng(0)
    points, num = batch(pv_cfg, rng)
    return create_pvrcnn(pv_cfg, jax.random.PRNGKey(0), (points, num))


def test_stage1_shapes(pv_cfg, pv_model):
    model, variables = pv_model
    rng = np.random.default_rng(1)
    points, num = batch(pv_cfg, rng, b=2)
    kp, feats, cls_map, reg_map = model.apply(
        variables, points, num, False, method=PV_RCNN.stage1
    )
    assert kp.shape == (2, pv_cfg.num_keypoints, 3)
    # 2 * (16+16+32+64+64) pointnet dims + 128 BEV dims = 512
    assert feats.shape == (2, pv_cfg.num_keypoints, 512)
    assert np.isfinite(np.asarray(feats)).all()
    ny, nx = pv_cfg.bev_shape
    assert cls_map.shape == (2, 1, 2, ny, nx)
    assert reg_map.shape == (2, 1, 2, ny, nx, 7)


def test_two_stage_forward(pv_cfg, pv_model):
    model, variables = pv_model
    rng = np.random.default_rng(2)
    points, num = batch(pv_cfg, rng)
    anchors = jnp.asarray(make_anchors(pv_cfg))
    out = model.apply(
        variables, points, num, anchors, jax.random.PRNGKey(1),
        train=False, method=PV_RCNN.two_stage,
    )
    k = pv_cfg.num_classes * pv_cfg.proposal.topk
    assert out["proposals"].shape == (1, k, 7)
    assert out["box_deltas"].shape == (1, k, 7)
    assert out["conf_logits"].shape == (1, k)
    assert np.isfinite(np.asarray(out["box_deltas"])).all()


def test_two_stage_inference_jit(pv_cfg, pv_model):
    model, variables = pv_model
    rng = np.random.default_rng(3)
    points, num = batch(pv_cfg, rng)
    anchors = jnp.asarray(make_anchors(pv_cfg))

    @jax.jit
    def run(p, n):
        return model.apply(
            variables, p, n, anchors, jax.random.PRNGKey(0),
            method=PV_RCNN.inference_two_stage,
        )

    det = run(points, num)
    k = pv_cfg.num_classes * pv_cfg.proposal.topk
    assert det.boxes.shape == (1, k, 7)


def test_gridpoints_inside_box():
    boxes = jnp.asarray([[[5.0, 3.0, -1.0, 2.0, 4.0, 1.5, 0.8]]])
    pts = np.asarray(sample_gridpoints(jax.random.PRNGKey(0), boxes, 64))[0, 0]
    # rotate back into the box frame and check extents
    d = pts - np.array([5.0, 3.0, -1.0])
    c, s = np.cos(0.8), np.sin(0.8)
    lx = d[:, 0] * c + d[:, 1] * s
    ly = -d[:, 0] * s + d[:, 1] * c
    assert (np.abs(lx) <= 1.0 + 1e-5).all()
    assert (np.abs(ly) <= 2.0 + 1e-5).all()
    assert (np.abs(d[:, 2]) <= 0.75 + 1e-5).all()


def test_apply_refinements_identity():
    boxes = jnp.asarray([[[5.0, 3.0, -1.0, 2.0, 4.0, 1.5, 0.8]]])
    zero = jnp.zeros_like(boxes)
    np.testing.assert_allclose(
        np.asarray(apply_refinements(zero, boxes)), np.asarray(boxes), atol=1e-6
    )


def test_refinement_loss(pv_cfg, rng):
    b, n, g = 2, 8, 4
    props = jnp.asarray(rng.uniform(1, 10, (b, n, 7)).astype(np.float32))
    props = props.at[..., 3:6].set(2.0)
    gts = props[:, :g] + 0.01  # near-perfect overlaps -> foreground
    deltas = jnp.zeros((b, n, 7))
    logits = jnp.zeros((b, n))
    out = refinement_loss(
        deltas, logits, props, jnp.ones((b, n), bool), gts,
        jnp.ones((b, g), bool), pv_cfg,
    )
    assert np.isfinite(float(out["refine_loss"]))
    assert float(out["refine_reg_loss"]) < 0.1  # tiny residuals


def test_bev_bilinear_gather(pv_cfg):
    ny, nx = pv_cfg.bev_shape
    bev = jnp.zeros((1, ny, nx, 2))
    bev = bev.at[0, 2, 3].set(jnp.asarray([1.0, 2.0]))
    stride = pv_cfg.strides[-1]
    pix = np.asarray(pv_cfg.voxel_size[:2]) * stride
    off = np.asarray(pv_cfg.grid_bounds[:2])
    # metric position of integer pixel (y=2, x=3) per the reference mapping
    xy = jnp.asarray([[[off[0] + 3 * pix[0], off[1] + 2 * pix[1]]]])
    out = np.asarray(bev_bilinear_gather(bev, xy, pv_cfg))
    np.testing.assert_allclose(out[0, 0], [1.0, 2.0], atol=1e-5)
