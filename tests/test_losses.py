import pathlib

import jax.numpy as jnp
import numpy as np

from vision3d_tpu.config import Config
from vision3d_tpu.core.targets import Targets
from vision3d_tpu.models.losses import proposal_loss, sigmoid_focal_loss, smooth_l1

GOLD = pathlib.Path(__file__).parent / "goldens"


def test_focal_loss_golden():
    g = np.load(GOLD / "focal_loss.npz")
    ours = np.asarray(
        sigmoid_focal_loss(jnp.asarray(g["logits"]), jnp.asarray(g["targets"]))
    )
    np.testing.assert_allclose(ours, g["loss"], rtol=1e-5, atol=1e-6)


def test_smooth_l1_branches():
    p = jnp.asarray([0.0, 0.5, 2.0, -3.0])
    t = jnp.asarray([0.0, 0.0, 0.0, 0.0])
    out = np.asarray(smooth_l1(p, t))
    np.testing.assert_allclose(out, [0.0, 0.125, 1.5, 2.5], atol=1e-6)


def _fake_targets(shape, rng):
    g_cls = (rng.uniform(size=shape) > 0.99).astype(np.float32)
    m_reg = g_cls.astype(bool)
    m_cls = rng.uniform(size=shape) > 0.05
    m_cls |= m_reg
    g_reg = rng.normal(0, 0.2, shape + (7,)).astype(np.float32)
    g_reg *= m_reg[..., None]
    return Targets(
        G_cls=jnp.asarray(g_cls), M_cls=jnp.asarray(m_cls),
        G_reg=jnp.asarray(g_reg), M_reg=jnp.asarray(m_reg),
    )


def test_proposal_loss_structure(rng):
    cfg = Config().replace(num_classes=1, anchors=Config().anchors[:1])
    shape = (2, 1, 2, 8, 8)
    t = _fake_targets(shape, rng)
    cls_map = jnp.asarray(rng.normal(0, 1, shape), jnp.float32)
    reg_map = jnp.asarray(rng.normal(0, 1, shape + (7,)), jnp.float32)
    out = proposal_loss(cls_map, reg_map, t, cfg)
    total = float(out["cls_loss"]) + cfg.train.lam * float(out["reg_loss"])
    np.testing.assert_allclose(float(out["loss"]), total, rtol=1e-6)
    assert float(out["loss"]) > 0

    # perfect predictions at positive sites zero out the reg loss
    perfect = proposal_loss(cls_map, t.G_reg, t, cfg)
    np.testing.assert_allclose(float(perfect["reg_loss"]), 0.0, atol=1e-7)


def test_loss_normalized_by_positive_count(rng):
    """Loss is divided by the positive count, not the element count
    (reference proposal.py:133-141)."""
    cfg = Config().replace(num_classes=1, anchors=Config().anchors[:1])
    shape = (1, 1, 2, 4, 4)
    g_cls = np.zeros(shape, np.float32)
    g_cls[0, 0, 0, 0, 0] = 1
    t = Targets(
        G_cls=jnp.asarray(g_cls),
        M_cls=jnp.ones(shape, bool),
        G_reg=jnp.zeros(shape + (7,)),
        M_reg=jnp.asarray(g_cls.astype(bool)),
    )
    cls_map = jnp.zeros(shape)
    reg_map = jnp.ones(shape + (7,))
    out = proposal_loss(cls_map, reg_map, t, cfg)
    # smooth_l1(1,0)=0.5 for each of 6 dims + yaw 0.5*3/pi (the reference's
    # broadcast quirk triple-counts the yaw term), one positive site
    expect = 6 * 0.5 + 3 * 0.5 / np.pi
    np.testing.assert_allclose(float(out["reg_loss"]), expect, rtol=1e-6)


def test_reg_loss_matches_reference_broadcast_semantics(rng):
    """Execute the reference's own loss expressions in torch
    (proposal.py:112-131: masked_sum((l_xyz + l_wlh + l_yaw/pi) * M_reg))
    and require equality — including the quirk that the (...,1) yaw term
    broadcasts against the 3-wide xyz+wlh sum (counted 3x)."""
    import math

    import torch
    import torch.nn.functional as F

    shape = (2, 1, 2, 4, 4)
    P = rng.normal(0, 1, shape + (7,)).astype(np.float32)
    G = rng.normal(0, 1, shape + (7,)).astype(np.float32)
    m_reg = rng.uniform(size=shape) > 0.7

    tP, tG = torch.from_numpy(P), torch.from_numpy(G)
    P_xyz, P_wlh, P_yaw = tP.split([3, 3, 1], dim=-1)
    G_xyz, G_wlh, G_yaw = tG.split([3, 3, 1], dim=-1)
    l_xyz = F.smooth_l1_loss(P_xyz, G_xyz, reduction="none")
    l_wlh = F.smooth_l1_loss(P_wlh, G_wlh, reduction="none")
    l_yaw = F.smooth_l1_loss(P_yaw, G_yaw, reduction="none") / math.pi
    M = torch.from_numpy(m_reg).unsqueeze(-1)
    expect_sum = ((l_xyz + l_wlh + l_yaw) * M.float()).sum().item()
    normalizer = max(m_reg.sum(), 1)

    from vision3d_tpu.config import Config
    from vision3d_tpu.core.targets import Targets

    cfg = Config().replace(num_classes=1, anchors=Config().anchors[:1])
    t = Targets(
        G_cls=jnp.zeros(shape), M_cls=jnp.zeros(shape, bool),
        G_reg=jnp.asarray(G), M_reg=jnp.asarray(m_reg),
    )
    out = proposal_loss(jnp.zeros(shape), jnp.asarray(P), t, cfg)
    np.testing.assert_allclose(
        float(out["reg_loss"]), expect_sum / normalizer, rtol=1e-5
    )
