"""Detection losses: sigmoid focal loss + smooth-L1 proposal loss.

Behavioral spec: focal loss follows the fvcore formulation the reference
vendors (vision3d/ops/focal_loss.py:5-45, alpha 0.25, gamma 2); the
proposal loss (vision3d/detector/proposal.py:100-141) applies focal loss
at all non-ignore sites and smooth-L1 at positive sites (yaw term scaled
by 1/pi), both normalized by the batch-global positive count clamped to 1;
total = cls + LAMBDA * reg.
"""

import math

import jax
import jax.numpy as jnp

from vision3d_tpu.config import Config
from vision3d_tpu.core.targets import Targets


def sigmoid_focal_loss(logits, targets, alpha: float = 0.25, gamma: float = 2.0):
    """Elementwise focal loss on logits (reference ops/focal_loss.py)."""
    p = jax.nn.sigmoid(logits)
    # numerically stable BCE-with-logits: max(x,0) - x*t + log(1+exp(-|x|))
    ce = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * (1 - p_t) ** gamma
    if alpha >= 0:
        alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
        loss = alpha_t * loss
    return loss


def smooth_l1(pred, target, beta: float = 1.0):
    """Huber/smooth-L1 with torch's default beta=1 (F.smooth_l1_loss)."""
    d = jnp.abs(pred - target)
    return jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)


def proposal_loss(cls_map, reg_map, targets: Targets, cfg: Config):
    """Returns dict(loss, cls_loss, reg_loss) (reference proposal.py:100-141).

    cls_map: (B, n_cls, n_yaw, ny, nx) logits.
    reg_map: (B, n_cls, n_yaw, ny, nx, 7) deltas.
    """
    m_reg = targets.M_reg.astype(cls_map.dtype)
    normalizer = jnp.maximum(m_reg.sum(), 1.0)

    cls = sigmoid_focal_loss(cls_map, targets.G_cls)
    cls_loss = (cls * targets.M_cls.astype(cls.dtype)).sum() / normalizer

    per = smooth_l1(reg_map, targets.G_reg)
    # Reference parity quirk: proposal.py:118-123 sums
    # (loss_xyz (,3) + loss_wlh (,3) + loss_yaw (,1)/pi) — the yaw term
    # BROADCASTS against the 3-wide sum, so it is counted three times:
    # total = sum(xyz) + sum(wlh) + 3*yaw/pi. Reproduced here.
    per = per.at[..., 6].set(per[..., 6] * (3.0 / math.pi))
    reg_loss = (per.sum(-1) * m_reg).sum() / normalizer

    loss = cls_loss + cfg.train.lam * reg_loss
    return dict(loss=loss, cls_loss=cls_loss, reg_loss=reg_loss)
