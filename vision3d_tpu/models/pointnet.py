"""PointNet++ multi-scale set abstraction (replaces pointnet2's
PointnetSAModuleMSG, SURVEY X3; used by reference detector/model.py:35-44
and roi_grid_pool.py:26-33).

Behavioral spec: for each radius r_i with group size s_i, gather the first
s_i in-ball source points per query center, form [xyz - center ++ feats]
(use_xyz=True adds 3 to the first MLP width, as the reference's config
widths assume), run a shared per-point MLP (1x1 conv + BN + ReLU per
layer, torch BatchNorm2d defaults eps 1e-5 / momentum 0.1) and max-pool
over the group; concatenate scales.

TPU design: grouping is gather-based (ops/ball_query.py), the shared MLP
is a dense (M*S, C) GEMM on the MXU, and pooling is a masked max. Batched
with vmap; centers with empty balls produce zeros.
"""

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vision3d_tpu.models.sparse_cnn import MaskedBatchNorm
from vision3d_tpu.ops.ball_query import ball_query, group_features


class SharedMLP(nn.Module):
    """Per-point Linear+BN+ReLU stack over (B, M, S, C) grouped features."""

    widths: Sequence[int]

    @nn.compact
    def __call__(self, x, valid, train: bool):
        b, m, s, _ = x.shape
        for w in self.widths:
            x = nn.Dense(w, use_bias=False,
                         kernel_init=nn.initializers.variance_scaling(
                             2.0, "fan_out", "normal"))(x)
            x = MaskedBatchNorm(eps=1e-5, momentum=0.9)(
                x.reshape(b, m * s, w), valid.reshape(b, m * s), train
            ).reshape(b, m, s, w)
            x = nn.relu(x)
        return x


class SetAbstractionMSG(nn.Module):
    """Multi-scale grouping SA layer.

    radii[i] pairs with nsamples[i] and mlps[i]; output feature width is
    sum(mlp[-1] for mlp in mlps). Matches the reference's construction
    where cfg.SAMPLES_PN = (16, 32) zips with the two radii
    (model.py:38-43).
    """

    radii: Tuple[float, ...]
    nsamples: Tuple[int, ...]
    mlps: Tuple[Tuple[int, ...], ...]

    @nn.compact
    def __call__(self, src_xyz, src_feats, src_mask, centers, train: bool = False):
        """src_xyz (B, N, 3), src_feats (B, N, C) or None, src_mask (B, N),
        centers (B, M, 3) -> (B, M, sum(out_widths))."""
        outs = []
        for r, s, widths in zip(self.radii, self.nsamples, self.mlps):
            def group_one(xyz, feats, mask, ctr, r=r, s=s):
                idx, valid = ball_query(xyz, mask, ctr, r, s)
                feats_in = None if feats is None else feats
                g = group_features(xyz, feats_in, idx, valid, ctr)
                return g, valid

            if src_feats is None:
                g, valid = jax.vmap(
                    lambda x, m, c: group_one(x, None, m, c)
                )(src_xyz, src_mask, centers)
            else:
                g, valid = jax.vmap(group_one)(src_xyz, src_feats, src_mask, centers)

            h = SharedMLP(widths=tuple(widths))(g, valid, train)
            pooled = jnp.max(
                jnp.where(valid[..., None], h, -jnp.inf), axis=2
            )
            pooled = jnp.where(valid.any(axis=2)[..., None], pooled, 0.0)
            outs.append(pooled)
        return jnp.concatenate(outs, axis=-1)
