"""Ball query + grouping (replaces pointnet2's CUDA kernels, SURVEY X3).

Behavioral spec: pointnet2's ball_query returns, for each query center,
the indices of the FIRST ``nsample`` source points (in index order) within
``radius``; when fewer are found the first found index is repeated to fill
the group (empty balls yield index 0). Grouping then gathers those points'
features. TPU design: squared-distance masks + lax.top_k over an
index-valued score (no sorting networks, no dynamic shapes), chunked over
query centers to bound the (M, N) distance matrix in VMEM-friendly tiles.
"""

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("nsample", "chunk"))
def ball_query(src_xyz, src_mask, centers, radius, nsample: int, chunk: int = 512):
    """src_xyz (N, 3), src_mask (N,), centers (M, 3) ->
    (indices (M, nsample) int32, valid (M, nsample) bool).

    ``valid`` marks slots backed by a real in-ball point (fill-repeats are
    marked True iff the ball was non-empty, matching pointnet2's semantics
    where repeated firsts participate in the max-pool)."""
    n = src_xyz.shape[0]
    m = centers.shape[0]
    r2 = radius * radius

    pad = (-m) % chunk
    centers_p = jnp.pad(centers, ((0, pad), (0, 0)))

    def per_chunk(c):
        d2 = jnp.sum(
            jnp.square(c[:, None, :] - src_xyz[None, :, :]), axis=-1
        )  # (chunk, N)
        in_ball = (d2 < r2) & src_mask[None, :]
        # first-nsample-by-index: top_k of negated index score
        score = jnp.where(in_ball, -jnp.arange(n, dtype=jnp.float32), -jnp.inf)
        top, idx = jax.lax.top_k(score, nsample)  # descending => ascending idx
        found = top > -jnp.inf
        cnt = found.sum(axis=-1, keepdims=True)
        first = idx[:, :1]
        idx = jnp.where(found, idx, first)  # repeat first to fill
        valid = jnp.arange(nsample)[None, :] < jnp.maximum(cnt, 0)
        valid = jnp.where(cnt > 0, jnp.ones_like(valid), valid)  # repeats count
        return idx.astype(jnp.int32), valid, (cnt[:, 0] > 0)

    idx, valid, nonempty = jax.lax.map(
        per_chunk, centers_p.reshape(-1, chunk, 3)
    )
    idx = idx.reshape(-1, nsample)[:m]
    valid = valid.reshape(-1, nsample)[:m]
    nonempty = nonempty.reshape(-1)[:m]
    return idx, valid & nonempty[:, None]


def group_features(src_xyz, src_feats, idx, valid, centers):
    """Gather grouped (xyz_rel ++ feats) for each center.

    src_feats may be None (xyz-only grouping). Returns
    (M, nsample, 3 [+C]) with invalid slots zeroed."""
    g_xyz = jnp.take(src_xyz, idx, axis=0) - centers[:, None, :]
    parts = [g_xyz]
    if src_feats is not None:
        parts.append(jnp.take(src_feats, idx, axis=0))
    out = jnp.concatenate(parts, axis=-1)
    return jnp.where(valid[..., None], out, 0.0)
