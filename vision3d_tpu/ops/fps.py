"""Furthest point sampling (replaces pointnet2's CUDA FPS, SURVEY X3).

Behavioral spec: pointnet2.furthest_point_sample starts from point 0 and
iteratively picks the point maximizing the min-distance to the chosen set
(reference detector/model.py:46-56 samples 2048 keypoints from the padded
cloud). TPU design: a fori_loop of masked argmax over a running min-
distance array — K sequential steps of N-wide VPU reductions, O(K*N),
fully inside jit. Padding/invalid points get -inf distance so they are
never selected; if num_points == 0 all indices are 0.
"""

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("k",))
def furthest_point_sample(xyz, mask, k: int):
    """xyz (N, 3), mask (N,) bool -> indices (K,) int32."""
    n = xyz.shape[0]
    neg = jnp.asarray(-jnp.inf, xyz.dtype)
    # min-distance to the selected set so far; invalid points never win
    dist = jnp.where(mask, jnp.asarray(jnp.inf, xyz.dtype), neg)
    first = jnp.argmax(mask)  # first valid point (pointnet2 starts at 0)

    def body(i, carry):
        dist, idxs = carry
        cur = xyz[idxs[i - 1]]
        d = jnp.sum(jnp.square(xyz - cur), axis=-1)
        dist = jnp.minimum(dist, jnp.where(mask, d, neg))
        idxs = idxs.at[i].set(jnp.argmax(dist).astype(jnp.int32))
        return dist, idxs

    idxs = jnp.zeros((k,), jnp.int32).at[0].set(first.astype(jnp.int32))
    _, idxs = jax.lax.fori_loop(1, k, body, (dist, idxs))
    return idxs


def sample_keypoints(points_xyz, mask, k: int):
    """Batched FPS + gather (reference model.py:46-56).

    points_xyz (B, N, 3), mask (B, N) -> keypoints (B, K, 3)."""
    idxs = jax.vmap(lambda x, m: furthest_point_sample(x, m, k))(points_xyz, mask)
    return jnp.take_along_axis(points_xyz, idxs[..., None], axis=1)
