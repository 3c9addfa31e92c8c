import jax
import jax.numpy as jnp
import numpy as np

from vision3d_tpu.models.pointnet import SetAbstractionMSG
from vision3d_tpu.ops.ball_query import ball_query, group_features
from vision3d_tpu.ops.fps import furthest_point_sample, sample_keypoints


def test_fps_spreads_points():
    """FPS on a line picks the extremes before midpoints."""
    xyz = jnp.asarray(np.linspace(0, 10, 11)[:, None] * np.array([1.0, 0, 0]))
    mask = jnp.ones((11,), bool)
    idx = np.asarray(furthest_point_sample(xyz, mask, 3))
    assert idx[0] == 0          # starts at first valid point
    assert idx[1] == 10         # farthest from 0
    assert idx[2] == 5          # midpoint maximizes min-distance
    assert len(np.unique(idx)) == 3


def test_fps_ignores_invalid(rng):
    xyz = np.zeros((20, 3), np.float32)
    xyz[:10] = rng.normal(0, 1, (10, 3))
    xyz[10:] = 1000.0  # far away but masked out
    mask = np.arange(20) < 10
    idx = np.asarray(furthest_point_sample(jnp.asarray(xyz), jnp.asarray(mask), 8))
    assert (idx < 10).all()


def test_sample_keypoints_batch(rng):
    pts = jnp.asarray(rng.normal(0, 5, (2, 100, 3)).astype(np.float32))
    mask = jnp.ones((2, 100), bool)
    kp = sample_keypoints(pts, mask, 16)
    assert kp.shape == (2, 16, 3)


def test_ball_query_first_n_by_index(rng):
    """Matches pointnet2: first nsample in-ball points in index order,
    first repeated to fill."""
    src = np.zeros((10, 3), np.float32)
    src[5] = [0.1, 0, 0]
    src[2] = [0.2, 0, 0]
    src[7] = [0.15, 0, 0]
    src[0] = [5.0, 0, 0]  # out of ball
    src[1] = [6.0, 0, 0]
    src[3] = [7.0, 0, 0]
    src[4] = [8.0, 0, 0]
    src[6] = [9.0, 0, 0]
    src[8] = [10.0, 0, 0]
    src[9] = [11.0, 0, 0]
    centers = np.zeros((1, 3), np.float32)
    idx, valid = ball_query(
        jnp.asarray(src), jnp.ones((10,), bool), jnp.asarray(centers), 1.0, 5
    )
    idx, valid = np.asarray(idx), np.asarray(valid)
    # in-ball = {2, 5, 7}; first-by-index order is [2, 5, 7], filled with 2
    np.testing.assert_array_equal(idx[0], [2, 5, 7, 2, 2])
    assert valid[0].all()  # fills count as valid (duplicates of a real pt)


def test_ball_query_empty(rng):
    src = jnp.asarray(np.full((8, 3), 100.0, np.float32))
    centers = jnp.zeros((3, 3))
    idx, valid = ball_query(src, jnp.ones((8,), bool), centers, 1.0, 4)
    assert not np.asarray(valid).any()


def test_group_features_relative_coords():
    src = jnp.asarray([[1.0, 1.0, 1.0], [2.0, 2.0, 2.0]])
    feats = jnp.asarray([[10.0], [20.0]])
    idx = jnp.asarray([[0, 1]], jnp.int32)
    valid = jnp.asarray([[True, True]])
    ctr = jnp.asarray([[1.0, 1.0, 1.0]])
    g = np.asarray(group_features(src, feats, idx, valid, ctr))
    np.testing.assert_allclose(g[0, 0], [0, 0, 0, 10])
    np.testing.assert_allclose(g[0, 1], [1, 1, 1, 20])


def test_set_abstraction_shapes(rng):
    sa = SetAbstractionMSG(
        radii=(0.5, 1.0), nsamples=(4, 8), mlps=((8, 16), (8, 32))
    )
    xyz = jnp.asarray(rng.normal(0, 1, (2, 64, 3)).astype(np.float32))
    feats = jnp.asarray(rng.normal(0, 1, (2, 64, 5)).astype(np.float32))
    mask = jnp.ones((2, 64), bool)
    ctr = jnp.asarray(rng.normal(0, 1, (2, 10, 3)).astype(np.float32))
    vars_ = sa.init(jax.random.PRNGKey(0), xyz, feats, mask, ctr)
    out = sa.apply(vars_, xyz, feats, mask, ctr)
    assert out.shape == (2, 10, 16 + 32)
    assert np.isfinite(np.asarray(out)).all()


def test_set_abstraction_xyz_only(rng):
    sa = SetAbstractionMSG(radii=(1.0,), nsamples=(4,), mlps=((8,),))
    xyz = jnp.asarray(rng.normal(0, 0.5, (1, 32, 3)).astype(np.float32))
    mask = jnp.ones((1, 32), bool)
    ctr = xyz[:, :5]
    vars_ = sa.init(jax.random.PRNGKey(0), xyz, None, mask, ctr)
    out = sa.apply(vars_, xyz, None, mask, ctr)
    assert out.shape == (1, 5, 8)
