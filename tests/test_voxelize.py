import jax.numpy as jnp
import numpy as np

from vision3d_tpu.core.voxelize import (
    grid_dims_xyz,
    mean_vfe,
    voxelize,
    voxelize_batch,
    voxelize_np,
)


def make_points(rng, n, cfg):
    lo = np.asarray(cfg.grid_bounds[:3])
    hi = np.asarray(cfg.grid_bounds[3:])
    xyz = rng.uniform(lo, hi, (n, 3))
    i = rng.uniform(0, 1, (n, 1))
    return np.concatenate([xyz, i], axis=1).astype(np.float32)


def test_device_matches_host_reference(tiny_cfg, rng):
    """The sort-based device voxelizer reproduces the sequential first-come
    semantics (voxel ids, per-voxel point order, truncation) exactly."""
    pts = make_points(rng, 1500, tiny_cfg)
    # include out-of-range points that must be dropped
    pts[::50, 0] = -5.0
    out = voxelize(jnp.asarray(pts), jnp.int32(len(pts)), tiny_cfg)
    f_ref, c_ref, o_ref = voxelize_np(pts, tiny_cfg)
    n = int(out["num_voxels"])
    assert n == len(c_ref)
    np.testing.assert_array_equal(np.asarray(out["coords"])[:n], c_ref)
    np.testing.assert_array_equal(np.asarray(out["occupancy"])[:n], o_ref)
    np.testing.assert_allclose(np.asarray(out["features"])[:n], f_ref, atol=0)
    # padding region must be zero / masked
    assert not out["voxel_mask"][n:].any()
    assert np.all(np.asarray(out["features"])[n:] == 0)


def test_voxel_cap_truncation(tiny_cfg, rng):
    """Voxels past max_voxels are dropped in scan order, like spconv."""
    cfg = tiny_cfg.replace(max_voxels=16)
    pts = make_points(rng, 800, cfg)
    out = voxelize(jnp.asarray(pts), jnp.int32(len(pts)), cfg)
    f_ref, c_ref, o_ref = voxelize_np(pts, cfg)
    n = int(out["num_voxels"])
    assert n == 16 == len(c_ref)
    np.testing.assert_array_equal(np.asarray(out["coords"])[:n], c_ref)
    np.testing.assert_array_equal(np.asarray(out["occupancy"])[:n], o_ref)


def test_occupancy_cap(tiny_cfg):
    """Only the first max_occupancy points per voxel are stored."""
    # 10 identical points -> 1 voxel with 5 stored (first five by order)
    pts = np.tile(np.array([[1.0, 1.0, -1.0, 0.5]], np.float32), (10, 1))
    pts[:, 3] = np.arange(10)  # distinguishable intensity
    out = voxelize(jnp.asarray(pts), jnp.int32(10), tiny_cfg)
    assert int(out["num_voxels"]) == 1
    assert int(out["occupancy"][0]) == tiny_cfg.max_occupancy
    np.testing.assert_array_equal(
        np.asarray(out["features"])[0, :, 3], [0, 1, 2, 3, 4]
    )


def test_num_points_masking(tiny_cfg, rng):
    pts = make_points(rng, 100, tiny_cfg)
    full = voxelize(jnp.asarray(pts), jnp.int32(100), tiny_cfg)
    half = voxelize(jnp.asarray(pts), jnp.int32(50), tiny_cfg)
    f_ref, c_ref, _ = voxelize_np(pts[:50], tiny_cfg)
    n = int(half["num_voxels"])
    assert n == len(c_ref) <= int(full["num_voxels"])
    np.testing.assert_array_equal(np.asarray(half["coords"])[:n], c_ref)


def test_batch_voxelize_and_vfe(tiny_cfg, rng):
    pts = np.stack([make_points(rng, 400, tiny_cfg) for _ in range(3)])
    nums = jnp.asarray([400, 200, 0], jnp.int32)
    out = voxelize_batch(jnp.asarray(pts), nums, tiny_cfg)
    assert out["features"].shape == (3, tiny_cfg.max_voxels, 5, 4)
    assert int(out["num_voxels"][2]) == 0
    vfe = mean_vfe(out["features"], out["occupancy"])
    assert vfe.shape == (3, tiny_cfg.max_voxels, 4)
    assert np.isfinite(np.asarray(vfe)).all()
    # mean of a voxel's points equals vfe output
    occ0 = int(out["occupancy"][0, 0])
    expect = np.asarray(out["features"])[0, 0, :occ0].mean(0)
    np.testing.assert_allclose(np.asarray(vfe)[0, 0], expect, rtol=1e-6)


def test_grid_dims(tiny_cfg):
    from vision3d_tpu.config import Config

    assert grid_dims_xyz(Config()) == (1408, 1600, 40)
    nz = grid_dims_xyz(tiny_cfg)[2]
    assert tiny_cfg.grid_shape_zyx[0] == nz + 1  # structural +1 z pad
