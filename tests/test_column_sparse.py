"""Column-sparse (dense-z) conv path vs the dense-conv-verified voxel path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision3d_tpu.ops import column_sparse as csp
from vision3d_tpu.ops import sparse as sp


def random_voxels(rng, grid, n_active, cap, c):
    d, h, w = grid
    lin = rng.choice(d * h * w, size=n_active, replace=False)
    coords = np.stack([lin // (h * w), (lin // w) % h, lin % w], -1).astype(np.int32)
    feats = rng.normal(size=(n_active, c)).astype(np.float32)
    coords = np.concatenate([coords, np.zeros((cap - n_active, 3), np.int32)])
    feats = np.concatenate([feats, np.zeros((cap - n_active, c), np.float32)])
    mask = np.arange(cap) < n_active
    return jnp.asarray(feats), jnp.asarray(coords), jnp.asarray(mask)


@pytest.mark.parametrize(
    "kernel,stride,pad",
    [
        ((3, 3, 3), (1, 1, 1), (1, 1, 1)),   # submanifold
        ((3, 3, 3), (2, 2, 2), (1, 1, 1)),
        ((3, 3, 3), (2, 2, 2), (0, 1, 1)),
        ((3, 1, 1), (2, 1, 1), (0, 0, 0)),
    ],
)
def test_column_conv_matches_voxel_conv(rng, kernel, stride, pad):
    grid, cap, cin, cout = (7, 12, 10), 128, 5, 8
    feats, coords, mask = random_voxels(rng, grid, 90, cap, cin)
    weight = jnp.asarray(
        rng.normal(size=(int(np.prod(kernel)) * cin, cout)), jnp.float32
    )

    # voxel-sparse result (dense-conv verified in test_sparse.py)
    f, k, m = sp.make_sorted(feats, coords, mask, grid)
    subm = stride == (1, 1, 1)
    if subm:
        vout = sp.sparse_conv_apply(f, k, m, weight, grid, kernel, stride, pad)
        vkeys, vmask, vgrid = k, m, grid
    else:
        vgrid = sp.out_grid_shape(grid, kernel, stride, pad)
        vkeys, vmask, _ = sp.downsample_active_set(k, m, grid, kernel, stride, pad, cap)
        vout = sp.sparse_conv_apply(
            f, k, m, weight, vgrid, kernel, stride, pad,
            out_keys=vkeys, out_mask=vmask, in_grid=grid,
        )

    # column-sparse result
    cf, cz, ck, cm = csp.columns_from_voxels(feats, coords, mask, grid, cap)
    if subm:
        cout_f, cout_z = csp.column_conv(cf, cz, ck, cm, weight, grid, kernel,
                                         stride, pad)
        okeys, omask, ogrid = ck, cm, grid
    else:
        ogrid = sp.out_grid_shape(grid, kernel, stride, pad)
        okeys, omask, _ = csp.downsample_bev_columns(
            ck, cm, grid, (kernel[1], kernel[2]), (stride[1], stride[2]),
            (pad[1], pad[2]), cap, (ogrid[1], ogrid[2]),
        )
        cout_f, cout_z = csp.column_conv(
            cf, cz, ck, cm, weight, grid, kernel, stride, pad,
            out_keys=okeys, out_mask=omask, out_grid=ogrid,
        )

    # compare at every active voxel site: map voxel keys -> (col, z)
    d_o, h_o, w_o = ogrid
    vk = np.asarray(vkeys)[np.asarray(vmask)]
    vo = np.asarray(vout)[np.asarray(vmask)]
    z = vk % d_o
    y = vk // (w_o * d_o)
    x = (vk // d_o) % w_o
    bev = y * w_o + x
    col_of = {int(b): i for i, b in enumerate(np.asarray(okeys)) if np.asarray(omask)[i]}
    cz_np = np.asarray(cout_z)
    cf_np = np.asarray(cout_f)
    for i in range(len(vk)):
        ci = col_of[int(bev[i])]
        assert cz_np[ci, z[i]], (i, "site inactive in column result")
        np.testing.assert_allclose(
            cf_np[ci, z[i]], vo[i], rtol=2e-4, atol=2e-4,
        )
    # and no extra active sites in the column result
    assert cz_np[np.asarray(omask)].sum() == len(vk)


def test_columns_roundtrip_voxels(rng):
    grid, cap, c = (6, 9, 11), 96, 4
    feats, coords, mask = random_voxels(rng, grid, 70, cap, c)
    cf, cz, ck, cm = csp.columns_from_voxels(feats, coords, mask, grid, cap)
    f2, k2, m2 = csp.columns_to_voxels(cf, cz, ck, cm, grid, cap)
    # same multiset of (key, feature) pairs
    ref = {}
    f, k, m = sp.make_sorted(feats, coords, mask, grid)
    for i in np.flatnonzero(np.asarray(m)):
        ref[int(np.asarray(k)[i])] = np.asarray(f)[i]
    got_mask = np.asarray(m2)
    assert got_mask.sum() == len(ref)
    for i in np.flatnonzero(got_mask):
        key = int(np.asarray(k2)[i])
        np.testing.assert_allclose(np.asarray(f2)[i], ref[key], atol=0)


def test_columns_to_bev_matches_voxel_to_bev(rng):
    grid, cap, c = (2, 8, 6), 64, 3
    feats, coords, mask = random_voxels(rng, grid, 40, cap, c)
    f, k, m = sp.make_sorted(feats, coords, mask, grid)
    dense = np.asarray(sp.to_dense(f, k, m, grid))  # (D, H, W, C)
    expect = np.transpose(dense, (1, 2, 3, 0)).reshape(
        grid[1], grid[2], c * grid[0]
    )
    cf, cz, ck, cm = csp.columns_from_voxels(feats, coords, mask, grid, cap)
    got = np.asarray(csp.columns_to_bev(cf, cz, ck, cm, grid))
    np.testing.assert_allclose(got, expect, atol=0)


def test_model_backends_agree(rng):
    """Full SpMiddleFHD: column backend == voxel backend with shared weights."""
    import flax

    from vision3d_tpu.config import Config
    from vision3d_tpu.models.sparse_cnn import (
        SpMiddleFHD,
        from_voxels,
        from_voxels_columns,
    )

    cfg = Config().replace(
        max_voxels=256,
        voxel_size=(0.4, 0.4, 0.1),
        grid_bounds=(0.0, -12.8, -3.0, 25.6, 12.8, 1.0),
        num_classes=1,
        anchors=Config().anchors[:1],
        # generous stage capacities: random (non-surface) clouds dilate up
        # to 8x under stride-2, and the two backends truncate differently
        # (lowest ZYX keys vs lowest BEV columns) once capacity binds
        capacity=Config().capacity.__class__(stage_capacity=(8.0,) * 5),
    )
    grid = cfg.grid_shape_zyx
    feats, coords, mask = random_voxels(rng, grid, 200, 256, 4)
    fb = jnp.stack([feats, feats * 0.5])
    cb = jnp.stack([coords, coords])
    mb = jnp.stack([mask, mask])

    model = SpMiddleFHD(cfg)
    stv = from_voxels(fb, cb, mb, grid)
    variables = model.init(jax.random.PRNGKey(0), stv, False)
    _, bev_v = model.apply(variables, stv, False)

    stc, _ = from_voxels_columns(fb, cb, mb, grid, cfg.max_voxels)
    _, bev_c = model.apply(variables, stc, False)
    # unnormalized eval-mode activations blow up through 10 layers, so
    # accumulation-order differences show as ~3e-3 relative noise
    np.testing.assert_allclose(
        np.asarray(bev_c), np.asarray(bev_v), rtol=2e-2, atol=2e-2
    )


def test_lite_variant_runs(rng):
    """SpMiddleFHDLite (strided-only, reference sparse_cnn.py:178-186)."""
    import jax

    from vision3d_tpu.config import Config
    from vision3d_tpu.models.sparse_cnn import SpMiddleFHDLite, from_voxels

    cfg = Config().replace(
        max_voxels=128,
        voxel_size=(0.4, 0.4, 0.1),
        grid_bounds=(0.0, -12.8, -3.0, 25.6, 12.8, 1.0),
        num_classes=1,
        anchors=Config().anchors[:1],
    )
    grid = cfg.grid_shape_zyx
    feats, coords, mask = random_voxels(rng, grid, 100, 128, 4)
    st = from_voxels(feats[None], coords[None], mask[None], grid)
    model = SpMiddleFHDLite(cfg)
    variables = model.init(jax.random.PRNGKey(0), st, False)
    scales, bev = model.apply(variables, st, False)
    ny, nx = cfg.bev_shape
    assert bev.shape == (1, ny, nx, 128)
    assert len(scales) == 4
