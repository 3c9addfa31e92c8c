"""Sparse conv primitives vs dense XLA convolution ground truth."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision3d_tpu.ops import sparse as sp


def flat_zmajor(keys, grid):
    """Column-major keys -> flat z-major indices into a (D,H,W) raster."""
    c = np.asarray(sp.keys_to_coords(jnp.asarray(keys), grid))
    return (c[:, 0] * grid[1] + c[:, 1]) * grid[2] + c[:, 2]


def random_sparse(rng, grid, n_active, cap, c_in):
    d, h, w = grid
    lin = rng.choice(d * h * w, size=n_active, replace=False)
    coords = np.stack([lin // (h * w), (lin // w) % h, lin % w], -1).astype(np.int32)
    feats = rng.normal(size=(n_active, c_in)).astype(np.float32)
    # pad to capacity
    coords = np.concatenate([coords, np.zeros((cap - n_active, 3), np.int32)])
    feats_p = np.concatenate([feats, np.zeros((cap - n_active, c_in), np.float32)])
    mask = np.arange(cap) < n_active
    return jnp.asarray(feats_p), jnp.asarray(coords), jnp.asarray(mask)


def dense_conv(dense_in, weight_kcc, kernel, stride, pad):
    """lax.conv_general_dilated ground truth on (D, H, W, C)."""
    k = kernel
    w = weight_kcc.reshape(k[0], k[1], k[2], dense_in.shape[-1], -1)
    out = jax.lax.conv_general_dilated(
        dense_in[None],
        w,
        window_strides=stride,
        padding=[(pad[0], pad[0]), (pad[1], pad[1]), (pad[2], pad[2])],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    return out[0]


@pytest.mark.parametrize("kernel", [(3, 3, 3), (3, 1, 1)])
def test_subm_conv_matches_dense(rng, kernel):
    grid, cap, cin, cout = (6, 10, 8), 96, 5, 7
    feats, coords, mask = random_sparse(rng, grid, 64, cap, cin)
    f, k, m = sp.make_sorted(feats, coords, mask, grid)
    weight = jnp.asarray(
        rng.normal(size=(int(np.prod(kernel)) * cin, cout)), jnp.float32
    )
    pad = tuple(s // 2 for s in kernel)
    out = sp.sparse_conv_apply(f, k, m, weight, grid, kernel, (1, 1, 1), pad)

    dense_in = np.asarray(sp.to_dense(f, k, m, grid))
    ref = dense_conv(jnp.asarray(dense_in), weight, kernel, (1, 1, 1), pad)
    kk = np.asarray(k)
    mm = np.asarray(m)
    ref_at = np.asarray(ref).reshape(-1, cout)[flat_zmajor(kk[mm], grid)]
    np.testing.assert_allclose(
        np.asarray(out)[mm], ref_at, rtol=2e-4, atol=2e-4
    )


@pytest.mark.parametrize(
    "kernel,stride,pad",
    [
        ((3, 3, 3), (2, 2, 2), (1, 1, 1)),
        ((3, 3, 3), (2, 2, 2), (0, 1, 1)),
        ((3, 1, 1), (2, 1, 1), (0, 0, 0)),
    ],
)
def test_strided_conv_matches_dense(rng, kernel, stride, pad):
    grid, cap, cin, cout = (7, 12, 10), 128, 4, 6
    feats, coords, mask = random_sparse(rng, grid, 90, cap, cin)
    f, k, m = sp.make_sorted(feats, coords, mask, grid)
    out_grid = sp.out_grid_shape(grid, kernel, stride, pad)
    ok, om, _ = sp.downsample_active_set(k, m, grid, kernel, stride, pad, cap)
    weight = jnp.asarray(
        rng.normal(size=(int(np.prod(kernel)) * cin, cout)), jnp.float32
    )
    out = sp.sparse_conv_apply(
        f, k, m, weight, out_grid, kernel, stride, pad,
        out_keys=ok, out_mask=om, in_grid=grid,
    )

    dense_in = sp.to_dense(f, k, m, grid)
    ref = np.asarray(dense_conv(dense_in, weight, kernel, stride, pad))
    ref_flat = ref.reshape(-1, cout)
    ok_flat = flat_zmajor(np.asarray(ok)[np.asarray(om)], out_grid)
    np.testing.assert_allclose(
        np.asarray(out)[np.asarray(om)],
        ref_flat[ok_flat],
        rtol=2e-4, atol=2e-4,
    )
    # active output set covers every nonzero dense site
    nz = np.abs(ref_flat).sum(-1) > 1e-6
    active = np.zeros(len(ref_flat), bool)
    active[ok_flat] = True
    assert not (nz & ~active).any(), "dense conv nonzero outside active set"


def test_downsample_capacity_truncation(rng):
    grid = (4, 8, 8)
    feats, coords, mask = random_sparse(rng, grid, 60, 64, 2)
    f, k, m = sp.make_sorted(feats, coords, mask, grid)
    ok_full, om_full, nd_full = sp.downsample_active_set(
        k, m, grid, (3, 3, 3), (2, 2, 2), (1, 1, 1), 256
    )
    n_full = int(om_full.sum())
    cap = max(n_full // 2, 1)
    ok_cut, om_cut, nd_cut = sp.downsample_active_set(
        k, m, grid, (3, 3, 3), (2, 2, 2), (1, 1, 1), cap
    )
    assert int(om_cut.sum()) == cap
    # deterministic: lowest keys kept, ascending order
    np.testing.assert_array_equal(
        np.asarray(ok_cut)[:cap], np.sort(np.asarray(ok_full)[:n_full])[:cap]
    )
    # overflow detector: zero when the cap covers the set, exact count when not
    assert int(nd_full) == 0
    assert int(nd_cut) == n_full - cap


def test_keys_roundtrip():
    grid = (5, 7, 9)
    coords = jnp.asarray([[0, 0, 0], [4, 6, 8], [2, 3, 4]], jnp.int32)
    keys = sp.coords_to_keys(coords, grid)
    back = sp.keys_to_coords(keys, grid)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(coords))


def test_batched_gather_matches_per_sample(rng):
    """gather_neighbors_batched == vmapped gather_neighbors (modulo the
    K-axis layout) for subm and strided variants."""
    import jax

    grid, cap, cin = (6, 10, 8), 96, 5
    tensors = [random_sparse(rng, grid, 64, cap, cin) for _ in range(3)]
    f = jnp.stack([sp.make_sorted(*t, grid)[0] for t in tensors])
    k = jnp.stack([sp.make_sorted(*t, grid)[1] for t in tensors])
    m = jnp.stack([sp.make_sorted(*t, grid)[2] for t in tensors])

    # subm
    ref = jax.vmap(
        lambda a, b, c: sp.gather_neighbors(a, b, c, grid, (3, 3, 3),
                                            (1, 1, 1), (1, 1, 1))
    )(f, k, m)
    got = sp.gather_neighbors_batched(f, k, m, grid, (3, 3, 3), (1, 1, 1),
                                      (1, 1, 1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=0)

    # strided
    kernel, stride, pad = (3, 3, 3), (2, 2, 2), (1, 1, 1)
    og = sp.out_grid_shape(grid, kernel, stride, pad)
    ok, om, _ = jax.vmap(
        lambda b, c: sp.downsample_active_set(b, c, grid, kernel, stride,
                                              pad, cap)
    )(k, m)
    ref = jax.vmap(
        lambda a, b, c, o1, o2: sp.gather_neighbors(
            a, b, c, og, kernel, stride, pad, o1, o2, grid)
    )(f, k, m, ok, om)
    got = sp.gather_neighbors_batched(f, k, m, og, kernel, stride, pad,
                                      ok, om, grid)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=0)


def test_batched_downsample_matches_per_sample(rng):
    import jax

    grid, cap = (6, 10, 8), 96
    tensors = [random_sparse(rng, grid, 60, cap, 2) for _ in range(3)]
    k = jnp.stack([sp.make_sorted(*t, grid)[1] for t in tensors])
    m = jnp.stack([sp.make_sorted(*t, grid)[2] for t in tensors])
    for kernel, stride, pad, out_cap in [
        ((3, 3, 3), (2, 2, 2), (1, 1, 1), 128),
        ((3, 1, 1), (2, 1, 1), (0, 0, 0), 64),
        ((3, 3, 3), (2, 2, 2), (0, 1, 1), 16),  # forces truncation
    ]:
        ref_k, ref_m, _ = jax.vmap(
            lambda a, b: sp.downsample_active_set(a, b, grid, kernel, stride,
                                                  pad, out_cap)
        )(k, m)
        got_k, got_m = sp.downsample_active_set_batched(
            k, m, grid, kernel, stride, pad, out_cap
        )
        np.testing.assert_array_equal(np.asarray(got_m), np.asarray(ref_m))
        np.testing.assert_array_equal(
            np.asarray(got_k)[np.asarray(got_m)],
            np.asarray(ref_k)[np.asarray(ref_m)],
        )


def test_sparse_conv_gradients_match_dense(rng):
    """Training correctness: d(loss)/d(weight) and d(loss)/d(features) of
    the sparse conv equal the dense convolution's gradients restricted to
    active sites (the backward pass scatters through the same rulebook)."""
    grid, cap, cin, cout = (5, 8, 7), 64, 3, 4
    kernel, stride, pad = (3, 3, 3), (1, 1, 1), (1, 1, 1)
    feats, coords, mask = random_sparse(rng, grid, 40, cap, cin)
    f, k, m = sp.make_sorted(feats, coords, mask, grid)
    weight = jnp.asarray(
        rng.normal(size=(int(np.prod(kernel)) * cin, cout)), jnp.float32
    )
    cotangent = jnp.asarray(rng.normal(size=(cap, cout)), jnp.float32)
    cotangent = jnp.where(m[:, None], cotangent, 0.0)

    def sparse_loss(f_, w_):
        out = sp.sparse_conv_apply(f_, k, m, w_, grid, kernel, stride, pad)
        return jnp.sum(out * cotangent)

    gf_s, gw_s = jax.grad(sparse_loss, argnums=(0, 1))(f, weight)

    def dense_loss(f_, w_):
        dense_in = sp.to_dense(f_, k, m, grid)
        out = dense_conv(dense_in, w_, kernel, stride, pad)
        cot_dense = sp.to_dense(cotangent, k, m, grid)
        return jnp.sum(out * cot_dense)

    gf_d, gw_d = jax.grad(dense_loss, argnums=(0, 1))(f, weight)
    np.testing.assert_allclose(np.asarray(gw_s), np.asarray(gw_d),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(gf_s)[np.asarray(m)], np.asarray(gf_d)[np.asarray(m)],
        rtol=2e-4, atol=2e-4,
    )


def test_batched_sparse_conv_gradients(rng):
    """Same check through the batched flat-gather path used by the model."""
    grid, cap, cin, cout = (5, 8, 7), 64, 3, 4
    kernel, stride, pad = (3, 3, 3), (1, 1, 1), (1, 1, 1)
    tensors = [random_sparse(rng, grid, 40, cap, cin) for _ in range(2)]
    f = jnp.stack([sp.make_sorted(*t, grid)[0] for t in tensors])
    k = jnp.stack([sp.make_sorted(*t, grid)[1] for t in tensors])
    m = jnp.stack([sp.make_sorted(*t, grid)[2] for t in tensors])
    weight = jnp.asarray(
        rng.normal(size=(int(np.prod(kernel)) * cin, cout)), jnp.float32
    )
    cot = jnp.asarray(rng.normal(size=(2, cap, cout)), jnp.float32)
    cot = jnp.where(m[..., None], cot, 0.0)

    def batched_loss(f_, w_):
        out = sp.sparse_conv_apply_batched(f_, k, m, w_, grid, kernel,
                                           stride, pad)
        return jnp.sum(out * cot)

    def vmapped_loss(f_, w_):
        out = jax.vmap(
            lambda a, b, c: sp.sparse_conv_apply(a, b, c, w_, grid, kernel,
                                                 stride, pad)
        )(f_, k, m)
        return jnp.sum(out * cot)

    gf_b, gw_b = jax.grad(batched_loss, argnums=(0, 1))(f, weight)
    gf_v, gw_v = jax.grad(vmapped_loss, argnums=(0, 1))(f, weight)
    np.testing.assert_allclose(np.asarray(gw_b), np.asarray(gw_v),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gf_b), np.asarray(gf_v),
                               rtol=1e-5, atol=1e-5)
