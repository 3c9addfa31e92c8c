"""Column-sparse 3D convolution: sparse in BEV, dense in z.

The voxel-sparse path (ops/sparse.py) gathers 27 small rows per active
voxel per layer; on TPU that row gather runs on the scalar core and
dominates the whole detector. This representation exploits the workload's
anisotropy — KITTI z-extents are tiny (41 -> 21 -> 11 -> 5 -> 2,
reference sparse_cnn.py:48-56) while BEV extents are large — by storing
every active BEV column densely in z:

    feats (Ncol, D, C)  +  zmask (Ncol, D)  +  sorted bev_keys (Ncol,)

A 3x3x3 sparse conv then decomposes into a gather of 9 BEV-neighbor
columns (large contiguous (D*C) rows — bandwidth-bound, not scalar-bound)
followed by static z-window slicing and ONE (Ncol*D_out, kz*9*C) GEMM on
the MXU. Semantics are exactly spconv's: submanifold convs compute at
active sites only (outputs masked to the input zmask), strided convs
activate any site with >= 1 active input in its receptive field.

Weight layout matches ops/sparse.py: (K*Cin, Cout) with K ordered
(dz, dy, dx) row-major, so the two implementations are weight-compatible
(tested against each other, which is in turn dense-conv verified).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def bev_sentinel(grid) -> int:
    return grid[1] * grid[2]


@partial(jax.jit, static_argnames=("grid", "ncol_cap"))
def columns_from_voxels(feats, coords, mask, grid, ncol_cap: int):
    """Voxelizer output -> column tensor.

    feats (N, C), coords (N, 3) ZYX, mask (N,) -> (col_feats (Ncol, D, C),
    zmask (Ncol, D), bev_keys (Ncol,) sorted)."""
    d, h, w = grid
    n, c = feats.shape
    key = jnp.where(mask, coords[:, 1] * w + coords[:, 2], bev_sentinel(grid))
    skey = jnp.sort(key)
    first = jnp.concatenate([jnp.ones((1,), bool), skey[1:] != skey[:-1]])
    first &= skey < bev_sentinel(grid)
    rank = jnp.cumsum(first) - 1
    col_keys = jnp.full((ncol_cap,), bev_sentinel(grid), jnp.int32).at[
        jnp.where(first, rank, ncol_cap)
    ].set(jnp.where(first, skey, bev_sentinel(grid)), mode="drop")
    col_mask = col_keys < bev_sentinel(grid)

    # map each voxel to its column slot via binary search over col_keys
    vcol = jnp.searchsorted(col_keys, key, method="sort")
    vcol = jnp.minimum(vcol, ncol_cap - 1)
    hit = (col_keys[vcol] == key) & mask
    vcol = jnp.where(hit, vcol, ncol_cap)

    z = jnp.where(mask, coords[:, 0], 0)
    col_feats = jnp.zeros((ncol_cap, d, c), feats.dtype).at[vcol, z].set(
        jnp.where(hit[:, None], feats, 0.0), mode="drop"
    )
    zmask = jnp.zeros((ncol_cap, d), bool).at[vcol, z].set(hit, mode="drop")
    return col_feats, zmask, col_keys, col_mask


def _bev_offsets(ky, kx):
    return np.stack(
        np.meshgrid(np.arange(ky), np.arange(kx), indexing="ij"), -1
    ).reshape(-1, 2)


def _neighbor_idx(col_keys, col_mask, grid, kernel_yx, stride_yx, pad_yx,
                  out_keys, out_mask, out_grid_hw):
    """(K2, Ncol_out) input-column index per BEV offset + found mask."""
    h, w = grid[1], grid[2]
    if out_keys is None:
        out_keys, out_mask = col_keys, col_mask
        oh, ow = h, w
    else:
        oh, ow = out_grid_hw
    offs = _bev_offsets(*kernel_yx)  # (K2, 2) static
    oy = jnp.where(out_mask, out_keys // ow, 0)
    ox = jnp.where(out_mask, out_keys % ow, 0)
    ny = oy[None, :] * stride_yx[0] - pad_yx[0] + jnp.asarray(offs)[:, 0:1]
    nx = ox[None, :] * stride_yx[1] - pad_yx[1] + jnp.asarray(offs)[:, 1:2]
    ok = (ny >= 0) & (ny < h) & (nx >= 0) & (nx < w) & out_mask[None, :]
    nkey = jnp.where(ok, ny * w + nx, bev_sentinel(grid))
    idx = jnp.searchsorted(col_keys, nkey.reshape(-1), method="sort")
    idx = jnp.minimum(idx, col_keys.shape[0] - 1).reshape(nkey.shape)
    found = (jnp.take(col_keys, idx) == nkey) & ok
    return idx, found


def column_conv(col_feats, zmask, col_keys, col_mask, weight, grid, kernel,
                stride=(1, 1, 1), pad=(0, 0, 0), out_keys=None, out_mask=None,
                out_grid=None, compute_dtype=jnp.float32):
    """Generic column conv. weight (kz*ky*kx*Cin, Cout), K-order (dz,dy,dx).

    Accumulates one GEMM per BEV offset — the per-offset gathered column
    block (Ncol, D, C) plus its kz z-shifted views (Ncol, D_out, kz*C) are
    the only transients, instead of a full (Ncol, D_out, kz*K2*C) im2col
    (which at stage 0 of the full KITTI grid would be GBs and turn the
    layer bandwidth-bound). The z contraction folds into the GEMM K-dim
    (kz*C) so the MXU sees reasonably deep contractions even at C=16.

    Returns (out_feats (Ncol_out, D_out, Cout), out_zmask).
    """
    kz, ky, kx = kernel
    sz, pz = stride[0], pad[0]
    d, c = col_feats.shape[1], col_feats.shape[2]
    subm = out_keys is None
    og = grid if subm else out_grid
    d_out = d if subm else og[0]
    cout = weight.shape[1]

    idx, found = _neighbor_idx(
        col_keys, col_mask, grid, (ky, kx), (stride[1], stride[2]),
        (pad[1], pad[2]), out_keys, out_mask,
        None if subm else (og[1], og[2]),
    )
    ncol = idx.shape[1]
    # weight reorganized per BEV offset: (K2, kz*C, Cout)
    w_all = weight.reshape(kz, ky * kx, c, cout).transpose(1, 0, 2, 3)
    w_all = w_all.reshape(ky * kx, kz * c, cout).astype(compute_dtype)

    flat = col_feats.reshape(col_feats.shape[0], -1).astype(compute_dtype)
    zmask_f = zmask

    def window(g, pz_, kz_, sz_, d_out_):
        if pz_:
            g = jnp.pad(g, ((0, 0), (pz_, pz_), (0, 0)))
        views = [
            g[:, dz : dz + (d_out_ - 1) * sz_ + 1 : sz_, :] for dz in range(kz_)
        ]
        return jnp.concatenate(views, axis=-1)  # (Ncol, d_out, kz*C)

    out = jnp.zeros((ncol * d_out, cout), jnp.float32)
    zacc = jnp.zeros((ncol, d_out), bool) if not subm else None
    for k2 in range(ky * kx):
        g = jnp.take(flat, idx[k2], axis=0).reshape(ncol, d, c)
        g = jnp.where(found[k2][:, None, None], g, 0.0)
        win = window(g, pz, kz, sz, d_out)
        out = out + jnp.dot(
            win.reshape(ncol * d_out, kz * c), w_all[k2],
            preferred_element_type=jnp.float32,
        )
        if not subm:
            gz = jnp.take(zmask_f, idx[k2], axis=0) & found[k2][:, None]
            zwin = window(gz[..., None].astype(jnp.float32), pz, kz, sz, d_out)
            zacc = zacc | (zwin.sum(-1) > 0)

    out = out.reshape(ncol, d_out, cout)
    if subm:
        new_zmask = zmask & col_mask[:, None]
    else:
        new_zmask = zacc & out_mask[:, None]
    out = jnp.where(new_zmask[..., None], out, 0.0)
    return out, new_zmask


@partial(jax.jit, static_argnames=("grid", "kernel_yx", "stride_yx", "pad_yx",
                                   "out_cap", "out_hw"))
def downsample_bev_columns(col_keys, col_mask, grid, kernel_yx, stride_yx,
                           pad_yx, out_cap: int, out_hw):
    """Active output column set of a BEV-strided conv (sort-unique-compact,
    ascending keys, deterministic truncation)."""
    h, w = grid[1], grid[2]
    oh, ow = out_hw
    y = jnp.where(col_mask, col_keys // w, 0)
    x = jnp.where(col_mask, col_keys % w, 0)
    offs = _bev_offsets(*kernel_yx)
    ty = y[None, :] + pad_yx[0] - jnp.asarray(offs)[:, 0:1]
    tx = x[None, :] + pad_yx[1] - jnp.asarray(offs)[:, 1:2]
    div = (ty % stride_yx[0] == 0) & (tx % stride_yx[1] == 0)
    oy = ty // stride_yx[0]
    ox = tx // stride_yx[1]
    ok = div & (oy >= 0) & (oy < oh) & (ox >= 0) & (ox < ow) & col_mask[None, :]
    okey = jnp.where(ok, oy * ow + ox, oh * ow).reshape(-1)
    skey = jnp.sort(okey)
    first = jnp.concatenate([jnp.ones((1,), bool), skey[1:] != skey[:-1]])
    first &= skey < oh * ow
    rank = jnp.cumsum(first) - 1
    out_keys = jnp.full((out_cap,), oh * ow, jnp.int32).at[
        jnp.where(first, rank, out_cap)
    ].set(jnp.where(first, skey, oh * ow), mode="drop")
    return out_keys, out_keys < oh * ow


def columns_to_bev(col_feats, zmask, col_keys, col_mask, grid):
    """Scatter columns into a dense (H, W, C*D) BEV map, (C, D) c-major
    channel flattening like the reference's view(N, C*D, H, W)."""
    d, h, w = grid
    ncol, _, c = col_feats.shape
    flat = jnp.transpose(jnp.where(zmask[..., None], col_feats, 0.0),
                         (0, 2, 1)).reshape(ncol, c * d)
    dense = jnp.zeros((h * w + 1, c * d), col_feats.dtype)
    idx = jnp.where(col_mask, col_keys, h * w)
    dense = dense.at[idx].set(jnp.where(col_mask[:, None], flat, 0.0),
                              mode="drop")
    return dense[:-1].reshape(h, w, c * d)


@partial(jax.jit, static_argnames=("grid", "cap"))
def columns_to_voxels(col_feats, zmask, col_keys, col_mask, grid, cap: int):
    """Column tensor -> key-sorted voxel-sparse (feats, keys, mask) with
    fixed capacity (for PV-RCNN's multiscale set abstraction sources).

    Active sites are compacted in (column, z) order; since col_keys are
    sorted BEV keys and z is the minor axis of the full ZYX key... note:
    output keys are sorted by (y, x, z), NOT the global (z, y, x) order —
    downstream consumers (to_global/SA grouping) only need consistency,
    not a particular order, and tests cover the mapping.
    """
    d, h, w = grid
    ncol = col_feats.shape[0]
    site_mask = (zmask & col_mask[:, None]).reshape(-1)
    order = jnp.argsort(~site_mask)            # actives first, stable
    sel = order[:cap]
    ci = sel // d
    zi = sel % d
    feats = col_feats.reshape(ncol * d, -1)[sel]
    valid = site_mask[sel]
    y = col_keys[ci] // w
    x = col_keys[ci] % w
    keys = jnp.where(valid, (zi * h + y) * w + x, d * h * w)
    feats = jnp.where(valid[:, None], feats, 0.0)
    return feats, keys.astype(jnp.int32), valid
