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

from vision3d_tpu.ops import sparse as sp


def bev_sentinel(grid) -> int:
    return grid[1] * grid[2]


# ---------------------------------------------------------------------------
# Batched fast path (the production CNN route).
#
# Per-sample ops below are kept for tests/conversions, but the model runs
# on these batched variants, built around two measured TPU facts:
#
#   * flat batch-wide gathers (vmapped gathers lower to a ~4x slower
#     batched GatherOp), with dense BEV perfect-hash lookup tables (tiny
#     at BEV resolution: B*H*W <= 18M cells vs 740M for the 3D voxel
#     table at stage 0);
#
#   * TPU tiles the two minor dims of every materialized tensor to
#     (8, 128) — any array whose minor dim is the channel count (16-64)
#     is padded up to 128 lanes, an up-to-8x memory/traffic blowup (a
#     1.9GB logical (B*M, 9, 41, 16) gather materialized 17.7GB). So the
#     batched path NEVER materializes a (..., D, C) or (..., C) column
#     tensor: features live FLAT as (B, N, D*C) rows (minor dim ~0.7-6k,
#     <2% pad), the conv is one GEMM against a block-banded weight, and
#     batch-norm/relu/masking are expressed directly on flat rows
#     (z-tiled parameters, mask expansion via a tiny 0/1 matmul).
# ---------------------------------------------------------------------------


def build_bev_rulebook_batched(col_keys, col_mask, hw, kernel_yx,
                               stride_yx=(1, 1), pad_yx=(0, 0),
                               out_keys=None, out_mask=None, out_hw=None):
    """BEV neighbor-column rulebook with zero-row routing.

    col_keys/col_mask (B, N) describe the INPUT columns on BEV grid ``hw``;
    out_keys/out_mask (B, M) the output columns on ``out_hw`` (default: the
    input set, submanifold case). Returns (B, M*K2) int32 in [0, N]: found
    neighbor columns point at their row, misses and padded outputs at row N
    (callers append a zero row to the column-feature table).
    K2 = ky*kx is minor, (dy, dx) row-major — matching the weight layout
    after its z-major axis is factored out (see column_conv_batched).
    """
    if out_keys is None:
        out_keys, out_mask, out_hw = col_keys, col_mask, hw
    b, n = col_keys.shape
    h, w = hw
    oh, ow = out_hw
    ky, kx = kernel_yx
    oy = jnp.where(out_mask, out_keys // ow, 0)
    ox = jnp.where(out_mask, out_keys % ow, 0)
    offs = np.stack(
        np.meshgrid(np.arange(ky), np.arange(kx), indexing="ij"), -1
    ).reshape(-1, 2)  # (K2, 2) static
    ny = oy[:, :, None] * stride_yx[0] - pad_yx[0] + jnp.asarray(offs)[:, 0]
    nx = ox[:, :, None] * stride_yx[1] - pad_yx[1] + jnp.asarray(offs)[:, 1]
    ok = (
        (ny >= 0) & (ny < h) & (nx >= 0) & (nx < w) & out_mask[:, :, None]
    )
    nkey = jnp.where(ok, ny * w + nx, h * w)
    idx, found = sp.lookup_keys_batched(
        col_keys, col_mask, nkey.reshape(b, -1), (1, h, w)
    )
    return jnp.where(found, idx, n).astype(jnp.int32)


def _z_band_mask(d, d_out, kz, stride_z, pad_z):
    """Static (D, D_out, kz) 0/1 mask: input z feeds output zo at kernel
    offset dz iff z == zo*stride - pad + dz."""
    z = np.arange(d)[:, None, None]
    zo = np.arange(d_out)[None, :, None]
    dz = np.arange(kz)[None, None, :]
    return (z == zo * stride_z - pad_z + dz).astype(np.float32)


def column_conv_dz(col_feats, rb_idx, weight, kernel, d, c, stride_z=1,
                   pad_z=0, compute_dtype=jnp.float32):
    """Rulebook gather + per-output-z GEMMs on FLAT column rows.

    Same contract as column_conv_batched. The band-GEMM there contracts
    the full (K2*D*C) row against a (K2*D*C, D_out*Cout) block-banded
    matrix — D/kz of those FLOPs are structural zeros (7x waste at D=21),
    which round 2 measured as the column path losing to z-window gathers.
    Instead, for each output z the K2 kz*C-wide window slices of the flat
    rows (contiguous LANE slices — no (.., C)-minor reshape, which would
    be lane-padded up to 8x and was measured 26GB/OOM at stage 0) are
    concatenated into a (B*M, K2*kz*C) im2col block and hit against the
    shared (K*Cin, Cout) weight: FLOPs are the exact 27-tap count and
    every operand keeps a wide unpadded minor dim. Lane traffic is
    D_out*kz/D_pad ~ 1.5x the gathered bytes.
    """
    b, n, _ = col_feats.shape
    kz, ky, kx = kernel
    k2 = ky * kx
    m = rb_idx.shape[1] // k2
    cout = weight.shape[1]
    d_out = (d + 2 * pad_z - kz) // stride_z + 1
    dp = d + 2 * pad_z

    table = col_feats.astype(compute_dtype)
    if pad_z:
        zc = jnp.zeros((b, n, pad_z * c), compute_dtype)
        table = jnp.concatenate([zc, table, zc], axis=-1)
    table = jnp.concatenate(
        [table, jnp.zeros((b, 1, dp * c), compute_dtype)], axis=1
    )
    g = sp._take_maybe_per_sample(table, rb_idx)  # (B, M*K2, dp*c)
    g = g.reshape(b * m, k2 * dp * c)

    # weight rows permuted to (k2, dz, c)-major to match the slice order
    wperm = weight.reshape(kz, k2, c, cout).transpose(1, 0, 2, 3)
    wperm = wperm.reshape(k2 * kz * c, cout).astype(compute_dtype)
    outs = []
    for zo in range(d_out):
        z0 = zo * stride_z
        xz = jnp.concatenate(
            [
                jax.lax.slice_in_dim(
                    g, j * dp * c + z0 * c, j * dp * c + (z0 + kz) * c, axis=1
                )
                for j in range(k2)
            ],
            axis=1,
        )  # (B*M, K2*kz*C)
        outs.append(
            jnp.dot(xz, wperm, preferred_element_type=jnp.float32)
        )
    return jnp.concatenate(outs, axis=1).reshape(b, m, d_out * cout)


def column_conv_batched(col_feats, rb_idx, weight, kernel, d, c, stride_z=1,
                        pad_z=0, compute_dtype=jnp.float32):
    """Rulebook gather + ONE block-banded GEMM on FLAT column rows.

    col_feats (B, N, D*C) flat z-major rows; rb_idx (B, M*K2) routes
    misses to the appended zero row N. weight is the shared (K*Cin, Cout)
    layout, K = (dz*ky + dy)*kx + dx row-major (ops/sparse.py convention).
    Returns (B, M, D_out*Cout) flat f32.

    The gathered neighborhood stays flat — one take of (D*C)-contiguous
    rows -> (B*M, K2*D*C), minor dim ~6k so tile padding is <2% — and the
    entire conv (z window x BEV taps x channel mix) is one GEMM against a
    block-banded matrix W[(k2,z,c),(zo,co)] = w[k2, z-zo*s+p, c, co]
    (zero off-band). That wastes D/kz in FLOPs over a dense-z im2col, but
    the MXU runs the big well-shaped GEMM far cheaper than index-bound
    gathers or lane-padded conv forms (see module header).
    """
    b, n, _ = col_feats.shape
    kz, ky, kx = kernel
    k2 = ky * kx
    m = rb_idx.shape[1] // k2
    cout = weight.shape[1]
    d_out = (d + 2 * pad_z - kz) // stride_z + 1

    table = jnp.concatenate(
        [col_feats, jnp.zeros((b, 1, d * c), col_feats.dtype)], axis=1
    ).astype(compute_dtype)
    flat = (rb_idx + jnp.arange(b, dtype=jnp.int32)[:, None] * (n + 1)).reshape(-1)
    g = jnp.take(table.reshape(b * (n + 1), d * c), flat, axis=0)
    g = g.reshape(b * m, k2 * d * c)  # layout-trivial: rows stay contiguous

    band = jnp.asarray(_z_band_mask(d, d_out, kz, stride_z, pad_z))
    w4 = weight.reshape(kz, k2, c, cout).transpose(1, 0, 2, 3)  # (K2,kz,C,Cout)
    wbig = jnp.einsum("zod,kdcf->kzcof", band, w4.astype(jnp.float32))
    wbig = wbig.reshape(k2 * d * c, d_out * cout).astype(compute_dtype)

    out = jnp.dot(g, wbig, preferred_element_type=jnp.float32)
    return out.reshape(b, m, d_out * cout)


def column_occupancy_batched(zmask, rb_idx, kernel, stride_z=1, pad_z=0):
    """Output-site activity of a strided conv: any active input voxel in
    the receptive field (spconv semantics). Same rulebook as the features;
    implemented as the ones-kernel instance of column_conv_batched.
    zmask (B, N, D) bool -> (B, M, D_out) bool."""
    kz, ky, kx = kernel
    d = zmask.shape[-1]
    ones = jnp.ones((kz * ky * kx * 1, 1), jnp.bfloat16)
    occ = column_conv_batched(
        zmask.astype(jnp.bfloat16), rb_idx, ones, kernel, d, 1,
        stride_z, pad_z, compute_dtype=jnp.bfloat16,
    )
    return occ > 0.5


def columns_from_voxels_batched(feats, coords, mask, grid, ncol_cap):
    """Batched voxelizer output -> FLAT column tensor.

    feats (B, N, C), coords (B, N, 3) ZYX, mask (B, N) ->
    (col_feats (B, Ncap, D*C), zmask (B, Ncap, D), col_keys (B, Ncap)
    sorted ascending, col_mask (B, Ncap)).

    Column ids come from a dense BEV occupancy grid + cumsum rank (no
    sorts), so columns are ordered by ascending BEV key with lowest keys
    kept on capacity overflow — the same deterministic truncation as the
    per-sample sort-based builder. Features land via a 1-D elementwise
    scatter (a (rows, C) scatter target with C of 4-16 would be
    lane-padded up to 32x, see module header).
    """
    d, h, w = grid
    b, n, c = feats.shape
    hw = h * w
    bidx = jnp.arange(b, dtype=jnp.int32)[:, None]
    bev = jnp.where(mask, coords[:, :, 1] * w + coords[:, :, 2], hw)
    occ = jnp.zeros((b * (hw + 1),), bool).at[
        (bidx * (hw + 1) + bev).reshape(-1)
    ].set(True, mode="drop").reshape(b, hw + 1)[:, :hw]
    rank = jnp.cumsum(occ.astype(jnp.int32), axis=1) - 1
    vcol = jnp.take_along_axis(rank, jnp.minimum(bev, hw - 1), axis=1)
    vcol = jnp.where(mask & (vcol < ncol_cap), vcol, ncol_cap)

    flat_col = (bidx * (ncol_cap + 1) + vcol).reshape(-1)
    col_keys = jnp.full((b * (ncol_cap + 1),), hw, jnp.int32).at[flat_col].set(
        jnp.where(mask, bev, hw).reshape(-1), mode="drop"
    ).reshape(b, ncol_cap + 1)[:, :ncol_cap]
    col_mask = col_keys < hw

    z = jnp.where(mask, coords[:, :, 0], 0)
    zmask = jnp.zeros((b * (ncol_cap + 1) * d,), bool).at[
        (flat_col * d + z.reshape(-1))
    ].set(mask.reshape(-1), mode="drop").reshape(b, ncol_cap + 1, d)[:, :ncol_cap]

    el = (flat_col * d + z.reshape(-1))[:, None] * c + jnp.arange(c)
    col_feats = jnp.zeros((b * (ncol_cap + 1) * d * c,), feats.dtype).at[
        el.reshape(-1)
    ].set(
        jnp.where(mask[..., None], feats, 0.0).reshape(-1), mode="drop"
    ).reshape(b, ncol_cap + 1, d * c)[:, :ncol_cap]
    n_dropped = jnp.maximum(
        occ.sum(axis=1, dtype=jnp.int32) - ncol_cap, 0
    )
    return col_feats, zmask, col_keys, col_mask, n_dropped


def expand_site_mask(zmask, c, dtype=jnp.float32):
    """(B, N, D) bool site mask -> (B, N, D*C) flat float multiplier.

    Expansion runs as a (B*N, D) x (D, D*C) matmul against a static 0/1
    matrix instead of broadcast+reshape, which would materialize a
    (B, N, D, C) intermediate in lane-padded layout (see module header).
    """
    b, n, d = zmask.shape
    e = np.kron(np.eye(d, dtype=np.float32), np.ones((1, c), np.float32))
    return jnp.dot(
        zmask.reshape(b * n, d).astype(dtype), jnp.asarray(e, dtype)
    ).reshape(b, n, d * c)


def columns_to_bev_batched(col_feats, zmask, col_keys, col_mask, grid, c):
    """Batched scatter of FLAT columns into dense (B, H, W, C*D) BEV maps,
    (C, D) c-major flattening like the reference's view(N, C*D, H, W).

    Only runs once, at the final (tiny: D=2) stage, so the per-row
    (D, C) -> (C, D) transpose's padded layout is immaterial here.
    """
    d, h, w = grid
    b, n, _ = col_feats.shape
    feats = col_feats.reshape(b, n, d, c) * zmask[..., None].astype(
        col_feats.dtype
    )
    flat = jnp.transpose(feats, (0, 1, 3, 2)).reshape(b * n, c * d)
    idx = jnp.where(col_mask, col_keys, h * w) + (
        jnp.arange(b, dtype=jnp.int32) * (h * w + 1)
    )[:, None]
    dense = jnp.zeros((b * (h * w + 1), c * d), col_feats.dtype)
    dense = dense.at[idx.reshape(-1)].set(flat, mode="drop")
    return dense.reshape(b, h * w + 1, c * d)[:, : h * w].reshape(
        b, h, w, c * d
    )


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
    ascending keys, deterministic truncation). Returns (out_keys,
    out_mask, n_dropped) — n_dropped counts real active output columns the
    capacity truncated (capacity-overflow detection, see BASELINE.md)."""
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
    n_dropped = jnp.maximum(first.sum(dtype=jnp.int32) - out_cap, 0)
    return out_keys, out_keys < oh * ow, n_dropped


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
    keys = jnp.where(valid, (y * w + x) * d + zi, d * h * w)
    feats = jnp.where(valid[:, None], feats, 0.0)
    return feats, keys.astype(jnp.int32), valid
