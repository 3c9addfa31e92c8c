"""Sparse 3D convolution primitives for TPU: sorted-key rulebooks + im2col GEMM.

Replaces the reference's out-of-tree spconv CUDA kernels (SURVEY X2;
reference detector/sparse_cnn.py uses SubMConv3d / SparseConv3d with
hash-table rulebooks). TPU-first redesign:

  * A sparse voxel tensor is a fixed-capacity, *key-sorted* structure:
    ``feats (N, C)``, ``keys (N,)`` int32 linear ZYX indices (invalid rows
    hold a sentinel key that sorts last), ``mask (N,)``.
  * Neighbor lookup is binary search (``jnp.searchsorted``) into the sorted
    keys — O(K·N log N) scalar work on the VPU, no hash tables, no dynamic
    shapes.
  * The conv itself is an im2col GEMM: gather the K=prod(kernel) neighbors
    into (N, K*Cin) and hit the MXU with one (N, K*Cin) x (K*Cin, Cout)
    matmul per layer — exactly the large, batched matmul shape XLA tiles
    well, instead of spconv's scatter-accumulate per offset.
  * Strided convs ("downsample") compute their active output set with a
    sort-unique-compact over the <= K·N candidate children, truncated
    deterministically to a static per-stage capacity (lowest keys kept).

All functions are per-sample; batch via ``jax.vmap``. Convention for conv
arithmetic (matches torch/spconv): out[o] receives in[o*stride - pad + d]
for kernel offset d in [0, k).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def sentinel_key(grid) -> int:
    d, h, w = grid
    return d * h * w


def coords_to_keys(coords, grid):
    """(N, 3) int32 ZYX -> (N,) int32 COLUMN-MAJOR linear keys.

    Key layout is (y, x, z) row-major — z is the MINOR digit — so one BEV
    column's D cells are contiguous in key space. Sorting by key groups
    columns together (locality for BEV-structured lookups) and makes the
    dense cell->row table z-minor so a column's D slots form one row.
    """
    d, h, w = grid
    return (coords[:, 1] * w + coords[:, 2]) * d + coords[:, 0]


def keys_to_coords(keys, grid):
    d, h, w = grid
    z = keys % d
    y = keys // (w * d)
    x = (keys // d) % w
    return jnp.stack([z, y, x], axis=-1)


def make_sorted(feats, coords, mask, grid):
    """Build the key-sorted sparse representation from voxelizer output."""
    keys = jnp.where(mask, coords_to_keys(coords, grid), sentinel_key(grid))
    order = jnp.argsort(keys)
    return feats[order], keys[order], mask[order]


def _kernel_offsets(kernel):
    """Static (K, 3) numpy array of kernel offsets, torch iteration order."""
    kz, ky, kx = kernel
    return np.stack(
        np.meshgrid(np.arange(kz), np.arange(ky), np.arange(kx), indexing="ij"),
        axis=-1,
    ).reshape(-1, 3)


@partial(jax.jit, static_argnames=("grid", "kernel", "stride", "pad"))
def gather_neighbors(feats, keys, mask, grid, kernel, stride=(1, 1, 1),
                     pad=(0, 0, 0), out_keys=None, out_mask=None,
                     in_grid=None):
    """im2col gather: for each output site and kernel offset, fetch the
    contributing input voxel's features (zeros if inactive).

    For submanifold convs (out == in sites) pass out_keys=None. For strided
    convs pass the output key set and the INPUT grid via ``in_grid``
    (``grid`` is then the output grid).

    Returns (N_out, K, C).
    """
    if out_keys is None:
        out_keys, out_mask, in_grid = keys, mask, grid
    out_grid = grid
    n_out = out_keys.shape[0]
    coords = keys_to_coords(jnp.where(out_mask, out_keys, 0), out_grid)
    offs = _kernel_offsets(kernel)  # (K, 3) static
    stride_a = jnp.asarray(stride, jnp.int32)
    pad_a = jnp.asarray(pad, jnp.int32)
    dims = jnp.asarray(in_grid, jnp.int32)

    # (K, N_out, 3) neighbor input coords
    nbr = coords[None, :, :] * stride_a - pad_a + jnp.asarray(offs)[:, None, :]
    in_bounds = ((nbr >= 0) & (nbr < dims)).all(-1) & out_mask[None, :]
    d, h, w = in_grid
    nkey = (nbr[..., 1] * w + nbr[..., 2]) * d + nbr[..., 0]
    nkey = jnp.where(in_bounds, nkey, sentinel_key(in_grid))

    # method='sort' is ~45x faster than the default bisection on TPU for
    # these sizes (bisection serializes log2(N) scalar-core gathers; sort
    # runs one fused key sort on the VPU)
    idx = jnp.searchsorted(keys, nkey.reshape(-1), method="sort").reshape(nkey.shape)
    idx = jnp.minimum(idx, keys.shape[0] - 1)
    found = (jnp.take(keys, idx) == nkey) & (nkey < sentinel_key(in_grid))
    gathered = jnp.take(feats, idx, axis=0)          # (K, N_out, C)
    gathered = jnp.where(found[..., None], gathered, 0.0)
    return jnp.moveaxis(gathered, 0, 1)              # (N_out, K, C)


def sparse_conv_apply(feats, keys, mask, weight, grid, kernel,
                      stride=(1, 1, 1), pad=(0, 0, 0), out_keys=None,
                      out_mask=None, in_grid=None,
                      compute_dtype=jnp.float32):
    """Gather + one MXU GEMM. weight: (K*Cin, Cout)."""
    cols = gather_neighbors(
        feats, keys, mask, grid, kernel, stride, pad, out_keys, out_mask,
        in_grid,
    )
    n = cols.shape[0]
    cols = cols.reshape(n, -1).astype(compute_dtype)
    out = jnp.dot(cols, weight.astype(compute_dtype),
                  preferred_element_type=jnp.float32)
    m = mask if out_keys is None else out_mask
    return jnp.where(m[:, None], out, 0.0)


def out_grid_shape(in_grid, kernel, stride, pad):
    """Static output spatial dims: (D + 2p - k)//s + 1 per axis."""
    return tuple(
        (in_grid[i] + 2 * pad[i] - kernel[i]) // stride[i] + 1 for i in range(3)
    )


@partial(jax.jit, static_argnames=("in_grid", "kernel", "stride", "pad", "out_cap"))
def downsample_active_set(keys, mask, in_grid, kernel, stride, pad, out_cap):
    """Compute the active output key set of a strided sparse conv.

    Children of input voxel i are all o with o*s - p + d == i, i.e.
    o = (i + p - d)/s for divisible, in-range values — <= ceil(k/s)^3 per
    input. Candidates are sorted, uniqued, and compacted to ``out_cap``
    (ascending key order => deterministic truncation of the largest keys).

    Returns (out_keys (out_cap,), out_mask, n_dropped) — n_dropped is the
    number of true active output sites the capacity truncated (0 when the
    cap covers the dilated set; surfaced so capacity overflow is DETECTED
    at runtime instead of silently blanking BEV regions).
    """
    og = out_grid_shape(in_grid, kernel, stride, pad)
    coords = keys_to_coords(jnp.where(mask, keys, 0), in_grid)

    # Exact child enumeration: per dim only ceil(k/s) kernel offsets can
    # satisfy the divisibility constraint (d = (c+p) mod s + j*s), so the
    # candidate list is ceil(k/s)^3 per input (8 for the 3^3/2 stages vs
    # 27 naive) — the sort below is the expensive part and shrinks 3.4x.
    cnt = [int(-(-k_ // s_)) for k_, s_ in zip(kernel, stride)]
    joffs = np.stack(
        np.meshgrid(*[np.arange(c_) for c_ in cnt], indexing="ij"), -1
    ).reshape(-1, 3)  # (J, 3) static
    stride_a = jnp.asarray(stride, jnp.int32)
    pad_a = jnp.asarray(pad, jnp.int32)
    kern_a = jnp.asarray(kernel, jnp.int32)

    cp = coords[None, :, :] + pad_a                      # (1, N, 3)
    d0 = cp % stride_a                                   # minimal offset
    dd = d0 + jnp.asarray(joffs)[:, None, :] * stride_a  # (J, N, 3)
    o = (cp - dd) // stride_a
    ok = (
        (dd < kern_a).all(-1)
        & (o >= 0).all(-1)
        & (o < jnp.asarray(og, jnp.int32)).all(-1)
        & mask[None, :]
    )
    okey = (o[..., 1] * og[2] + o[..., 2]) * og[0] + o[..., 0]
    okey = jnp.where(ok, okey, sentinel_key(og)).reshape(-1)

    skey = jnp.sort(okey)
    first = jnp.concatenate([jnp.ones((1,), bool), skey[1:] != skey[:-1]])
    first &= skey < sentinel_key(og)
    rank = jnp.cumsum(first) - 1
    out_keys = jnp.full((out_cap,), sentinel_key(og), jnp.int32).at[
        jnp.where(first, rank, out_cap)
    ].set(jnp.where(first, skey, sentinel_key(og)), mode="drop")
    out_mask = out_keys < sentinel_key(og)
    n_dropped = jnp.maximum(first.sum(dtype=jnp.int32) - out_cap, 0)
    return out_keys, out_mask, n_dropped


def to_dense(feats, keys, mask, grid):
    """Scatter a sparse tensor to a dense (D, H, W, C) volume."""
    d, h, w = grid
    n, c = feats.shape
    dense = jnp.zeros((h * w * d + 1, c), feats.dtype)
    idx = jnp.where(mask, keys, h * w * d)
    dense = dense.at[idx].set(jnp.where(mask[:, None], feats, 0.0), mode="drop")
    return jnp.transpose(dense[:-1].reshape(h, w, d, c), (2, 0, 1, 3))


# Dense-index lookups (perfect-hash tables over the grid) are used up to
# this many batched cells; int16 row indices keep the full-resolution
# KITTI stage-0 table (8 x 92.4M cells) at ~1.5GB transient. Beyond the
# limit (or when row ids overflow int16 at >2^31 cells) we fall back to
# sort-based search — but note large fused programs containing those sorts
# trigger an XLA/TPU compile pathology that made SECOND's stage 0 ~5x
# slower end-to-end than the sum of its ops (measured r2; see
# ARCHITECTURE.md), which is why the dense path is strongly preferred.
DENSE_LOOKUP_MAX_CELLS = 1_200_000_000


def _dense_table_dtype(b, n, grid):
    s = sentinel_key(grid)
    if n < 32_767:
        return jnp.int16 if b * s <= DENSE_LOOKUP_MAX_CELLS else None
    return jnp.int32 if b * s <= DENSE_LOOKUP_MAX_CELLS // 3 else None


def build_dense_table(keys, mask, grid):
    """Dense grid-cell -> row perfect-hash table, (B*(S+1),) int16/int32
    with -1 for empty cells; None if the grid is too large.

    Build this ONCE per active set and pass it to every
    lookup_keys_batched / build_rulebook_batched consumer of that set
    (a stage's submanifold rulebook, its down-conv rulebook, ...): the
    fill+scatter is the expensive part at full resolution (~1.5GB).
    """
    b, n = keys.shape
    s = sentinel_key(grid)
    dt = _dense_table_dtype(b, n, grid)
    if dt is None:
        return None
    table = jnp.full((b * (s + 1),), -1, dt)
    rows = jnp.broadcast_to(jnp.arange(n, dtype=dt), (b, n))
    flat_keys = jnp.where(mask, keys, s) + (
        jnp.arange(b, dtype=jnp.int32) * (s + 1)
    )[:, None]
    return table.at[flat_keys.reshape(-1)].set(
        jnp.where(mask, rows, -1).reshape(-1), mode="drop"
    )


def lookup_keys_batched(keys, mask, queries, grid, table=None):
    """Find each query key's row in the per-sample sorted key arrays.

    keys (B, N) sorted with sentinel padding, mask (B, N),
    queries (B, Q) with sentinel for invalid. Returns (idx (B, Q) int32 in
    [0, N), found (B, Q) bool).

    Uses a dense grid-cell -> row table (a perfect hash, the TPU analog of
    spconv's hash rulebooks) when the grid fits, else sort-based search.
    Pass a prebuilt ``table`` (build_dense_table) to share one build
    across several query sets of the same active set.
    """
    b, n = keys.shape
    q = queries.shape[1]
    s = sentinel_key(grid)
    if table is None:
        table = build_dense_table(keys, mask, grid)
    if table is not None:
        flat_q = jnp.minimum(queries, s) + (
            jnp.arange(b, dtype=jnp.int32) * (s + 1)
        )[:, None]
        vals = jnp.take(table, flat_q.reshape(-1), axis=0).reshape(b, q)
        found = (vals >= 0) & (queries < s)
        return jnp.maximum(vals, 0).astype(jnp.int32), found
    idx = jax.vmap(lambda k_, q_: jnp.searchsorted(k_, q_, method="sort"))(
        keys, queries
    )
    idx = jnp.minimum(idx, n - 1)
    found = (jnp.take_along_axis(keys, idx, axis=1) == queries) & (queries < s)
    return idx.astype(jnp.int32), found


def gather_neighbors_batched(feats, keys, mask, grid, kernel,
                             stride=(1, 1, 1), pad=(0, 0, 0), out_keys=None,
                             out_mask=None, in_grid=None):
    """Batched im2col gather with a single FLAT feature gather.

    vmapping the per-sample gather makes XLA lower a batched GatherOp that
    runs ~4x slower than a flat one at KITTI scale; here only the (cheap)
    key search is vmapped and features are fetched with one
    (B*N_out*K,)-index take from the (B*N, C)-flattened table. The K axis
    is laid out minor so no transpose is needed before the GEMM.

    feats (B, N, C), keys (B, N) sorted. Returns (B, N_out, K, C).
    """
    if out_keys is None:
        out_keys, out_mask, in_grid = keys, mask, grid
    b, n = keys.shape
    n_out = out_keys.shape[1]
    # output coords decode against ``grid`` (the OUTPUT grid for strided
    # calls, matching gather_neighbors' convention)
    d, h, w = grid
    ok = jnp.where(out_mask, out_keys, 0)
    oz = ok % d
    oy = ok // (w * d)
    ox = (ok // d) % w
    coords = jnp.stack([oz, oy, ox], axis=-1)  # (B, N_out, 3)

    offs = jnp.asarray(_kernel_offsets(kernel))          # (K, 3)
    stride_a = jnp.asarray(stride, jnp.int32)
    pad_a = jnp.asarray(pad, jnp.int32)
    dims = jnp.asarray(in_grid, jnp.int32)
    nbr = coords[:, :, None, :] * stride_a - pad_a + offs[None, None]
    in_bounds = ((nbr >= 0) & (nbr < dims)).all(-1) & out_mask[:, :, None]
    di, hi, wi = in_grid
    nkey = (nbr[..., 1] * wi + nbr[..., 2]) * di + nbr[..., 0]
    nkey = jnp.where(in_bounds, nkey, sentinel_key(in_grid))  # (B, N_out, K)

    idx, found = lookup_keys_batched(keys, mask, nkey.reshape(b, -1), in_grid)

    flat_idx = (idx + jnp.arange(b, dtype=idx.dtype)[:, None] * n).reshape(-1)
    g = jnp.take(feats.reshape(b * n, -1), flat_idx, axis=0)
    g = jnp.where(found.reshape(-1)[:, None], g, 0.0)
    k = offs.shape[0]
    return g.reshape(b, n_out, k, feats.shape[-1])


def sparse_conv_apply_batched(feats, keys, mask, weight, grid, kernel,
                              stride=(1, 1, 1), pad=(0, 0, 0), out_keys=None,
                              out_mask=None, in_grid=None,
                              compute_dtype=jnp.float32):
    """Batched gather + one MXU GEMM. weight (K*Cin, Cout).

    Returns (B, N_out, Cout)."""
    cols = gather_neighbors_batched(
        feats, keys, mask, grid, kernel, stride, pad, out_keys, out_mask,
        in_grid,
    )
    b, n_out = cols.shape[:2]
    cols = cols.reshape(b * n_out, -1).astype(compute_dtype)
    out = jnp.dot(cols, weight.astype(compute_dtype),
                  preferred_element_type=jnp.float32).reshape(b, n_out, -1)
    m = mask if out_keys is None else out_mask
    return jnp.where(m[..., None], out, 0.0)


def neighbor_queries(out_keys, out_mask, out_grid, in_grid, kernel,
                     stride=(1, 1, 1), pad=(0, 0, 0)):
    """(B, N_out*K) neighbor key queries (sentinel for out-of-bounds/pad),
    K minor in torch kernel-offset order."""
    b = out_keys.shape[0]
    d, h, w = out_grid
    ok = jnp.where(out_mask, out_keys, 0)
    oz = ok % d
    oy = ok // (w * d)
    ox = (ok // d) % w
    coords = jnp.stack([oz, oy, ox], axis=-1)  # (B, N_out, 3)

    offs = jnp.asarray(_kernel_offsets(kernel))
    stride_a = jnp.asarray(stride, jnp.int32)
    pad_a = jnp.asarray(pad, jnp.int32)
    dims = jnp.asarray(in_grid, jnp.int32)
    nbr = coords[:, :, None, :] * stride_a - pad_a + offs[None, None]
    in_bounds = ((nbr >= 0) & (nbr < dims)).all(-1) & out_mask[:, :, None]
    di, hi, wi = in_grid
    nkey = (nbr[..., 1] * wi + nbr[..., 2]) * di + nbr[..., 0]
    nkey = jnp.where(in_bounds, nkey, sentinel_key(in_grid))
    return nkey.reshape(b, -1)


def build_rulebook_batched(keys, mask, grid, kernel, stride=(1, 1, 1),
                           pad=(0, 0, 0), out_keys=None, out_mask=None,
                           in_grid=None, table=None):
    """Neighbor-index rulebook with zero-row routing (built ONCE per stage).

    Returns idx (B, N_out * K) int32 in [0, N]: found neighbors point at
    their feature row, misses and padded outputs point at row N — callers
    append a zero row to the feature table so no float masking pass is
    needed after the gather (the miss contribution is exactly zero).
    K is minor (torch kernel-offset order), matching weight layout.
    """
    if out_keys is None:
        out_keys, out_mask, in_grid = keys, mask, grid
    b, n = keys.shape
    nkey = neighbor_queries(out_keys, out_mask, grid, in_grid, kernel,
                            stride, pad)
    idx, found = lookup_keys_batched(keys, mask, nkey, in_grid, table=table)
    return jnp.where(found, idx, n).astype(jnp.int32)


def _pc16(x):
    """Population count of an int16 treated as 16 unsigned bits."""
    return jax.lax.population_count(x.astype(jnp.int32) & 0xFFFF)


def build_csr(keys, mask, grid):
    """Compact per-BEV-cell CSR records: (B*(HW+1), 4) int32.

    Record = [bits0, bits1, bits2, colstart]: a 48-bit z-occupancy bitmask
    (bit z of word z//16 set iff voxel (z, y, x) is active) plus the
    number of active voxels in all lower BEV cells (each 16-bit word is
    zero-extended into an int32 channel so row counts are not limited to
    int16). Because keys are column-major sorted, row_of(z, cell) =
    colstart + popcount(bits below z) EXACTLY — an O(1) 16-byte lookup.

    The point of the 8B/cell format (vs the 82B/cell z-column table) is
    the measured v5e table-size cliff: gathers from <= ~50MB tables run
    ~2ns/row (VMEM-resident) vs 15-22ns from larger ones; the full KITTI
    stage-0 CSR is 288MB batched (36MB per sample) vs 1.48GB for the
    z-column table. Requires D <= 48.

    keys must be column-major sorted. The extra cell HW is an always-empty
    sentinel for out-of-bounds queries.
    """
    b, n = keys.shape
    d, h, w = grid
    if d > 48:
        return None
    hw = h * w
    cell = jnp.where(mask, keys // d, hw)
    z = jnp.where(mask, keys % d, 0)
    bidx = jnp.arange(b, dtype=jnp.int32)[:, None]
    addr = (bidx * (hw + 1) + cell) * 4 + z // 16
    size = b * (hw + 1) * 4
    addr = jnp.where(mask, addr, size)  # invalid rows: past-the-end (drop)
    bits = jnp.where(mask, jnp.int32(1) << (z % 16), 0)  # <= 0xFFFF

    # Merge each (cell, word) segment's bits BEFORE scattering: scatter-ADD
    # measured ~750ns/element on v5e (read-modify-write serialization),
    # so instead use that disjoint bits sum like OR, take a cumsum along
    # the sorted voxel axis, difference it at segment boundaries, and
    # scatter-SET once per segment (sorted, unique: ~45ns/element).
    tot = jnp.cumsum(bits, axis=1)
    f = jnp.concatenate(
        [jnp.ones((b, 1), bool), addr[:, 1:] != addr[:, :-1]], axis=1
    )
    last = jnp.concatenate(
        [addr[:, :-1] != addr[:, 1:], jnp.ones((b, 1), bool)], axis=1
    )
    e = tot - bits
    seg = jnp.cumsum(f.astype(jnp.int32), axis=1) - 1
    e_first = jnp.zeros((b * n,), jnp.int32).at[
        (bidx * n + jnp.where(f, seg, n - 1)).reshape(-1)
    ].max(jnp.where(f, e, 0).reshape(-1), mode="drop").reshape(b, n)
    val = tot - jnp.take_along_axis(e_first, seg, axis=1)

    # NOTE: indices_are_sorted is NOT claimed here — routing non-last rows
    # to the past-the-end sentinel interleaves `size` between ascending
    # addresses, and a sorted-scatter lowering on TPU could then corrupt
    # records (the XLA contract makes a false claim implementation-defined).
    rec = jnp.zeros((size,), jnp.int32).at[
        jnp.where(last, addr, size).reshape(-1)
    ].set(val.reshape(-1), mode="drop")

    # colstart only matters at cells that can HIT (bits != 0), and because
    # keys are column-major sorted, an active cell's colstart is just the
    # row index of its first voxel — one more tiny sorted scatter instead
    # of any popcount/cumsum pass over the 144MB table (a (B, HW+1, 4)
    # reshape would be lane-padded 32x and cost ~120ms in full passes).
    cfirst = jnp.concatenate(
        [jnp.ones((b, 1), bool), cell[:, 1:] != cell[:, :-1]], axis=1
    ) & mask
    rows = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (b, n))
    cs_addr = (bidx * (hw + 1) + cell) * 4 + 3
    rec = rec.at[jnp.where(cfirst, cs_addr, size).reshape(-1)].set(
        jnp.where(cfirst, rows, 0).reshape(-1), mode="drop"
    )  # no sortedness claim: sentinel routing breaks monotonicity (see above)
    return rec.reshape(b * (hw + 1), 4)


def csr_rulebook(rec, n, grid, out_keys, out_mask, out_grid, kernel,
                 stride=(1, 1, 1), pad=(0, 0, 0)):
    """Rulebook from CSR records: 9 tiny row gathers + bit arithmetic.

    Returns (B, M*K) int32, K = kz*ky*kx in (dz, dy, dx) row-major order
    (the shared weight layout); misses route to row n.
    """
    b, m = out_keys.shape
    d, h, w = grid
    hw = h * w
    kz, ky, kx = kernel
    od, oh, ow = out_grid
    ok = jnp.where(out_mask, out_keys, 0)
    oz = ok % od
    oy = ok // (ow * od)
    ox = (ok // od) % ow

    offs = np.stack(
        np.meshgrid(np.arange(ky), np.arange(kx), indexing="ij"), -1
    ).reshape(-1, 2)  # (K2, 2) static
    ny = oy[:, :, None] * stride[1] - pad[1] + jnp.asarray(offs)[:, 0]
    nx = ox[:, :, None] * stride[2] - pad[2] + jnp.asarray(offs)[:, 1]
    okbev = (ny >= 0) & (ny < h) & (nx >= 0) & (nx < w) & out_mask[:, :, None]
    cell = jnp.where(okbev, ny * w + nx, hw)  # sentinel cell on miss
    bidx = jnp.arange(b, dtype=jnp.int32)[:, None, None]
    g = jnp.take(rec, (bidx * (hw + 1) + cell).reshape(-1), axis=0)
    g = g.reshape(b, m, ky * kx, 4)
    w0 = g[..., 0]
    w1 = g[..., 1]
    w2 = g[..., 2]
    colstart = g[..., 3]

    def below_mask(t):
        # bits strictly below offset t within one 16-bit word, t clamped
        tc = jnp.clip(t, 0, 16)
        return jnp.where(tc >= 16, 0xFFFF, (jnp.int32(1) << tc) - 1)

    pc = jax.lax.population_count
    parts = []
    for dz in range(kz):
        zq = (oz * stride[0] - pad[0] + dz)[:, :, None]  # (B, M, 1)
        inz = (zq >= 0) & (zq < d)
        rank = (
            pc(w0 & below_mask(zq))
            + pc(w1 & below_mask(zq - 16))
            + pc(w2 & below_mask(zq - 32))
        )
        word = jnp.where(zq < 16, w0, jnp.where(zq < 32, w1, w2))
        bit = (word >> jnp.clip(zq % 16, 0, 15)) & 1
        hit = inz & (bit > 0) & okbev
        parts.append(jnp.where(hit, colstart + rank, n))
    rb = jnp.stack(parts, axis=2)  # (B, M, kz, K2) == (dz, dy, dx) order
    return rb.reshape(b, m * kz * ky * kx).astype(jnp.int32)


# Tables at or under this many bytes gather rows at ~2ns (XLA promotes
# them to VMEM); larger ones pay 11-22ns/row out of HBM while the
# per-sample unrolled gathers run at ~2.8ns/row from their VMEM-promoted
# slices. The budget carries a safety margin below the observed ~64MB
# promotion cliff: a 65.5MB table measured 11.3ns/row flat vs 2.8ns/row
# per-sample (stage-2 densify, 247ms -> 61ms).
VMEM_TABLE_BYTES = 48 * 1024 * 1024

# int16 slot-map limit: compact column slots must fit int16 (measured
# active columns: 14k/25k/23k/12k per stage at KITTI density — far under)
MAX_COL_SLOTS = 32000

# plan_stage_batched uses the dense-record-image rulebooks
# (zwin_rulebook_dense_shift) when the input BEV has at most this many
# cells: the (B, OHW, 36) tap stack + dense image beat the per-column
# caches at stage-1 size (563k cells) but lose — and can exceed HBM — at
# stage 0 (2.25M cells), where the cached/scatter variants stay.
DENSE_SHIFT_MAX_BEV_CELLS = 1_000_000

# Ruled out by measurement: fetching each site's cached neighbor row via
# scatter+cumsum forward fill (scatter each column's row DELTA at its
# first sorted site, cumsum over the site axis) instead of per-site
# wide-row gathers. TPU v5e, tools/probe_cached_rb.py, s1 bench
# geometry: ffill 28.1ms vs gather 11.6ms — the (B, M, 144B) int32
# cumsum costs more than the row gathers it removes.


def build_col_compact(keys, mask, grid, ncol_cap, want_slotmap=True):
    """Compact per-active-BEV-column records, straight from sorted keys.

    The round-2 rulebooks gathered 16-byte records from a DENSE
    (B, HW+1, 4) table (288MB at stage 0) at the ~7ns/row HBM rate; this
    builds the same [w0, w1, w2, colstart] records COMPACTED to active
    columns only (tens of KB — VMEM resident, ~2.3ns/row) plus an int16
    BEV cell -> slot map for neighbor lookup. All inputs stay (B, N)
    cumsum/flag vector math; the only scatters are three sorted-address
    compactions over (B, N) and one slot-map scatter.

    Returns (t4c (B, NC+1, 4) int32 with a zero miss row at NC,
    slotmap ((B, HW+2) int16/int32, -1 = empty cell), colslot (B, N)
    int32, ncol_dropped (B,) int32, col_cell (B, NC+1) compact BEV cell
    per slot). Requires d <= 48 and ncol_cap <= 32000 for int16 slots.
    """
    b, n = keys.shape
    d, h, w = grid
    hw = h * w
    nc = int(ncol_cap)
    assert d <= 48, d
    # int16 slots while they fit (keeps the big-BEV stage-0 map inside
    # the VMEM-promotion budget); int32 otherwise (smaller grids)
    slot_dtype = jnp.int16 if nc <= MAX_COL_SLOTS else jnp.int32
    cell = jnp.where(mask, keys // d, hw)
    z = jnp.where(mask, keys % d, 0)
    bidx = jnp.arange(b, dtype=jnp.int32)[:, None]
    rows = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (b, n))

    f = jnp.concatenate(
        [jnp.ones((b, 1), bool), cell[:, 1:] != cell[:, :-1]], axis=1
    ) & mask
    l = jnp.concatenate(
        [cell[:, :-1] != cell[:, 1:], jnp.ones((b, 1), bool)], axis=1
    ) & mask
    colslot = jnp.cumsum(f.astype(jnp.int32), axis=1) - 1
    ncol = f.sum(axis=1, dtype=jnp.int32)

    slot_ok = colslot < nc
    size = b * (nc + 1)
    addr_f = jnp.where(f & slot_ok, bidx * (nc + 1) + colslot, size)
    addr_l = jnp.where(l & slot_ok, bidx * (nc + 1) + colslot, size)
    col_cell = jnp.full((size,), hw, jnp.int32).at[addr_f.reshape(-1)].set(
        cell.reshape(-1), mode="drop").reshape(b, nc + 1)
    first = jnp.zeros((size,), jnp.int32).at[addr_f.reshape(-1)].set(
        rows.reshape(-1), mode="drop").reshape(b, nc + 1)
    last = jnp.zeros((size,), jnp.int32).at[addr_l.reshape(-1)].set(
        rows.reshape(-1), mode="drop").reshape(b, nc + 1)

    # per-word z-bit sums over each column's [first, last] row segment;
    # within a column z is ascending and distinct, so sum == OR. The six
    # cumsum reads (inclusive at last, exclusive at first) are packed into
    # (B, N, 6) rows and fetched with TWO row gathers — nine separate
    # take_along_axis element gathers ran at the ~6ns/element scalar rate
    # and made this builder cost 41ms at stage 1 (round 3).
    cs, cpre = [], []
    for k in range(3):
        bits = jnp.where(mask & (z // 16 == k), jnp.int32(1) << (z % 16), 0)
        c = jnp.cumsum(bits, axis=1)  # int32 wraparound-safe under substraction
        cs.append(c)
        cpre.append(c - bits)
    packed = jnp.stack(cs + cpre, axis=-1)  # (B, N, 6)
    at_last = _take_maybe_per_sample(packed, last)
    at_first = _take_maybe_per_sample(packed, first)
    words = [at_last[..., k] - at_first[..., 3 + k] for k in range(3)]

    t4c = jnp.stack(words + [first], axis=-1)  # (B, NC+1, 4)
    t4c = t4c.at[:, nc].set(0)  # miss row: empty pattern

    # per-sample (B, HW+2) layout: cell hw is the always-empty query
    # sentinel, hw+1 the scatter sink for masked-off rows. Per-sample
    # slices keep each sample's map under the VMEM-promotion budget —
    # ONE flat (B*(HW+1),) map at stage 0 is 36MB and its element gathers
    # ran at the slow flat-path rate, which made plan_stage the most
    # expensive op in the whole network (122ms at stage 0, round 3).
    slotmap = None
    if want_slotmap:  # dense-shift rulebook consumers don't need the map
        map_addr = jnp.where(f & slot_ok, bidx * (hw + 2) + cell,
                             bidx * (hw + 2) + hw + 1).reshape(-1)
        slotmap = jnp.full((b * (hw + 2),), -1, slot_dtype).at[map_addr].set(
            jnp.minimum(colslot, nc).astype(slot_dtype).reshape(-1),
            mode="drop"
        ).reshape(b, hw + 2)
    ncol_dropped = jnp.maximum(ncol - nc, 0)
    return t4c, slotmap, colslot, ncol_dropped, col_cell


def zwin_rulebook_down_scatter(t4c, col_cell, n_in, in_grid, out_keys,
                               out_mask, out_grid, kernel, stride, pad,
                               col_cap=None):
    """Strided-conv z-window rulebook with a SCATTER-built column cache.

    zwin_rulebook_cached still pays one slot lookup + one record gather
    per CACHE SLOT (NCol_out * K2). For a strided conv the (in column ->
    out column, BEV offset) adjacency is enumerable from the IN side with
    exact divisibility — only cnt_y*cnt_x (<= 4 for k3s2) candidates per
    input column — so the neighbor-slot cache is built by scattering each
    in-column's slot at (out_slot, offset): candidate-count lookups into
    a small OUT-resolution slot map instead of cache-size lookups into
    the IN-resolution map. Record gathers and the per-site math are
    shared with the cached variant.

    Returns (start, pattern, ncol_dropped).
    """
    b, m = out_keys.shape
    d, h, w = in_grid
    hw = h * w
    kz, ky, kx = kernel
    k2 = ky * kx
    assert kz <= 3
    od, oh, ow = out_grid
    ohw = oh * ow
    nc = col_cap or m
    ncin = t4c.shape[1] - 1
    bidx = jnp.arange(b, dtype=jnp.int32)[:, None]

    # out column structure (vector math over sorted out site keys)
    ok = jnp.where(out_mask, out_keys, 0)
    cell_out = jnp.where(out_mask, ok // od, ohw)
    f = jnp.concatenate(
        [jnp.ones((b, 1), bool), cell_out[:, 1:] != cell_out[:, :-1]], axis=1
    ) & out_mask
    colslot = jnp.cumsum(f.astype(jnp.int32), axis=1) - 1
    ncol_dropped = jnp.maximum(f.sum(axis=1, dtype=jnp.int32) - nc, 0)

    # OUT-resolution slot map (small: OHW <= HW/4)
    omap_addr = jnp.where(f & (colslot < nc),
                          bidx * (ohw + 2) + cell_out,
                          bidx * (ohw + 2) + ohw + 1).reshape(-1)
    oslotmap = jnp.full((b * (ohw + 2),), -1, jnp.int32).at[omap_addr].set(
        jnp.minimum(colslot, nc).reshape(-1), mode="drop"
    ).reshape(b, ohw + 2)

    # candidates: per in column, the out columns it feeds (exact
    # divisibility; cnt = ceil(k/s) per dim) and at which (dy, dx)
    iy = col_cell // w
    ix = col_cell % w  # sentinel rows are killed by the col_cell < hw guard
    cnt_y = -(-ky // stride[1])
    cnt_x = -(-kx // stride[2])
    joffs = np.stack(
        np.meshgrid(np.arange(cnt_y), np.arange(cnt_x), indexing="ij"), -1
    ).reshape(-1, 2)  # (J, 2) static
    jy = jnp.asarray(joffs[:, 0])
    jx = jnp.asarray(joffs[:, 1])
    dy0 = (iy[:, :, None] + pad[1]) % stride[1]
    dx0 = (ix[:, :, None] + pad[2]) % stride[2]
    dy = dy0 + jy * stride[1]
    dx = dx0 + jx * stride[2]
    oy = (iy[:, :, None] + pad[1] - dy) // stride[1]
    ox = (ix[:, :, None] + pad[2] - dx) // stride[2]
    okc = (
        (dy < ky) & (dx < kx) & (oy >= 0) & (oy < oh) & (ox >= 0) & (ox < ow)
        & (col_cell < hw)[:, :, None]
    )
    ocell = jnp.where(okc, oy * ow + ox, ohw)
    qc = col_cell.shape[1] * len(joffs)
    ocell = ocell.reshape(b, qc)
    offidx = (dy * kx + dx).reshape(b, qc)
    okc = okc.reshape(b, qc)

    # out slot per candidate (small-map lookups), then ONE slot scatter
    oslot = jnp.stack(
        [jnp.take(oslotmap[i], jnp.where(okc, ocell, ohw)[i] )
         for i in range(b)], axis=0
    )
    valid = okc & (oslot >= 0) & (oslot < nc)
    inslot = jnp.broadcast_to(
        jnp.arange(col_cell.shape[1], dtype=jnp.int32)[None, :, None],
        (b, col_cell.shape[1], len(joffs)),
    ).reshape(b, qc)
    addr = jnp.where(valid,
                     (bidx * (nc + 1) + oslot) * k2 + offidx,
                     b * (nc + 1) * k2).reshape(-1)
    nbrslot = jnp.full((b * (nc + 1) * k2 + 1,), ncin, jnp.int32).at[
        addr
    ].set(inslot.reshape(-1), mode="drop")[:-1].reshape(b, (nc + 1) * k2)

    # records per cache slot, then one cached row per site (as in cached)
    recs = _take_maybe_per_sample(t4c, nbrslot)  # (B, (NC+1)*K2, 4)
    cache = recs.reshape(b, nc + 1, k2 * 4)
    crow_idx = jnp.where(out_mask & (colslot < nc), colslot, nc)
    zero_tail = jnp.zeros((b, 1, k2 * 4), cache.dtype)
    cache = jnp.concatenate([cache[:, :nc], zero_tail], axis=1)
    crow = _take_maybe_per_sample(cache, crow_idx)

    comp = crow.reshape(b, m, k2, 4)
    w0 = comp[..., 0].reshape(b, m * k2)
    w1 = comp[..., 1].reshape(b, m * k2)
    w2 = comp[..., 2].reshape(b, m * k2)
    colstart = comp[..., 3].reshape(b, m * k2)
    oz = jnp.where(out_mask, ok % od, 0)
    z0 = jnp.broadcast_to(
        (oz * stride[0] - pad[0])[:, :, None], (b, m, k2)
    ).reshape(b, m * k2)
    start, pattern = _zwin_from_records(w0, w1, w2, colstart, z0, d, kz,
                                        n_in)
    return start, pattern, ncol_dropped


def dense_shift_stack(img, in_grid, out_grid, kernel, stride, pad):
    """(B, OHW, 9*K2) byte-plane neighbor stack of a record image: ONE
    identity-filter patches conv (see zwin_rulebook_dense_shift). The
    stack of a DOWN conv serves double duty: the down rulebook's site
    rows AND the output active set (downsample_from_stack)."""
    b = img.shape[0]
    _, h, w = in_grid
    _, oh, ow = out_grid
    ky, kx = kernel[1], kernel[2]
    py_hi = max((oh - 1) * stride[1] + ky - 1 - pad[1] - (h - 1), 0)
    px_hi = max((ow - 1) * stride[2] + kx - 1 - pad[2] - (w - 1), 0)
    pat = jax.lax.conv_general_dilated_patches(
        img, filter_shape=(ky, kx),
        window_strides=(stride[1], stride[2]),
        padding=((pad[1], py_hi), (pad[2], px_hi)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    stack = pat.reshape(b, oh * ow, 9 * ky * kx)
    # must materialize: fused into per-site gathers it would regress to
    # K2 record gathers per site (the round-2 dense-table design)
    return jax.lax.optimization_barrier(stack)


def _nth_set_bit(w0, w1, w2, j):
    """Position of the j-th set bit (j 0-based) of the 48-bit column
    occupancy (three 16-bit words). Pure vector math: word select by
    popcount prefix + 4-step binary search inside the 16-bit word."""
    pc = jax.lax.population_count
    c0 = pc(w0)
    c01 = c0 + pc(w1)
    in0 = j < c0
    in1 = (~in0) & (j < c01)
    word = jnp.where(in0, w0, jnp.where(in1, w1, w2))
    base = jnp.where(in0, 0, jnp.where(in1, 16, 32))
    rem = j - jnp.where(in0, 0, jnp.where(in1, c0, c01))
    pos = jnp.zeros_like(j)
    for width in (8, 4, 2, 1):
        lowmask = (jnp.int32(1) << width) - 1
        cl = pc((word >> pos) & lowmask)
        go_hi = rem >= cl
        rem = rem - jnp.where(go_hi, cl, 0)
        pos = pos + jnp.where(go_hi, width, 0)
    return base + pos


def downsample_from_stack(stack, in_d, out_grid, kernel, stride, pad,
                          out_cap):
    """Active OUTPUT set of a strided sparse conv, computed from the
    down conv's dense-shift stack instead of sorting candidate keys.

    downsample_active_set sorts J*N candidate keys per sample (~25ms at
    stage 1, batch 8 — the sort is the cost). But the stack already
    holds, per output BEV cell, its K2 neighbor columns' z-occupancy
    words, so the output set is pure vector bit math: OR the words
    across taps, fold the z window (spconv dilation semantics: any
    active input in the receptive field), popcount+cumsum for per-cell
    row spans, one ascending head scatter + cummax fill to expand spans
    to sites, and a 4-step binary bit search for each site's z.

    Returns (out_keys (B, out_cap), out_mask, n_dropped) — bit-identical
    to vmapped downsample_active_set (ascending keys, largest-key
    truncation), tested in tests/test_pallas_kernels.py.
    """
    import functools

    b, ohw, lanes = stack.shape
    kz = kernel[0]
    k2 = kernel[1] * kernel[2]
    od = out_grid[0]
    assert lanes == 9 * k2, (lanes, k2)
    s = stack.astype(jnp.int32)

    def orplane(c):  # OR over the K2 taps of byte plane c -> (B, OHW)
        return functools.reduce(
            jnp.bitwise_or, [s[:, :, c * k2 + t] for t in range(k2)]
        )

    u0 = orplane(0) | (orplane(1) << 8)
    u1 = orplane(2) | (orplane(3) << 8)
    u2 = orplane(4) | (orplane(5) << 8)

    def inbit(z):
        if z < 0 or z >= in_d:
            return None
        w = (u0, u1, u2)[z // 16]
        return (w >> (z % 16)) & 1

    zero = jnp.zeros_like(u0)
    ow0, ow1, ow2 = zero, zero, zero
    for oz in range(od):
        bit = None
        for dz in range(kz):
            bz = inbit(oz * stride[0] - pad[0] + dz)
            if bz is not None:
                bit = bz if bit is None else (bit | bz)
        if bit is None:
            continue
        if oz < 16:
            ow0 = ow0 | (bit << oz)
        elif oz < 32:
            ow1 = ow1 | (bit << (oz - 16))
        else:
            ow2 = ow2 | (bit << (oz - 32))

    pc = jax.lax.population_count
    cnt = pc(ow0) + pc(ow1) + pc(ow2)
    cstart = jnp.cumsum(cnt, axis=1) - cnt  # exclusive per-cell row start
    total = cstart[:, -1] + cnt[:, -1]
    n_dropped = jnp.maximum(total - out_cap, 0)

    bidx = jnp.arange(b, dtype=jnp.int32)[:, None]
    cells = jnp.broadcast_to(
        jnp.arange(ohw, dtype=jnp.int32)[None, :], (b, ohw)
    )
    addr = jnp.where((cnt > 0) & (cstart < out_cap),
                     bidx * out_cap + cstart, b * out_cap)
    heads = jnp.full((b * out_cap + 1,), -1, jnp.int32).at[
        addr.reshape(-1)
    ].set(cells.reshape(-1), mode="drop")[:-1].reshape(b, out_cap)
    cell_of = jax.lax.cummax(heads, axis=1)  # span fill (first head row 0)
    rows = jnp.arange(out_cap, dtype=jnp.int32)[None, :]
    out_mask = rows < jnp.minimum(total, out_cap)[:, None]
    cell_of = jnp.where(out_mask, cell_of, 0)

    table = jnp.stack([ow0, ow1, ow2, cstart], axis=-1)  # (B, OHW, 4)
    g = _take_maybe_per_sample(table, cell_of)           # (B, cap, 4)
    z = _nth_set_bit(g[..., 0], g[..., 1], g[..., 2], rows - g[..., 3])
    okey = cell_of * od + z
    sen = sentinel_key(out_grid)
    return jnp.where(out_mask, okey, sen), out_mask, n_dropped


def zwin_rulebook_dense_shift(t4c, col_cell, n_in, in_grid, out_keys,
                              out_mask, out_grid, kernel, stride=(1, 1, 1),
                              pad=(0, 0, 0), img=None, stack=None):
    """Z-window rulebook via a DENSE record image + shifted slices.

    zwin_rulebook_cached / _down_scatter pay 1-2 indexed ops per cache
    slot x K2 (slot-map lookups + 16B record gathers, each at the ~7ns
    HBM-latency rate — the plan layer's whole cost). But "the K2 neighbor
    records of an output column" is a fixed BEV translation, so: scatter
    the compact records ONCE into a dense (B, H, W, 4) record image
    (NCol sorted row scatters), build the (B, OHW, K2*4) neighbor stack
    as K2 shifted — strided, for down convs — SLICES of that image
    (pure streaming, zero indexed ops), and fetch ONE 144B stacked row
    per output site. Indexed ops drop from (2*K2+1)*NCol + M row/element
    gathers to NCol row scatters + M row gathers; the slot map is not
    needed at all. (Measured numbers: tools/profile_plan_parts.py.)

    ``img`` lets the subm and down rulebooks of one stage share the
    scattered record image (build it with dense_record_image). Returns
    (start, pattern) in the csr_zwin_rulebook contract.
    """
    b, m = out_keys.shape
    d, h, w = in_grid
    hw = h * w
    kz, ky, kx = kernel
    k2 = ky * kx
    od, oh, ow = out_grid
    ohw = oh * ow
    assert kz <= 3
    # records round-trip as 3 BYTE planes in the image/patches pipeline:
    # colstart (a row index < n_in) must fit 24 bits
    assert n_in < (1 << 24), n_in

    if stack is None:
        if img is None:
            img = dense_record_image(t4c, col_cell, in_grid)
        # (B, OH*OW, 9*K2) neighbor stack as ONE identity-filter conv
        # (lax patches): K2 separate shifted slices each materialize a
        # narrow-minor tensor the TPU lane-pads heavily — the patches
        # lowering emits the stack in one pass (channel-major: byte plane
        # c's K2 taps are lanes [c*K2, (c+1)*K2)). Records ride as BYTE
        # planes (pack_records_bytes), exact in bf16 at default conv
        # precision. Zero-padded edges = the miss record.
        stack = dense_shift_stack(img, in_grid, out_grid, kernel, stride,
                                  pad)

    ok = jnp.where(out_mask, out_keys, 0)
    cell_out = jnp.where(out_mask, ok // od, 0)
    crow = _take_maybe_per_sample(stack, cell_out)  # (B, M, 9*K2)
    crow = jnp.where(out_mask[:, :, None], crow, 0).astype(jnp.int32)

    def plane(c):  # byte plane c: lanes [c*K2, (c+1)*K2) of the stack
        return crow[:, :, c * k2:(c + 1) * k2].reshape(b, m * k2)

    w0 = plane(0) + (plane(1) << 8)
    w1 = plane(2) + (plane(3) << 8)
    w2 = plane(4) + (plane(5) << 8)
    colstart = plane(6) + (plane(7) << 8) + (plane(8) << 16)
    oz = jnp.where(out_mask, ok % od, 0)
    z0 = jnp.broadcast_to(
        (oz * stride[0] - pad[0])[:, :, None], (b, m, k2)
    ).reshape(b, m * k2)
    return _zwin_from_records(w0, w1, w2, colstart, z0, d, kz, n_in)


def pack_records_bytes(t4c):
    """(.., 4) int32 records -> (.., 9) BYTE planes, each value in
    [0, 256): [w0lo, w0hi, w1lo, w1hi, w2lo, w2hi, cs0, cs1, cs2].
    Bytes are exact in bf16 (8 mantissa bits), so the record image and
    its K2-tap patches stack can live at HALF the f32 lane traffic and
    run the patches conv at default (bf16) precision."""
    w0, w1, w2, cs = (t4c[..., k] for k in range(4))
    planes = [w0 & 255, w0 >> 8, w1 & 255, w1 >> 8, w2 & 255, w2 >> 8,
              cs & 255, (cs >> 8) & 255, (cs >> 16) & 255]
    return jnp.stack(planes, axis=-1)


def unpack_records_bytes(p):
    """Inverse of pack_records_bytes: (.., 9) int32 byte planes ->
    (w0, w1, w2, colstart) int32 components."""
    w0 = p[..., 0] + (p[..., 1] << 8)
    w1 = p[..., 2] + (p[..., 3] << 8)
    w2 = p[..., 4] + (p[..., 5] << 8)
    cs = p[..., 6] + (p[..., 7] << 8) + (p[..., 8] << 16)
    return w0, w1, w2, cs


def dense_record_image(t4c, col_cell, in_grid):
    """Scatter compact column records (build_col_compact) into a dense
    (B, H, W, 9) bf16 BYTE-plane record image (pack_records_bytes; exact:
    every plane < 256 and bf16 carries 8 mantissa bits). Byte planes let
    the K2-tap patches conv run at default (bf16) precision — the f32
    form needed Precision.HIGHEST to keep 16-bit words exact (~21ms vs
    ~8ms for both stage-1 stacks, batch 8).

    Build strategy is measurement-driven (tools/probe_img_variants.py,
    v5e stage-1 geometry, batch 8): the f32 4-lane .at[].set scatter is
    the cheapest image write (19.1ms); scattering bf16 byte planes
    directly costs 55.4ms (16-bit scatter lowering), and sorted/unique
    sink-row addressing costs 22.6ms (the larger buffer beats the
    hints). So: f32 scatter first, then ONE streaming elementwise pass
    expands the 4 exact f32 components into the 9 bf16 byte planes.
    """
    b = t4c.shape[0]
    nc = t4c.shape[1] - 1
    _, h, w = in_grid
    hw = h * w
    bidx = jnp.arange(b, dtype=jnp.int32)[:, None]
    addr = jnp.where(col_cell[:, :nc] < hw, bidx * hw + col_cell[:, :nc],
                     b * hw).reshape(-1)
    img4 = jnp.zeros((b * hw + 1, 4), jnp.float32).at[addr].set(
        t4c[:, :nc].reshape(-1, 4).astype(jnp.float32), mode="drop")[:-1]
    img9 = pack_records_bytes(img4.astype(jnp.int32)).astype(jnp.bfloat16)
    return img9.reshape(b, h, w, 9)


def _compact_nbr_records(t4c, slotmap, in_grid, out_keys, out_mask,
                         out_grid, kernel, stride, pad):
    """Shared neighbor fetch: per (out site, BEV offset) the column record
    of the queried input cell. Returns (w0, w1, w2, colstart, okbev, oz)
    with the first five flat (B, M*K2) and oz (B, M)."""
    b, m = out_keys.shape
    d, h, w = in_grid
    hw = h * w
    kz, ky, kx = kernel
    k2 = ky * kx
    q = m * k2
    od, oh, ow = out_grid
    ok = jnp.where(out_mask, out_keys, 0)
    oz = ok % od
    oy = ok // (ow * od)
    ox = (ok // od) % ow
    offs = np.stack(
        np.meshgrid(np.arange(ky), np.arange(kx), indexing="ij"), -1
    ).reshape(-1, 2)  # (K2, 2) static
    ny = (oy[:, :, None] * stride[1] - pad[1] + jnp.asarray(offs)[:, 0]
          ).reshape(b, q)
    nx = (ox[:, :, None] * stride[2] - pad[2] + jnp.asarray(offs)[:, 1]
          ).reshape(b, q)
    okbev = (
        (ny >= 0) & (ny < h) & (nx >= 0) & (nx < w)
        & jnp.broadcast_to(out_mask[:, :, None], (b, m, k2)).reshape(b, q)
    )
    cell = jnp.where(okbev, ny * w + nx, hw)
    # per-sample element gathers: each (HW+2,) slice fits the VMEM
    # promotion budget (one flat 36MB map gathered at the slow flat rate)
    slot = jnp.stack(
        [jnp.take(slotmap[i], cell[i]) for i in range(b)], axis=0
    ).astype(jnp.int32)
    nc = t4c.shape[1] - 1
    idx = jnp.where((slot >= 0) & (slot < nc) & okbev, slot, nc)
    g = _take_maybe_per_sample(t4c, idx)  # (B, Q, 4) from a VMEM table
    return g[..., 0], g[..., 1], g[..., 2], g[..., 3], okbev, oz


def zwin_rulebook_compact(t4c, slotmap, n_in, in_grid, out_keys, out_mask,
                          out_grid, kernel, stride=(1, 1, 1), pad=(0, 0, 0)):
    """csr_zwin_rulebook contract — (start, pattern) flat (B, M*K2) —
    computed from compact column records (build_col_compact) instead of
    the dense CSR table: one int16 slot-map element gather + one 16-byte
    record row gather per (site, offset), both from VMEM-resident tables.
    """
    b, m = out_keys.shape
    d = in_grid[0]
    kz = kernel[0]
    k2 = kernel[1] * kernel[2]
    assert kz <= 3
    w0, w1, w2, colstart, okbev, oz = _compact_nbr_records(
        t4c, slotmap, in_grid, out_keys, out_mask, out_grid, kernel,
        stride, pad,
    )

    def below_mask(t):
        tc = jnp.clip(t, 0, 16)
        return jnp.where(tc >= 16, 0xFFFF, (jnp.int32(1) << tc) - 1)

    def bit_at(zq):
        word = jnp.where(zq < 16, w0, jnp.where(zq < 32, w1, w2))
        inz = (zq >= 0) & (zq < d)
        return jnp.where(inz, (word >> jnp.clip(zq % 16, 0, 15)) & 1, 0)

    z0 = jnp.broadcast_to(
        (oz * stride[0] - pad[0])[:, :, None], (b, m, k2)
    ).reshape(b, m * k2)
    pc = jax.lax.population_count
    z0c = jnp.maximum(z0, 0)
    rank = (
        pc(w0 & below_mask(z0c))
        + pc(w1 & below_mask(z0c - 16))
        + pc(w2 & below_mask(z0c - 32))
    )
    pattern = sum(bit_at(z0 + dz) << dz for dz in range(kz))
    start = jnp.where((pattern > 0) & okbev, colstart + rank, n_in)
    pattern = jnp.where(okbev, pattern, 0)
    return start.astype(jnp.int32), pattern.astype(jnp.int32)


def zwin_rulebook_cached(t4c, slotmap, n_in, in_grid, out_keys, out_mask,
                         out_grid, kernel, stride=(1, 1, 1), pad=(0, 0, 0),
                         col_cap=None):
    """zwin_rulebook_compact contract, but with the per-(site, offset)
    record lookups hoisted to a per-COLUMN neighbor-record cache.

    Indexed-op economics on v5e (the plan cost is almost entirely indexed
    ops at the ~2-13ns/op gather rates): the compact rulebook does 2
    lookups per (site, BEV offset) — 9*M slot gathers + 9*M record-row
    gathers. But all sites of one output BEV column share the same 9
    neighbor columns, and KITTI columns average ~2 sites at the dilated
    stages — so this builds the 9 neighbor records once per COLUMN
    (9*NCol slot+record gathers into a (B, NCol, 36) cache) and fetches
    ONE cached row per site. Total indexed ops drop ~3-4x; the remaining
    per-site z-window math is identical (shared _zwin_from_records).

    Returns (start, pattern, ncol_dropped) — ncol_dropped counts active
    output columns beyond ``col_cap`` (their sites produce empty windows,
    i.e. silent truncation — callers must surface it as a diagnostic).
    col_cap=None sizes the cache at M (exact, zero drop).
    """
    b, m = out_keys.shape
    d, h, w = in_grid
    hw = h * w
    kz, ky, kx = kernel
    k2 = ky * kx
    assert kz <= 3  # any ky*kx: offsets are enumerated from the kernel
    od, oh, ow = out_grid
    nc = col_cap or m

    # output column structure from the sorted site keys (vector math only)
    ok = jnp.where(out_mask, out_keys, 0)
    cell_out = jnp.where(out_mask, ok // od, oh * ow)
    f = jnp.concatenate(
        [jnp.ones((b, 1), bool), cell_out[:, 1:] != cell_out[:, :-1]], axis=1
    ) & out_mask
    colslot = jnp.cumsum(f.astype(jnp.int32), axis=1) - 1  # (B, M) per site
    ncol_dropped = jnp.maximum(f.sum(axis=1, dtype=jnp.int32) - nc, 0)

    # compact per-column BEV coords: scatter first-site cells to slots
    bidx = jnp.arange(b, dtype=jnp.int32)[:, None]
    size = b * (nc + 1)
    addr_f = jnp.where(f & (colslot < nc), bidx * (nc + 1) + colslot, size)
    col_cell = jnp.full((size,), oh * ow, jnp.int32).at[
        addr_f.reshape(-1)
    ].set(cell_out.reshape(-1), mode="drop").reshape(b, nc + 1)
    coly = col_cell // ow
    colx = col_cell % ow

    # per-(column, offset) neighbor cell -> slot -> record, cached
    offs = np.stack(
        np.meshgrid(np.arange(ky), np.arange(kx), indexing="ij"), -1
    ).reshape(-1, 2)
    ny = (coly[:, :, None] * stride[1] - pad[1] + jnp.asarray(offs)[:, 0])
    nx = (colx[:, :, None] * stride[2] - pad[2] + jnp.asarray(offs)[:, 1])
    okq = (ny >= 0) & (ny < h) & (nx >= 0) & (nx < w) & (col_cell < oh * ow)[:, :, None]
    cellq = jnp.where(okq, ny * w + nx, hw).reshape(b, (nc + 1) * k2)
    slot = jnp.stack(
        [jnp.take(slotmap[i], cellq[i]) for i in range(b)], axis=0
    ).astype(jnp.int32)
    ncin = t4c.shape[1] - 1
    ridx = jnp.where((slot >= 0) & (slot < ncin), slot, ncin)
    recs = _take_maybe_per_sample(t4c, ridx)  # (B, (NC+1)*K2, 4)
    cache = recs.reshape(b, nc + 1, k2 * 4)   # offset-major, comp-minor

    # one cached-row fetch per site (overflow/padded sites -> zero row nc)
    crow_idx = jnp.where(out_mask & (colslot < nc), colslot, nc)
    zero_tail = jnp.zeros((b, 1, k2 * 4), cache.dtype)
    cache = jnp.concatenate([cache[:, :nc], zero_tail], axis=1)
    crow = _take_maybe_per_sample(cache, crow_idx)  # (B, M, K2*4)

    # flat (B, M*K2) component planes for the shared z-window math
    comp = crow.reshape(b, m, k2, 4)
    w0 = comp[..., 0].reshape(b, m * k2)
    w1 = comp[..., 1].reshape(b, m * k2)
    w2 = comp[..., 2].reshape(b, m * k2)
    colstart = comp[..., 3].reshape(b, m * k2)
    oz = jnp.where(out_mask, ok % od, 0)
    z0 = jnp.broadcast_to(
        (oz * stride[0] - pad[0])[:, :, None], (b, m, k2)
    ).reshape(b, m * k2)
    start, pattern = _zwin_from_records(w0, w1, w2, colstart, z0, d, kz,
                                        n_in)
    return start, pattern, ncol_dropped


def _zwin_from_records(w0, w1, w2, colstart, z0, d, kz, n_in):
    """Shared z-window math: records + window base z -> (start, pattern).
    Empty/missing records (all-zero words) produce pattern 0, start n_in."""

    def below_mask(t):
        tc = jnp.clip(t, 0, 16)
        return jnp.where(tc >= 16, 0xFFFF, (jnp.int32(1) << tc) - 1)

    def bit_at(zq):
        word = jnp.where(zq < 16, w0, jnp.where(zq < 32, w1, w2))
        inz = (zq >= 0) & (zq < d)
        return jnp.where(inz, (word >> jnp.clip(zq % 16, 0, 15)) & 1, 0)

    pc = jax.lax.population_count
    z0c = jnp.maximum(z0, 0)
    rank = (
        pc(w0 & below_mask(z0c))
        + pc(w1 & below_mask(z0c - 16))
        + pc(w2 & below_mask(z0c - 32))
    )
    pattern = sum(bit_at(z0 + dz) << dz for dz in range(kz))
    start = jnp.where(pattern > 0, colstart + rank, n_in)
    return start.astype(jnp.int32), pattern.astype(jnp.int32)


def rulebook_compact(t4c, slotmap, n_in, in_grid, out_keys, out_mask,
                     out_grid, kernel, stride=(1, 1, 1), pad=(0, 0, 0)):
    """Full per-tap rulebook (csr_rulebook contract: (B, M*K) int32,
    K = kz*ky*kx in (dz, dy, dx) row-major, misses -> row n_in) from
    compact column records."""
    b, m = out_keys.shape
    d = in_grid[0]
    kz = kernel[0]
    k2 = kernel[1] * kernel[2]
    w0, w1, w2, colstart, okbev, oz = _compact_nbr_records(
        t4c, slotmap, in_grid, out_keys, out_mask, out_grid, kernel,
        stride, pad,
    )

    def below_mask(t):
        tc = jnp.clip(t, 0, 16)
        return jnp.where(tc >= 16, 0xFFFF, (jnp.int32(1) << tc) - 1)

    pc = jax.lax.population_count
    parts = []
    for dz in range(kz):
        zq = jnp.broadcast_to(
            (oz * stride[0] - pad[0] + dz)[:, :, None], (b, m, k2)
        ).reshape(b, m * k2)
        inz = (zq >= 0) & (zq < d)
        zqc = jnp.maximum(zq, 0)
        rank = (
            pc(w0 & below_mask(zqc))
            + pc(w1 & below_mask(zqc - 16))
            + pc(w2 & below_mask(zqc - 32))
        )
        word = jnp.where(zq < 16, w0, jnp.where(zq < 32, w1, w2))
        bit = (word >> jnp.clip(zq % 16, 0, 15)) & 1
        hit = inz & (bit > 0) & okbev
        parts.append(jnp.where(hit, colstart + rank, n_in))
    # (B, Q=M*K2) per dz, K2-minor -> interleave to (dz, dy, dx) row-major
    rb = jnp.stack(parts, axis=2)  # (B, Q, kz)? no: parts are (B, M*K2)
    rb = rb.reshape(b, m, k2, kz)
    rb = jnp.transpose(rb, (0, 1, 3, 2))  # (B, M, kz, K2)
    return rb.reshape(b, m * kz * k2).astype(jnp.int32)


def _take_maybe_per_sample(table, idx):
    """Batched row gather: table (B, R, ...), idx (B, Q) in [0, R).

    Flat batch-wide take when the whole table fits the VMEM-promotion
    budget; per-sample lax.map otherwise (see VMEM_TABLE_BYTES).
    """
    b, r = table.shape[:2]
    if table.size * table.dtype.itemsize <= VMEM_TABLE_BYTES:
        flat = (idx + jnp.arange(b, dtype=jnp.int32)[:, None] * r).reshape(-1)
        return jnp.take(table.reshape((b * r,) + table.shape[2:]), flat,
                        axis=0).reshape((b, idx.shape[1]) + table.shape[2:])
    # unrolled per-sample gathers (static slices): unlike lax.map, XLA can
    # pipeline the 8 independent gathers and promote each slice
    return jnp.stack(
        [jnp.take(table[i], idx[i], axis=0) for i in range(b)], axis=0
    )


def csr_zwin_rulebook(rec, n, grid, out_keys, out_mask, out_grid, kernel,
                      stride=(1, 1, 1), pad=(0, 0, 0)):
    """Z-window rulebook from CSR records: per (site, BEV offset) the START
    row of the neighbor column's kz-window plus a kz-bit presence pattern.

    Because keys are column-major sorted, a column's voxels with z in
    [z0, z0+kz) occupy CONSECUTIVE rows starting at colstart +
    popcount(bits below z0) — so the conv can fetch ONE (kz*C)-wide
    z-window row per BEV offset (9 gathers/site) instead of kz*9 C-wide
    rows, and align the fetched candidates to kernel taps in-register
    (see conv_zwin_apply). Requires kz <= 3.

    Returns (start (B, M*K2) int32 routed to row n on miss,
             pattern (B, M*K2) int32 with bit dz set iff z0+dz is active).

    Layout discipline (round 3): every intermediate is FLAT (B, M*K2) —
    the earlier (B, M, K2) shapes put K2=9 in the lane dim and were
    tile-padded ~14x, costing more than the record gathers themselves.
    Only the gather output (B, Q, 4) is unavoidably lane-padded; its four
    components are sliced out once and all bit math runs flat.
    """
    b, m = out_keys.shape
    d, h, w = grid
    hw = h * w
    kz, ky, kx = kernel
    k2 = ky * kx
    q = m * k2
    assert kz <= 3
    od, oh, ow = out_grid
    ok = jnp.where(out_mask, out_keys, 0)
    oz = ok % od
    oy = ok // (ow * od)
    ox = (ok // od) % ow

    offs = np.stack(
        np.meshgrid(np.arange(ky), np.arange(kx), indexing="ij"), -1
    ).reshape(-1, 2)  # (K2, 2) static
    ny = (oy[:, :, None] * stride[1] - pad[1] + jnp.asarray(offs)[:, 0]
          ).reshape(b, q)
    nx = (ox[:, :, None] * stride[2] - pad[2] + jnp.asarray(offs)[:, 1]
          ).reshape(b, q)
    okbev = (
        (ny >= 0) & (ny < h) & (nx >= 0) & (nx < w)
        & jnp.broadcast_to(out_mask[:, :, None], (b, m, k2)).reshape(b, q)
    )
    cell = jnp.where(okbev, ny * w + nx, hw)
    g = _take_maybe_per_sample(rec.reshape(b, hw + 1, 4), cell)  # (B, Q, 4)
    w0 = g[..., 0]
    w1 = g[..., 1]
    w2 = g[..., 2]
    colstart = g[..., 3]

    def below_mask(t):
        tc = jnp.clip(t, 0, 16)
        return jnp.where(tc >= 16, 0xFFFF, (jnp.int32(1) << tc) - 1)

    def bit_at(zq):
        word = jnp.where(zq < 16, w0, jnp.where(zq < 32, w1, w2))
        inz = (zq >= 0) & (zq < d)
        return jnp.where(inz, (word >> jnp.clip(zq % 16, 0, 15)) & 1, 0)

    z0 = jnp.broadcast_to(
        (oz * stride[0] - pad[0])[:, :, None], (b, m, k2)
    ).reshape(b, q)  # window start, flat
    pc = jax.lax.population_count
    z0c = jnp.maximum(z0, 0)
    rank = (
        pc(w0 & below_mask(z0c))
        + pc(w1 & below_mask(z0c - 16))
        + pc(w2 & below_mask(z0c - 32))
    )
    pattern = sum(bit_at(z0 + dz) << dz for dz in range(kz))
    start = jnp.where((pattern > 0) & okbev, colstart + rank, n)
    pattern = jnp.where(okbev, pattern, 0)
    return start.astype(jnp.int32), pattern.astype(jnp.int32)


def conv_zwin_apply(feats, start, pattern, weight, kernel,
                    compute_dtype=jnp.float32):
    """Z-window gather + align + one GEMM.

    feats (B, N, C); (start, pattern) from csr_zwin_rulebook; weight the
    shared (K*Cin, Cout) layout, K = (dz*ky+dy)*kx + dx row-major.
    Returns (B, M, Cout) f32.

    One (kz*C)-wide row is fetched per (site, BEV offset) from a shifted
    z-window view of the feature table; fetched candidate j (the j-th
    active voxel at z >= z0) is routed to kernel tap dz with
    j = popcount(pattern bits below dz) — realized as kz flat right-shifts
    of the gathered rows masked by tap-selection masks (a (K2*kz) mask
    expanded across C via a static 0/1 matmul, avoiding any lane-padded
    (..., C) intermediate). The weight rows are permuted to (dy, dx, dz)
    -major so the gathered block order needs no transpose.
    """
    b, n, c = feats.shape
    kz, ky, kx = kernel
    k2 = ky * kx
    m = start.shape[1] // k2
    cout = weight.shape[1]

    fz = jnp.concatenate(
        [feats, jnp.zeros((b, kz, c), feats.dtype)], axis=1
    ).astype(compute_dtype)  # rows n..n+kz-1 are the zero window
    zwin = jnp.concatenate(
        [fz[:, dz: n + 1 + dz] for dz in range(kz)], axis=-1
    )  # (B, N+1, kz*C)
    g = _take_maybe_per_sample(zwin, start)  # (B, M*K2, kz*C)
    g = g.reshape(b * m, k2 * kz * c)

    # tap-selection masks: candidate j -> tap dz iff bit dz set and
    # popcount(bits below dz) == j, i.e. shift s = dz - j
    pat = pattern.reshape(b * m, k2)
    bits = [(pat >> dz) & 1 for dz in range(kz)]
    jof = [sum(bits[:dz]) if dz else 0 for dz in range(kz)]
    expand = jnp.asarray(
        np.kron(np.eye(k2 * kz, dtype=np.float32), np.ones((1, c), np.float32)),
        compute_dtype,
    )
    x = jnp.zeros((b * m, k2 * kz * c), compute_dtype)
    for s in range(kz):
        msk = jnp.stack(
            [
                (bits[dz] > 0) & (jof[dz] == dz - s) if dz >= s
                else jnp.zeros_like(pat, dtype=bool)
                for dz in range(kz)
            ],
            axis=-1,
        ).reshape(b * m, k2 * kz)  # (B*M, K2, kz) -> flat (k2-major, dz minor)
        maskf = jnp.dot(msk.astype(compute_dtype), expand)
        shifted = jnp.pad(g, ((0, 0), (s * c, 0)))[:, : k2 * kz * c]
        x = x + shifted * maskf

    wperm = weight.reshape(kz, k2, c, cout).transpose(1, 0, 2, 3)
    wperm = wperm.reshape(k2 * kz * c, cout).astype(compute_dtype)
    out = jnp.dot(x, wperm, preferred_element_type=jnp.float32)
    return out.reshape(b, m, cout)


def build_zcol_table(keys, mask, grid):
    """Dense cell -> row table in z-MINOR (column) order: (B, HW+1, D) int16.

    Same perfect-hash contents as build_dense_table but laid out so one
    BEV cell's D z-slots are one contiguous row. Neighbor lookup then
    gathers 9 (BEV offsets) small ROWS per output site instead of 27
    scalar cells: on v5e, row gathers copy at ~2ns/row while scalar
    element gathers cost ~12ns each, so the z-column layout is ~6x
    cheaper for a 3x3x3 rulebook, with z-slot selection done in-register
    (masked lane reduction, see zcol_rulebook).
    The extra BEV column HW is an always-empty sentinel for out-of-bounds
    queries. None if the grid exceeds the int16 budget.
    """
    b, n = keys.shape
    d, h, w = grid
    if _dense_table_dtype(b, n, grid) != jnp.int16:
        return None
    hw = h * w
    # column-major keys make the z-minor table address the key itself;
    # keys are sorted ascending, so the build scatter is a sorted scatter
    # (measured ~2.4x faster than unsorted on v5e)
    bidx = jnp.arange(b, dtype=jnp.int32)[:, None]
    addr = bidx * ((hw + 1) * d) + jnp.where(mask, keys, hw * d)
    rows = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int16), (b, n))
    tab = jnp.full((b * (hw + 1) * d,), -1, jnp.int16)
    # indices stay nondecreasing (invalid rows are the sorted tail, all at
    # the per-sample sentinel hw*d), but they are NOT unique when >1 row is
    # masked off — so only sortedness is claimed, not uniqueness.
    tab = tab.at[addr.reshape(-1)].set(
        jnp.where(mask, rows, -1).reshape(-1), mode="drop",
        indices_are_sorted=True,
    )
    return tab.reshape(b * (hw + 1), d)


def zcol_rulebook(ztab, n, grid, out_keys, out_mask, out_grid, kernel,
                  stride=(1, 1, 1), pad=(0, 0, 0)):
    """Rulebook via the z-column table: 9 row gathers + in-register z-select.

    Returns (B, M*K) int32 with K = kz*ky*kx in (dz, dy, dx) row-major
    order (the shared weight layout); misses route to row n.
    """
    b, m = out_keys.shape
    d, h, w = grid
    hw = h * w
    kz, ky, kx = kernel
    od, oh, ow = out_grid
    ok = jnp.where(out_mask, out_keys, 0)
    oz = ok % od
    oy = ok // (ow * od)
    ox = (ok // od) % ow

    offs = np.stack(
        np.meshgrid(np.arange(ky), np.arange(kx), indexing="ij"), -1
    ).reshape(-1, 2)  # (K2, 2) static
    ny = oy[:, :, None] * stride[1] - pad[1] + jnp.asarray(offs)[:, 0]
    nx = ox[:, :, None] * stride[2] - pad[2] + jnp.asarray(offs)[:, 1]
    okbev = (ny >= 0) & (ny < h) & (nx >= 0) & (nx < w) & out_mask[:, :, None]
    cell = jnp.where(okbev, ny * w + nx, hw)  # sentinel col on miss
    bidx = jnp.arange(b, dtype=jnp.int32)[:, None, None]
    rows = jnp.take(ztab, (bidx * (hw + 1) + cell).reshape(-1), axis=0)
    rows = rows.reshape(b, m, ky * kx, d)  # (B,M,K2,D) int16; row ids fit

    zlanes = jnp.arange(d, dtype=jnp.int32)
    parts = []
    for dz in range(kz):
        zq = oz * stride[0] - pad[0] + dz  # (B, M)
        sel = jnp.where(
            zlanes == zq[:, :, None, None], rows, jnp.int16(-1)
        ).max(axis=-1)  # (B, M, K2); all -1 -> miss (incl. zq out of range)
        parts.append(sel)
    rb = jnp.stack(parts, axis=2).astype(jnp.int32)  # (B,M,kz,K2): (dz,dy,dx)
    rb = rb.reshape(b, m * kz * ky * kx)
    return jnp.where(rb >= 0, rb, n)


def plan_stage_batched(keys, mask, grid, down_kernel, down_stride, down_pad,
                       out_cap, subm_kernel=None, subm_col_cap=None,
                       down_col_cap=None):
    """Per-stage rulebook plan: down-conv active set plus BOTH the
    submanifold rulebook and the down-conv rulebook.

    Uses the z-column table + row-gather lookup (see build_zcol_table)
    when the grid fits the int16 budget, else the flat dense table with a
    single merged element-gather lookup.

    Returns (rb_subm or None, rb_down, out_keys, out_mask, n_dropped) —
    n_dropped (B,) counts capacity-truncated active output sites per
    sample (see downsample_active_set).

    Note: on the dense-shift branch (mid-size BEV grids) the
    ``subm_col_cap`` / ``down_col_cap`` column caps are UNUSED — the
    record image is built at cap n (columns can never exceed sites, so
    no truncation is possible there); tuning those config capacities
    only affects the huge-BEV cached/scatter branch below.
    """
    b, n = keys.shape
    out_grid = out_grid_shape(grid, down_kernel, down_stride, down_pad)

    if grid[0] <= 48 and grid[1] * grid[2] <= DENSE_SHIFT_MAX_BEV_CELLS:
        # z-window rulebooks: (start, pattern) pairs consumed by
        # conv_zwin_apply — 9 window gathers per site instead of 27.
        # Round-4 rework for mid-size BEV grids: ONE dense record image
        # shared by the subm and down rulebooks, each built by a single
        # identity-filter patches conv + one wide row gather per site
        # (zwin_rulebook_dense_shift) — replaces the per-column cache
        # gathers of zwin_rulebook_cached / _down_scatter. At stage-0
        # BEV size the stack materialization loses to the caches (and
        # can exceed HBM), so the huge-grid stage keeps the cached/
        # scatter path below.
        # Round 5: the down stack ALSO yields the output active set
        # (downsample_from_stack) — the sorted-candidate downsample
        # (~25ms of per-sample sorts at stage 1) leaves this branch
        # entirely, and records ride as bf16 byte planes.
        # cap = n: columns can never exceed sites, so no truncation here
        t4c, _, _, _, col_cell = build_col_compact(keys, mask, grid, n,
                                                   want_slotmap=False)
        # phase BARRIERS are measured, not stylistic: letting XLA fuse
        # across the col-compact / image / stack / downsample phases
        # costs +30ms at stage 1, batch 8 (114 -> 84ms with barriers;
        # tools/probe_compose5.py)
        t4c, col_cell = jax.lax.optimization_barrier((t4c, col_cell))
        img = dense_record_image(t4c, col_cell, grid)
        img = jax.lax.optimization_barrier(img)
        stack_d = dense_shift_stack(img, grid, out_grid, down_kernel,
                                    down_stride, down_pad)
        out_keys, out_mask, n_dropped = downsample_from_stack(
            stack_d, grid[0], out_grid, down_kernel, down_stride,
            down_pad, out_cap,
        )
        out_keys, out_mask = jax.lax.optimization_barrier(
            (out_keys, out_mask))
        rbs = None
        if subm_kernel is not None:
            pad_s = tuple(s // 2 for s in subm_kernel)
            rbs = zwin_rulebook_dense_shift(
                t4c, col_cell, n, grid, keys, mask, grid, subm_kernel,
                (1, 1, 1), pad_s, img=img,
            )
        rbd = zwin_rulebook_dense_shift(
            t4c, col_cell, n, grid, out_keys, out_mask, out_grid,
            down_kernel, down_stride, down_pad, stack=stack_d,
        )
        return rbs, rbd, out_keys, out_mask, n_dropped

    out_keys, out_mask, n_dropped = jax.vmap(
        lambda kk, mm: downsample_active_set(
            kk, mm, grid, down_kernel, down_stride, down_pad, out_cap
        )
    )(keys, mask)

    if grid[0] <= 48:
        # huge-BEV stage: compact per-column record caches (round 3)
        t4c, slotmap, _, _, col_cell = build_col_compact(keys, mask, grid, n)
        # same measured phase-barrier medicine as the dense-shift branch
        # (probe_compose5.py: cross-phase fusion cost +30ms at stage 1)
        t4c, slotmap, col_cell, out_keys, out_mask = (
            jax.lax.optimization_barrier(
                (t4c, slotmap, col_cell, out_keys, out_mask)))
        pad_s = tuple(s // 2 for s in subm_kernel) if subm_kernel else None
        rbs = None
        if subm_kernel is not None:
            s_, p_, cdrop_s = zwin_rulebook_cached(
                t4c, slotmap, n, grid, keys, mask, grid, subm_kernel,
                (1, 1, 1), pad_s, col_cap=subm_col_cap,
            )
            rbs = (s_, p_)
            n_dropped = n_dropped + cdrop_s
        # strided down conv: scatter-built cache (candidate-count lookups
        # into the small OUT-resolution slot map; see the function doc)
        sd_, pd_, cdrop_d = zwin_rulebook_down_scatter(
            t4c, col_cell, n, grid, out_keys, out_mask, out_grid,
            down_kernel, down_stride, down_pad, col_cap=down_col_cap,
        )
        return rbs, (sd_, pd_), out_keys, out_mask, n_dropped + cdrop_d

    ztab = build_zcol_table(keys, mask, grid)
    if ztab is not None:
        pad_s = tuple(s // 2 for s in subm_kernel) if subm_kernel else None
        rbs = None
        if subm_kernel is not None:
            rbs = zcol_rulebook(ztab, n, grid, keys, mask, grid, subm_kernel,
                                (1, 1, 1), pad_s)
        rbd = zcol_rulebook(ztab, n, grid, out_keys, out_mask, out_grid,
                            down_kernel, down_stride, down_pad)
        return rbs, rbd, out_keys, out_mask, n_dropped

    table = build_dense_table(keys, mask, grid)
    qd = neighbor_queries(out_keys, out_mask, out_grid, grid, down_kernel,
                          down_stride, down_pad)
    if subm_kernel is None:
        idx, found = lookup_keys_batched(keys, mask, qd, grid, table=table)
        rbd = jnp.where(found, idx, n).astype(jnp.int32)
        return None, rbd, out_keys, out_mask, n_dropped
    pad_s = tuple(s // 2 for s in subm_kernel)
    qs = neighbor_queries(keys, mask, grid, grid, subm_kernel, (1, 1, 1),
                          pad_s)
    idx, found = lookup_keys_batched(
        keys, mask, jnp.concatenate([qs, qd], axis=1), grid, table=table
    )
    rball = jnp.where(found, idx, n).astype(jnp.int32)
    return (rball[:, : qs.shape[1]], rball[:, qs.shape[1]:], out_keys,
            out_mask, n_dropped)


def conv_rulebook_apply(feats, rb_idx, weight, compute_dtype=jnp.float32):
    """Take + one GEMM using a prebuilt rulebook.

    feats (B, N, C); rb_idx (B, N_out*K) routed to the appended zero row N
    for misses; weight (K*Cin, Cout). Returns (B, N_out, Cout), zero at
    padded outputs before the BN bias (BN's final mask zeroes those rows).

    One flat batch-wide take: per-sample lax.map/scan variants and vmap
    were all measured slower on v5e (see ARCHITECTURE.md perf notes).
    """
    b, n, c = feats.shape
    k = weight.shape[0] // c
    n_out = rb_idx.shape[1] // k
    table = jnp.concatenate(
        [feats, jnp.zeros((b, 1, c), feats.dtype)], axis=1
    ).astype(compute_dtype)
    flat = (rb_idx + jnp.arange(b, dtype=jnp.int32)[:, None] * (n + 1)).reshape(-1)
    cols = jnp.take(table.reshape(b * (n + 1), c), flat, axis=0)
    out = jnp.dot(
        cols.reshape(b * n_out, k * c), weight.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )
    return out.reshape(b, n_out, -1)


# ---------------------------------------------------------------------------
# Training-path convs: custom VJPs that express the backward as ANOTHER
# rulebook conv instead of jax's default gather-VJP (a scatter-add that
# runs at ~750 ns/element on v5e — seconds per layer at KITTI scale).
#
#   forward:  out[o] = sum_d X[rb(o, d)] @ W_d
#   dX[i]    = sum_{(o,d): rb(o,d)=i} g[o] @ W_d^T
#            = sum_d g[rbt(i, d)] @ W_d^T          (rbt = transpose rulebook)
#   dW_d     = sum_o X[rb(o, d)]^T @ g[o]          (regather + one GEMM)
#
# For submanifold convs rbt(i, d) == rb(i, K-1-d): the kernel offset grid
# is symmetric and in==out sites, so the transpose rulebook is the SAME
# rulebook with the tap axis reversed — zero extra build cost. For strided
# convs the transpose rulebook is built once per stage from the output
# set's lookup table (transpose_rulebook_batched): tap d reads input i
# from output o = (i + p - d)/s when divisible and active.
# ---------------------------------------------------------------------------


def _flip_transpose_weight(weight, c_in):
    """(K*Cin, Cout) -> (K*Cout, Cin) with W'[d] = W[K-1-d]^T."""
    cout = weight.shape[1]
    k = weight.shape[0] // c_in
    w3 = weight.reshape(k, c_in, cout)[::-1]          # tap-reversed
    return jnp.transpose(w3, (0, 2, 1)).reshape(k * cout, c_in)


def _transpose_weight(weight, c_in):
    """(K*Cin, Cout) -> (K*Cout, Cin) with W'[d] = W[d]^T (no tap flip —
    the tap order is already encoded in the transpose rulebook)."""
    cout = weight.shape[1]
    k = weight.shape[0] // c_in
    w3 = weight.reshape(k, c_in, cout)
    return jnp.transpose(w3, (0, 2, 1)).reshape(k * cout, c_in)


def _conv_rb_dw(feats, rb_idx, g, c_in, compute_dtype):
    """dW = cols^T @ g via forward regather (memory-light residuals)."""
    b, n, _ = feats.shape
    k = rb_idx.shape[1] // g.shape[1]
    table = jnp.concatenate(
        [feats, jnp.zeros((b, 1, c_in), feats.dtype)], axis=1
    ).astype(compute_dtype)
    flat = (rb_idx + jnp.arange(b, dtype=jnp.int32)[:, None] * (n + 1)).reshape(-1)
    cols = jnp.take(table.reshape(b * (n + 1), c_in), flat, axis=0)
    cols = cols.reshape(b * g.shape[1], k * c_in)
    gf = g.reshape(-1, g.shape[-1]).astype(compute_dtype)
    return jnp.dot(cols.T, gf, preferred_element_type=jnp.float32)


def make_subm_conv_vjp(compute_dtype=jnp.float32):
    """conv_rulebook_apply for SUBMANIFOLD convs with a conv-as-backward
    custom VJP. Returns f(feats, rb_idx, weight) -> (B, N, Cout)."""

    @jax.custom_vjp
    def f(feats, rb_idx, weight):
        return conv_rulebook_apply(feats, rb_idx, weight, compute_dtype)

    def fwd(feats, rb_idx, weight):
        return f(feats, rb_idx, weight), (feats, rb_idx, weight)

    def bwd(res, g):
        feats, rb_idx, weight = res
        c_in = feats.shape[-1]
        # dX[i] = sum_d g[rb(i, K-1-d)] @ W_d^T; substituting e = K-1-d
        # this is the SAME rulebook with tap-flip-transposed weights:
        # sum_e g[rb(i, e)] @ W_{K-1-e}^T (symmetric offset grid).
        wt = _flip_transpose_weight(weight, c_in)
        dx = conv_rulebook_apply(
            g.astype(compute_dtype), rb_idx, wt, compute_dtype
        ).astype(feats.dtype)
        dw = _conv_rb_dw(feats, rb_idx, g, c_in, compute_dtype)
        return dx, None, dw.astype(weight.dtype)

    f.defvjp(fwd, bwd)
    return f


def make_down_conv_vjp(compute_dtype=jnp.float32):
    """conv_rulebook_apply for STRIDED convs: f(feats, rb, rbt, weight).

    ``rbt`` (B, N_in*K) is the transpose rulebook over the K taps in
    REVERSED order (rbt entry (i, K-1-d) = output row o reading input i
    at tap d, or miss) so its weight arrangement matches
    _flip_transpose_weight; build with transpose_rulebook_batched."""

    @jax.custom_vjp
    def f(feats, rb_idx, rbt_idx, weight):
        return conv_rulebook_apply(feats, rb_idx, weight, compute_dtype)

    def fwd(feats, rb_idx, rbt_idx, weight):
        return f(feats, rb_idx, rbt_idx, weight), (feats, rb_idx, rbt_idx,
                                                   weight)

    def bwd(res, g):
        feats, rb_idx, rbt_idx, weight = res
        c_in = feats.shape[-1]
        wt = _flip_transpose_weight(weight, c_in)
        dx = conv_rulebook_apply(
            g.astype(compute_dtype), rbt_idx, wt, compute_dtype
        ).astype(feats.dtype)
        dw = _conv_rb_dw(feats, rb_idx, g, c_in, compute_dtype)
        return dx, None, None, dw.astype(weight.dtype)

    f.defvjp(fwd, bwd)
    return f


def transpose_rulebook_batched(in_keys, in_mask, in_grid, out_keys, out_mask,
                               out_grid, kernel, stride, pad, table=None):
    """Transpose rulebook of a strided conv, K taps in REVERSED order.

    Entry (i, K-1-d) = row (in the OUT arrays) of the output site
    o = (i + p - d)/s that reads input i at kernel offset d — routed to
    the miss row M when d is not divisible, o is out of range, or o is
    inactive. Consumed by make_down_conv_vjp with _flip_transpose_weight.
    """
    b, n = in_keys.shape
    m = out_keys.shape[1]
    coords = jax.vmap(
        lambda k_, m_: keys_to_coords(jnp.where(m_, k_, 0), in_grid)
    )(in_keys, in_mask)
    offs = jnp.asarray(_kernel_offsets(kernel))          # (K, 3)
    stride_a = jnp.asarray(stride, jnp.int32)
    pad_a = jnp.asarray(pad, jnp.int32)
    og = jnp.asarray(out_grid, jnp.int32)

    t = coords[:, :, None, :] + pad_a - offs[None, None]  # (B, N, K, 3)
    divis = (t % stride_a == 0).all(-1)
    o = t // stride_a
    ok = (
        divis & (o >= 0).all(-1) & (o < og).all(-1) & in_mask[:, :, None]
    )
    okey = (o[..., 1] * out_grid[2] + o[..., 2]) * out_grid[0] + o[..., 0]
    okey = jnp.where(ok, okey, sentinel_key(out_grid))
    idx, found = lookup_keys_batched(
        out_keys, out_mask, okey.reshape(b, -1), out_grid, table=table
    )
    rbt = jnp.where(found, idx, m).astype(jnp.int32).reshape(b, n, -1)
    return rbt[:, :, ::-1].reshape(b, n * rbt.shape[-1])


def plan_stage_train_batched(keys, mask, grid, down_kernel, down_stride,
                             down_pad, out_cap, subm_kernel=None):
    """Training-path stage plan: full per-tap rulebooks (not z-window
    form — its align machinery has no cheap VJP) plus the down conv's
    TRANSPOSE rulebook, so every backward runs as a rulebook conv
    (make_subm_conv_vjp / make_down_conv_vjp) instead of scatter-add.

    Returns (rb_subm or None, rb_down, rbt_down, out_keys, out_mask,
    n_dropped)."""
    b, n = keys.shape
    out_grid = out_grid_shape(grid, down_kernel, down_stride, down_pad)
    out_keys, out_mask, n_dropped = jax.vmap(
        lambda kk, mm: downsample_active_set(
            kk, mm, grid, down_kernel, down_stride, down_pad, out_cap
        )
    )(keys, mask)

    pad_s = tuple(s // 2 for s in subm_kernel) if subm_kernel else None
    if grid[0] <= 48:
        t4c, slotmap, _, _, _ = build_col_compact(keys, mask, grid, n)
        rbs = None
        if subm_kernel is not None:
            rbs = rulebook_compact(t4c, slotmap, n, grid, keys, mask, grid,
                                   subm_kernel, (1, 1, 1), pad_s)
        rbd = rulebook_compact(t4c, slotmap, n, grid, out_keys, out_mask,
                               out_grid, down_kernel, down_stride, down_pad)
    else:
        table = build_dense_table(keys, mask, grid)
        qd = neighbor_queries(out_keys, out_mask, out_grid, grid,
                              down_kernel, down_stride, down_pad)
        rbs = None
        if subm_kernel is not None:
            qs = neighbor_queries(keys, mask, grid, grid, subm_kernel,
                                  (1, 1, 1), pad_s)
            idx, found = lookup_keys_batched(
                keys, mask, jnp.concatenate([qs, qd], axis=1), grid,
                table=table,
            )
            rball = jnp.where(found, idx, n).astype(jnp.int32)
            rbs = rball[:, : qs.shape[1]]
            rbd = rball[:, qs.shape[1]:]
        else:
            idx, found = lookup_keys_batched(keys, mask, qd, grid,
                                             table=table)
            rbd = jnp.where(found, idx, n).astype(jnp.int32)
    rbt = transpose_rulebook_batched(
        keys, mask, grid, out_keys, out_mask, out_grid, down_kernel,
        down_stride, down_pad,
    )
    return rbs, rbd, rbt, out_keys, out_mask, n_dropped


def densify_gather(fz, idx, self_pos, mask):
    """Row gather for dense_from_sparse with a gather-as-backward VJP.

    fz (B, N+1, C) feature table with appended zero row; idx (B, CELLS)
    routes inactive cells to row N; self_pos/mask (B, N) give each source
    row's own position in the gathered output (its cell's raster index)
    so the backward is one take_along_axis — the default gather VJP is a
    CELLS-sized scatter-add (~750 ns/element on v5e).
    """

    @jax.custom_vjp
    def f(fz, idx, self_pos, mask):
        return _take_maybe_per_sample(fz, idx)

    def fwd(fz, idx, self_pos, mask):
        return f(fz, idx, self_pos, mask), (self_pos, mask)

    def bwd(res, g):
        self_pos, mask = res
        # each real row r < N is read by exactly one cell: its own
        dfr = jnp.take_along_axis(
            g, jnp.where(mask, self_pos, 0)[..., None], axis=1
        )
        dfr = jnp.where(mask[..., None], dfr, 0.0).astype(g.dtype)
        dfz = jnp.concatenate(
            [dfr, jnp.zeros((g.shape[0], 1, g.shape[-1]), g.dtype)], axis=1
        )
        return dfz, None, None, None

    f.defvjp(fwd, bwd)
    return f(fz, idx, self_pos, mask)


def downsample_active_set_batched(keys, mask, in_grid, kernel, stride, pad,
                                  out_cap):
    """Batched active-output-set computation via dense-grid dedup.

    Marks each candidate child cell in a transient (B, out_cells) grid,
    ranks marked cells with a cumsum, and scatters them into a fixed
    ascending key array — O(cells) data-parallel work instead of sorting
    the 27N candidate list per sample (output grids of SpMiddleFHD are
    <= 12M cells, so the dense pass is a few ms for the whole batch).

    keys (B, N) sorted, mask (B, N). Returns (out_keys (B, out_cap),
    out_mask (B, out_cap)) with ascending keys (deterministic truncation
    of the largest keys, same as the per-sample variant).
    """
    og = out_grid_shape(in_grid, kernel, stride, pad)
    s_out = sentinel_key(og)
    b, n = keys.shape
    coords = keys_to_coords(jnp.where(mask, keys, 0), in_grid)  # (B, N, 3)
    offs = jnp.asarray(_kernel_offsets(kernel))
    stride_a = jnp.asarray(stride, jnp.int32)
    pad_a = jnp.asarray(pad, jnp.int32)

    t = coords[:, :, None, :] + pad_a - offs[None, None]
    divis = (t % stride_a == 0).all(-1)
    o = t // stride_a
    ok = (
        divis & (o >= 0).all(-1) & (o < jnp.asarray(og, jnp.int32)).all(-1)
        & mask[:, :, None]
    )
    okey = (o[..., 1] * og[2] + o[..., 2]) * og[0] + o[..., 0]
    okey = jnp.where(ok, okey, s_out)  # (B, N, K)

    flat = (okey + (jnp.arange(b, dtype=jnp.int32) * (s_out + 1))[:, None, None])
    marked = jnp.zeros((b * (s_out + 1),), jnp.int32).at[flat.reshape(-1)].set(
        1, mode="drop"
    ).reshape(b, s_out + 1)
    marked = marked.at[:, s_out].set(0)  # drop sentinel bucket
    rank = jnp.cumsum(marked, axis=1) - 1  # rank among marked cells
    cell_keys = jnp.broadcast_to(
        jnp.arange(s_out + 1, dtype=jnp.int32), (b, s_out + 1)
    )
    dst = jnp.where((marked > 0) & (rank < out_cap), rank, out_cap)
    dst = dst + (jnp.arange(b, dtype=jnp.int32) * (out_cap + 1))[:, None]
    out_keys = jnp.full((b * (out_cap + 1),), s_out, jnp.int32).at[
        dst.reshape(-1)
    ].set(cell_keys.reshape(-1), mode="drop").reshape(b, out_cap + 1)[:, :out_cap]
    return out_keys, out_keys < s_out
