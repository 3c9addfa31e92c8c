"""Sparse CNN middle feature extractors (SECOND's SpMiddleFHD family).

Behavioral spec from the reference (vision3d/detector/sparse_cnn.py):
4 blocks of submanifold + strided sparse convs taking voxel features at
grid (41, 1600, 1408) ZYX down to (2, 200, 176), then a z-collapse to a
(ny, nx, 128) BEV map. Channel plan 4 -> 16 -> 32 -> 64 -> 64
(sparse_cnn.py:151-175); the Lite variant keeps only the strided convs
(:178-186). BN eps 1e-3, momentum 0.01 (torch convention).

TPU redesign (see vision3d_tpu/ops/sparse.py): fixed-capacity key-sorted
sparse tensors, binary-search rulebooks, im2col GEMMs on the MXU, masked
batch norm. Batched via vmap; the whole extractor is one jit-able pure
function of (params, voxels).
"""

from typing import Tuple

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from vision3d_tpu.config import Config
from vision3d_tpu.ops import column_sparse as csp
from vision3d_tpu.ops import sparse as sp


@flax.struct.dataclass
class SparseTensor:
    """Batched fixed-capacity key-sorted sparse voxel tensor."""

    feats: jax.Array  # (B, N, C)
    keys: jax.Array   # (B, N) int32, sorted ascending, sentinel-padded
    mask: jax.Array   # (B, N) bool
    grid: Tuple[int, int, int] = flax.struct.field(pytree_node=False)

    @property
    def coords(self):
        """(B, N, 3) ZYX coords (zeros at padding)."""
        return jax.vmap(lambda k, m: sp.keys_to_coords(jnp.where(m, k, 0), self.grid))(
            self.keys, self.mask
        )


@flax.struct.dataclass
class ColumnTensor:
    """Batched column-sparse tensor: sparse in BEV, dense in z
    (ops/column_sparse.py) — the TPU fast path for SECOND's middle CNN.

    Features are stored FLAT as z-major (D*C) rows: any (..., D, C) or
    (..., C) materialization is lane-padded up to 8x by TPU tiling (see
    ops/column_sparse.py header), so the channel count rides along as the
    static ``c`` field instead of a tensor dimension.
    """

    feats: jax.Array     # (B, Ncol, D*C) flat z-major rows
    zmask: jax.Array     # (B, Ncol, D)
    keys: jax.Array      # (B, Ncol) sorted BEV keys (y * W + x)
    mask: jax.Array      # (B, Ncol)
    grid: Tuple[int, int, int] = flax.struct.field(pytree_node=False)
    c: int = flax.struct.field(pytree_node=False, default=4)

    def to_voxel_sparse(self, cap: int) -> SparseTensor:
        d = self.grid[0]
        f4 = self.feats.reshape(
            self.feats.shape[0], self.feats.shape[1], d, self.c
        ).astype(jnp.float32)
        f, k, m = jax.vmap(
            lambda f_, z, kk, cm: csp.columns_to_voxels(
                f_, z, kk, cm, self.grid, cap
            )
        )(f4, self.zmask, self.keys, self.mask)
        return SparseTensor(feats=f, keys=k, mask=m, grid=self.grid)


@flax.struct.dataclass
class DenseTensor:
    """Dense masked voxel volume for the high-occupancy late CNN stages.

    spconv's strided convs dilate the active set until late-stage
    occupancy hits 3-36% on KITTI, where gather-based sparse paths lose
    to plain dense conv3d on the MXU with exact submanifold semantics
    recovered by masking to the active set. Spatial order is (d, h, w) —
    z-MAJOR — so the tensor's minor two dims are (W, C) and only the
    channel axis is tile-padded (64 -> 128, 2x); the previous (h, w, d)
    order put (D, C) minor and paid (16/11)*(128/64) = 2.9x padded
    memory/traffic on every dense-stage op (measured round 3).
    keys/mask ride along only when a downstream consumer (PV-RCNN
    multiscale) needs compact form.
    """

    feats: jax.Array   # (B, D, H, W, C); (B, H, W, D, C) when hwdc
    occ: jax.Array     # (B, D, H, W) bool — the EXACT spconv active set
    grid: Tuple[int, int, int] = flax.struct.field(pytree_node=False)
    keys: jax.Array = None   # (B, N) optional compact key set
    mask: jax.Array = None
    # hwdc: feats ride in the densify gather's NATIVE (B, H, W, D, C)
    # order (a free reshape of the (B, HW, D*C) slab gather) instead of
    # paying the ~17ms (0,3,1,2,4) transpose into z-major; the FIRST
    # dense conv consumes it via conv dimension_numbers (input NHWDC ->
    # output NDHWC) so the relayout rides inside the conv, which runs at
    # the same speed either way (tools/probe_nhwdc.py). occ stays
    # z-major always (bools are 75x smaller than the feature volume).
    hwdc: bool = flax.struct.field(pytree_node=False, default=False)

    def to_voxel_sparse(self) -> SparseTensor:
        d, h, w = self.grid
        b = self.feats.shape[0]
        c = self.feats.shape[-1]
        flat = self.feats.reshape(b, d * h * w, c).astype(jnp.float32)
        k = jnp.where(self.mask, self.keys, 0)
        if self.hwdc:
            # (B, H, W, D, C) raster IS the column-major key order
            raster = k
        else:
            # column-major key (y*w+x)*d + z -> z-major raster z*h*w+y*w+x
            raster = (k % d) * (h * w) + k // d
        f = jnp.take_along_axis(flat, raster[..., None], axis=1)
        f = jnp.where(self.mask[..., None], f, 0.0)
        return SparseTensor(feats=f, keys=self.keys, mask=self.mask,
                            grid=self.grid)


def dense_from_sparse_cols(st: SparseTensor, keep_keys: bool,
                           ncol_cap: int) -> DenseTensor:
    """Densify through compact column slabs (two-hop gather).

    The direct per-CELL row gather (dense_from_sparse) touches D*HW rows
    of C lanes — 12.4M 2KB-tile fetches at the stage-2 cutover (~35ms
    floor). Routing through columns cuts the row count: NCol*D gathers of
    C-wide site rows build a (B, NCol, D*C) slab (KITTI: NCol ~ 0.25*HW
    sites' columns), then each BEV cell fetches ONE (D*C)-wide slab row.
    HW + NCol*D rows instead of HW*D.

    Returns (DenseTensor, ncol_dropped) — columns beyond ``ncol_cap`` are
    dropped and MUST be surfaced as a capacity diagnostic by the caller.
    """
    d, h, w = st.grid
    b, n, c = st.feats.shape
    hw = h * w
    t4c, slotmap, _, ncol_dropped, _ = sp.build_col_compact(
        st.keys, st.mask, st.grid, ncol_cap
    )
    # per (column, z): source row = colstart + rank(z), miss -> n
    w0 = t4c[..., 0][:, :, None]
    w1 = t4c[..., 1][:, :, None]
    w2 = t4c[..., 2][:, :, None]
    colstart = t4c[..., 3][:, :, None]
    pc = jax.lax.population_count
    zs = jnp.arange(d, dtype=jnp.int32)[None, None, :]

    def below(t):
        tc = jnp.clip(t, 0, 16)
        return jnp.where(tc >= 16, 0xFFFF, (jnp.int32(1) << tc) - 1)

    rank = pc(w0 & below(zs)) + pc(w1 & below(zs - 16)) + pc(w2 & below(zs - 32))
    word = jnp.where(zs < 16, w0, jnp.where(zs < 32, w1, w2))
    present = ((word >> jnp.clip(zs % 16, 0, 15)) & 1) > 0  # (B, NC+1, D)
    srow = jnp.where(present, colstart + rank, n)

    fz = jnp.concatenate(
        [st.feats, jnp.zeros((b, 1, c), st.feats.dtype)], axis=1
    )
    nc = ncol_cap
    slab = sp._take_maybe_per_sample(
        fz, srow.reshape(b, (nc + 1) * d)
    ).reshape(b, nc + 1, d * c)  # (B, NC+1, D*C), zero rows at misses

    # per BEV cell: its column slot (slotmap) -> one slab row
    cells = jnp.broadcast_to(
        jnp.arange(hw, dtype=jnp.int32)[None], (b, hw)
    )
    slot = jnp.stack(
        [jnp.take(slotmap[i], cells[i]) for i in range(b)], axis=0
    ).astype(jnp.int32)
    cidx = jnp.where((slot >= 0) & (slot < nc), slot, nc)
    slab = slab.at[:, nc].set(0.0)  # miss row
    df = sp._take_maybe_per_sample(slab, cidx)       # (B, HW, D*C)
    # FREE reshape into (B, H, W, D, C) — the z-major transpose the
    # first dense conv used to need (~17ms at the stage-2 cutover,
    # tools/probe_densify5.py: 62.2 -> 44.6ms) now rides inside that
    # conv via dimension_numbers (see DenseTensor.hwdc)
    feats = df.reshape(b, h, w, d, c)
    occ_hw = sp._take_maybe_per_sample(
        jnp.concatenate([present[:, :nc], jnp.zeros((b, 1, d), bool)],
                        axis=1),
        cidx,
    )  # (B, HW, D)
    occ = jnp.transpose(occ_hw.reshape(b, h, w, d), (0, 3, 1, 2))
    dt = DenseTensor(feats=feats, occ=occ, grid=st.grid,
                     keys=st.keys if keep_keys else None,
                     mask=st.mask if keep_keys else None, hwdc=True)
    return dt, ncol_dropped


def dense_from_sparse(st: SparseTensor, keep_keys: bool) -> DenseTensor:
    """Densify a sparse tensor by GATHER, not scatter.

    A row-scatter of the sparse features into the dense volume measured
    ~420ns/row on v5e (215ms at the stage-2 cutover); instead the CSR
    records give every dense cell's source row in O(1) bit arithmetic
    (row = colstart + popcount(bits below z)), so densification is one
    all-cells per-sample row gather from the small sparse feature table
    (~2.8ns/row) plus vector popcounts.

    Layout discipline (this function was 240ms in round 2, ~45ms now):
    every intermediate is (B, HW) or (B, D, HW) — large-minor-dim shapes
    the TPU tiles without padding. The previous (B, HW, D) stacking put
    D=11 in the lane dim (padded ~12x) and cost ~200ms of pure traffic.
    """
    d, h, w = st.grid
    b, n, c = st.feats.shape
    hw = h * w
    rec = sp.build_csr(st.keys, st.mask, st.grid)
    if rec is None:  # grid unsupported (d > 48): sorted-row-scatter fallback
        cells = d * h * w
        k = jnp.where(st.mask, st.keys, 0)
        raster = (k % d) * hw + k // d  # z-major raster index
        idx = jnp.where(st.mask, raster, cells) + (
            jnp.arange(b, dtype=jnp.int32) * (cells + 1)
        )[:, None]
        feats = jnp.zeros((b * (cells + 1), c), st.feats.dtype).at[
            idx.reshape(-1)
        ].set(jnp.where(st.mask[..., None], st.feats, 0.0).reshape(b * n, c),
              mode="drop")
        occ = jnp.zeros((b * (cells + 1),), bool).at[idx.reshape(-1)].set(
            st.mask.reshape(-1), mode="drop",
        )
        feats = feats.reshape(b, cells + 1, c)[:, :cells].reshape(
            b, d, h, w, c)
        occ = occ.reshape(b, cells + 1)[:, :cells].reshape(b, d, h, w)
        return DenseTensor(feats=feats, occ=occ, grid=st.grid,
                           keys=st.keys if keep_keys else None,
                           mask=st.mask if keep_keys else None)

    rec4 = rec.reshape(b, hw + 1, 4)
    # component split FIRST: all bit math below runs on flat (B, HW)
    w0 = rec4[:, :hw, 0]
    w1 = rec4[:, :hw, 1]
    w2 = rec4[:, :hw, 2]
    colstart = rec4[:, :hw, 3]
    pc = jax.lax.population_count
    idx_z, occ_z = [], []
    for z in range(d):  # z static: the word masks are compile-time consts
        m0 = (1 << min(z, 16)) - 1 if z < 16 else 0xFFFF
        m1 = (1 << min(max(z - 16, 0), 16)) - 1 if z < 32 else 0xFFFF
        m2 = (1 << max(z - 32, 0)) - 1
        rank = pc(w0 & m0) + pc(w1 & m1) + pc(w2 & m2)
        word = (w0, w1, w2)[z // 16]
        present = ((word >> (z % 16)) & 1) > 0
        occ_z.append(present)
        idx_z.append(jnp.where(present, colstart + rank, n))
    idx = jnp.stack(idx_z, axis=1)       # (B, D, HW): minor dim unpadded
    occ = jnp.stack(occ_z, axis=1)       # (B, D, HW)
    fz = jnp.concatenate(
        [st.feats, jnp.zeros((b, 1, c), st.feats.dtype)], axis=1
    )
    k = jnp.where(st.mask, st.keys, 0)
    self_pos = (k % d) * hw + k // d  # row's own z-major raster cell
    feats = sp.densify_gather(
        fz, idx.reshape(b, d * hw), self_pos, st.mask
    ).reshape(b, d, h, w, c)
    return DenseTensor(feats=feats, occ=occ.reshape(b, d, h, w),
                       grid=st.grid,
                       keys=st.keys if keep_keys else None,
                       mask=st.mask if keep_keys else None)


def dense_from_columns(ct: ColumnTensor, keep_keys: bool,
                       voxel_cap: int = 0) -> DenseTensor:
    """ColumnTensor -> DenseTensor cutover for the dense late stages.

    One int32 BEV slot-map scatter + one all-cells row gather of the flat
    (D*C) column rows (VMEM-resident table) + one transpose into the
    z-major dense layout — ~6x cheaper than the CSR-record densify the
    voxel backend needs, because the column form already IS z-dense.
    """
    d, h, w = ct.grid
    b, n, _ = ct.feats.shape
    hw = h * w
    c = ct.c
    bidx = jnp.arange(b, dtype=jnp.int32)[:, None]
    addr = jnp.where(ct.mask, bidx * (hw + 1) + ct.keys, b * (hw + 1))
    slot = jnp.full((b * (hw + 1) + 1,), n, jnp.int32).at[
        addr.reshape(-1)
    ].set(
        jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (b, n)).reshape(-1),
        mode="drop",
    )[: b * (hw + 1)].reshape(b, hw + 1)[:, :hw]

    table = jnp.concatenate(
        [ct.feats, jnp.zeros((b, 1, d * c), ct.feats.dtype)], axis=1
    )
    df = sp._take_maybe_per_sample(table, slot)          # (B, HW, D*C)
    feats = df.reshape(b, h, w, d, c)  # free view; see DenseTensor.hwdc
    zt = jnp.concatenate([ct.zmask, jnp.zeros((b, 1, d), bool)], axis=1)
    occ_hw = sp._take_maybe_per_sample(zt, slot)          # (B, HW, D)
    occ = jnp.transpose(occ_hw.reshape(b, h, w, d), (0, 3, 1, 2))
    keys = mask = None
    if keep_keys:
        vs = ct.to_voxel_sparse(voxel_cap or n * d)
        keys, mask = vs.keys, vs.mask
    return DenseTensor(feats=feats, occ=occ, grid=ct.grid,
                       keys=keys, mask=mask, hwdc=True)


def _zwin_conv(feats, rb, weight, kernel, cdt, mode):
    """Dispatch the z-window align+GEMM to XLA or the Pallas kernel.

    "auto" uses Pallas on TPU only: the fused in-VMEM align saves the
    materialized align passes (measured ~3x the gather cost in XLA),
    while on CPU interpret-mode Pallas is orders slower than XLA.
    """
    if mode == "pallas" or (mode == "auto" and jax.default_backend() == "tpu"):
        from vision3d_tpu.ops.pallas import zwin_conv

        return zwin_conv.PRODUCTION_ZWIN(
            feats, rb[0], rb[1], weight, kernel, compute_dtype=cdt
        )
    return sp.conv_zwin_apply(feats, rb[0], rb[1], weight, kernel,
                              compute_dtype=cdt)


def _dense_conv(x, weight, kernel, stride, pad, cdt, in_hwdc=False):
    """conv3d on z-major (B, D, H, W, C) volumes with the shared
    (K*Cin, Cout) weight layout (K = (dz*ky+dy)*kx+dx row-major).

    ``in_hwdc``: consume a (B, H, W, D, C)-ordered input (the densify
    gather's native order — see DenseTensor.hwdc) while still producing
    z-major output; the layout change rides inside the conv for free
    (tools/probe_nhwdc.py: conv3d speed is layout-insensitive).
    """
    kz, ky, kx = kernel
    cin = weight.shape[0] // (kz * ky * kx)
    cout = weight.shape[1]
    wk = weight.reshape(kz, ky, kx, cin, cout)
    # no preferred_element_type=f32: the MXU accumulates bf16 in f32
    # regardless, and an explicit f32 output makes the conv's VJP fail on
    # mixed bf16/f32 cotangent dtypes; BN promotes to f32 downstream.
    out = jax.lax.conv_general_dilated(
        x.astype(cdt), wk.astype(cdt),
        window_strides=(stride[0], stride[1], stride[2]),
        padding=((pad[0], pad[0]), (pad[1], pad[1]), (pad[2], pad[2])),
        dimension_numbers=(
            "NHWDC" if in_hwdc else "NDHWC", "DHWIO", "NDHWC"),
    )
    return out.astype(jnp.float32)


# Ruled out by measurement (tools/microbench_r4.py, v5e batch 8): conv3d
# as kz z-slice-batched conv2ds (out[:, z] = sum_dz conv2d(x[:, z+dz-p],
# W[dz])) — 66.0ms vs conv3d's 32.5ms at the s2 subm shape and 66.9 vs
# 5.7ms for the s2 down conv; the strided z-slice views force relayouts
# that swamp the hoped-for 2D-lowering MXU gain. XLA's NDHWC conv3d
# (84 TFLOP/s-effective) stays the dense backend.
def dense_dilate_occ(occ, kernel, stride, pad):
    """spconv strided-conv active set: any active input in the window.
    occ (B, D, H, W) z-major."""
    kz, ky, kx = kernel
    return jax.lax.reduce_window(
        occ, False, jax.lax.bitwise_or,
        window_dimensions=(1, kz, ky, kx),
        window_strides=(1, stride[0], stride[1], stride[2]),
        padding=((0, 0), (pad[0], pad[0]), (pad[1], pad[1]),
                 (pad[2], pad[2])),
    )


def from_voxels(feats, coords, mask, grid) -> SparseTensor:
    f, k, m = jax.vmap(lambda f, c, v: sp.make_sorted(f, c, v, grid))(
        feats, coords, mask
    )
    return SparseTensor(feats=f, keys=k, mask=m, grid=grid)


def from_voxels_columns(feats, coords, mask, grid, ncol_cap: int):
    """Returns (ColumnTensor, n_dropped (B,)) — n_dropped counts active
    columns truncated by ``ncol_cap`` (capacity-overflow detection)."""
    f, z, k, m, ndrop = csp.columns_from_voxels_batched(
        feats, coords, mask, grid, ncol_cap
    )
    return ColumnTensor(feats=f, zmask=z, keys=k, mask=m, grid=grid,
                        c=feats.shape[-1]), ndrop


class MaskedBatchNorm(nn.Module):
    """BatchNorm over (batch, voxel) dims that ignores padded rows.

    Matches torch BatchNorm1d semantics used by the reference
    (sparse_cnn.py:18, :28): eps 1e-3, running-stat momentum 0.01.
    """

    eps: float = 1e-3
    momentum: float = 0.99  # flax convention == torch momentum 0.01

    @nn.compact
    def __call__(self, x, mask, train: bool):
        c = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,)))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,)))
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))

        if train:
            axes = tuple(range(x.ndim - 1))
            w = mask.astype(x.dtype)[..., None]
            n = jnp.maximum(w.sum(), 1.0)
            mean = (x * w).sum(axis=axes) / n
            var = (jnp.square(x - mean) * w).sum(axis=axes) / n
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias
        return jnp.where(mask[..., None], y, 0.0)


class MaskedBatchNormFlat(nn.Module):
    """MaskedBatchNorm for FLAT (B, N, D*C) column rows.

    Same (C,)-shaped parameters, collection names and statistics as
    MaskedBatchNorm (variables are interchangeable across backends); the
    normalization runs directly on flat rows with z-tiled parameters so
    no lane-padded (..., C) tensor is ever materialized.
    ``maskf`` is the (B, N, D*C) float site-mask from expand_site_mask.
    """

    channels: int
    eps: float = 1e-3
    momentum: float = 0.99

    @nn.compact
    def __call__(self, x, maskf, train: bool):
        c = self.channels
        d = x.shape[-1] // c
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,)))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,)))
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))

        if train:
            xm = x * maskf
            n = jnp.maximum(maskf.sum() / c, 1.0)
            mean = xm.sum(axis=(0, 1)).reshape(d, c).sum(0) / n
            ex2 = (xm * x).sum(axis=(0, 1)).reshape(d, c).sum(0) / n
            var = jnp.maximum(ex2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        else:
            mean, var = ra_mean.value, ra_var.value

        g = jax.lax.rsqrt(var + self.eps) * scale
        b2 = bias - mean * g
        return x * jnp.tile(g, d) + jnp.tile(b2, d)


class SubMConv(nn.Module):
    """Submanifold sparse conv: output sites == input sites.

    The reference shares rulebooks between consecutive subm layers via
    spconv ``indice_key`` (sparse_cnn.py:154-172); here the "rulebook" is
    the binary-search gather which XLA CSEs across layers automatically.
    """

    features: int
    kernel: Tuple[int, int, int] = (3, 3, 3)
    dtype: str = "float32"
    zwin: str = "xla"

    @nn.compact
    def __call__(self, st, train: bool, rb=None):
        k = int(np.prod(self.kernel))
        cin = st.c if isinstance(st, ColumnTensor) else st.feats.shape[-1]
        pad = tuple(s // 2 for s in self.kernel)
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
            (k * cin, self.features),
        )
        if isinstance(st, DenseTensor):
            cdt = jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32
            pad3 = tuple(k // 2 for k in self.kernel)
            out = _dense_conv(st.feats, w, self.kernel, (1, 1, 1), pad3, cdt,
                              in_hwdc=st.hwdc)
            out = MaskedBatchNorm()(out, st.occ, train)
            out = jnp.where(st.occ[..., None], nn.relu(out), 0.0).astype(cdt)
            return st.replace(feats=out, hwdc=False)
        if isinstance(st, ColumnTensor):
            cdt = jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32
            d = st.grid[0]
            if rb is None:
                rb = csp.build_bev_rulebook_batched(
                    st.keys, st.mask, (st.grid[1], st.grid[2]),
                    (self.kernel[1], self.kernel[2]), (1, 1), (pad[1], pad[2]),
                )
            out = csp.column_conv_dz(
                st.feats, rb, w, self.kernel, d, cin, 1, pad[0],
                compute_dtype=cdt,
            )  # (B, N, D*Cout) f32
            site = st.zmask & st.mask[..., None]
            maskf = csp.expand_site_mask(site, self.features)
            out = MaskedBatchNormFlat(
                channels=self.features, name="MaskedBatchNorm_0"
            )(out, maskf, train)
            out = (nn.relu(out) * maskf).astype(cdt)
            return st.replace(feats=out, c=self.features)
        cdt = jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32
        if rb is None:
            rb = sp.build_rulebook_batched(
                st.keys, st.mask, st.grid, self.kernel, (1, 1, 1), pad
            )
        if isinstance(rb, tuple):
            out = _zwin_conv(st.feats, rb, w, self.kernel, cdt, self.zwin)
        elif train:
            # conv-as-backward custom VJP (the default gather VJP is a
            # ~750ns/element scatter-add — seconds/layer at this scale)
            out = sp.make_subm_conv_vjp(cdt)(st.feats, rb, w)
        else:
            out = sp.conv_rulebook_apply(st.feats, rb, w, compute_dtype=cdt)
        out = MaskedBatchNorm()(out, st.mask, train)
        out = jnp.where(st.mask[..., None], nn.relu(out), 0.0)
        return st.replace(feats=out)


class SparseConvDown(nn.Module):
    """Strided sparse conv: computes a new (smaller-grid) active set."""

    features: int
    kernel: Tuple[int, int, int]
    stride: Tuple[int, int, int]
    pad: Tuple[int, int, int]
    out_cap: int
    out_col_cap: int = 0  # column-backend output capacity (0: use out_cap)
    dtype: str = "float32"
    zwin: str = "xla"

    @nn.compact
    def __call__(self, st, train: bool, plan=None):
        k = int(np.prod(self.kernel))
        cin = st.c if isinstance(st, ColumnTensor) else st.feats.shape[-1]
        out_grid = sp.out_grid_shape(st.grid, self.kernel, self.stride, self.pad)
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
            (k * cin, self.features),
        )

        if isinstance(st, DenseTensor):
            cdt = jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32
            of = _dense_conv(st.feats, w, self.kernel, self.stride, self.pad,
                             cdt, in_hwdc=st.hwdc)
            oz = dense_dilate_occ(st.occ, self.kernel, self.stride, self.pad)
            of = MaskedBatchNorm()(of, oz, train)
            of = jnp.where(oz[..., None], nn.relu(of), 0.0).astype(cdt)
            okeys = omask = None
            if st.keys is not None:
                okeys, omask, _ = jax.vmap(
                    lambda kk, m: sp.downsample_active_set(
                        kk, m, st.grid, self.kernel, self.stride, self.pad,
                        self.out_cap,
                    )
                )(st.keys, st.mask)
            return DenseTensor(feats=of, occ=oz, grid=out_grid,
                               keys=okeys, mask=omask)
        if isinstance(st, ColumnTensor):
            kyx = (self.kernel[1], self.kernel[2])
            syx = (self.stride[1], self.stride[2])
            pyx = (self.pad[1], self.pad[2])
            in_hw = (st.grid[1], st.grid[2])
            out_hw = (out_grid[1], out_grid[2])
            cdt = jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32

            col_cap = self.out_col_cap or self.out_cap
            if kyx == (1, 1) and syx == (1, 1):
                # BEV-identity down conv (e.g. the (3,1,1)-kernel stage):
                # the active column set is unchanged
                ok, om = st.keys, st.mask
                ndrop = jnp.zeros((st.keys.shape[0],), jnp.int32)
            else:
                ok, om, ndrop = jax.vmap(
                    lambda kk, m: csp.downsample_bev_columns(
                        kk, m, st.grid, kyx, syx, pyx, col_cap, out_hw
                    )
                )(st.keys, st.mask)
            self.sow("diagnostics", "columns_dropped", ndrop.sum(),
                     reduce_fn=lambda a, b: b)
            rb = csp.build_bev_rulebook_batched(
                st.keys, st.mask, in_hw, kyx, syx, pyx,
                out_keys=ok, out_mask=om, out_hw=out_hw,
            )
            of = csp.column_conv_dz(
                st.feats, rb, w, self.kernel, st.grid[0], cin,
                self.stride[0], self.pad[0], compute_dtype=cdt,
            )  # (B, M, D_out*Cout) f32
            oz = csp.column_occupancy_batched(
                st.zmask, rb, self.kernel, self.stride[0], self.pad[0]
            )
            site = oz & om[..., None]
            maskf = csp.expand_site_mask(site, self.features)
            of = MaskedBatchNormFlat(
                channels=self.features, name="MaskedBatchNorm_0"
            )(of, maskf, train)
            of = (nn.relu(of) * maskf).astype(cdt)
            return ColumnTensor(
                feats=of, zmask=oz, keys=ok, mask=om, grid=out_grid,
                c=self.features,
            )

        # NOTE: the dense-grid batched variant (downsample_active_set_batched)
        # measured far slower here — its full-output-grid scatter hits the
        # ~6.4ns/element random-access wall (47M elements at stage 0); the
        # per-sample 27N-candidate sort is ~8ms total for the whole batch.
        rbt = None
        if plan is None:
            _, rb, ok, om, _ = sp.plan_stage_batched(
                st.keys, st.mask, st.grid, self.kernel, self.stride,
                self.pad, self.out_cap
            )
        elif len(plan) == 4:
            rb, rbt, ok, om = plan  # training plan with transpose rulebook
        else:
            rb, ok, om = plan
        cdt = jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32
        if isinstance(rb, tuple):
            of = _zwin_conv(st.feats, rb, w, self.kernel, cdt, self.zwin)
        elif rbt is not None:
            of = sp.make_down_conv_vjp(cdt)(st.feats, rb, rbt, w)
        else:
            of = sp.conv_rulebook_apply(st.feats, rb, w, compute_dtype=cdt)
        of = MaskedBatchNorm()(of, om, train)
        of = jnp.where(om[..., None], nn.relu(of), 0.0)
        return SparseTensor(feats=of, keys=ok, mask=om, grid=out_grid)


def to_bev(st) -> jax.Array:
    """Collapse z: sparse (D, H, W, C) -> dense BEV (B, H, W, C*D).

    Channel flattening is c-major over (C, D) to mirror the reference's
    ``view(N, C*D, H, W)`` on an NCDHW dense tensor (sparse_cnn.py:128-133).
    """
    if isinstance(st, DenseTensor):
        if st.hwdc:
            b, h, w, d, c = st.feats.shape
            occ = jnp.transpose(st.occ, (0, 2, 3, 1))  # -> (B, H, W, D)
            x = jnp.where(occ[..., None], st.feats, 0.0)
            # (D, C) minor -> reference c-major (C, D) channel order
            return jnp.transpose(x, (0, 1, 2, 4, 3)).reshape(b, h, w, c * d)
        b, d, h, w, c = st.feats.shape
        x = jnp.where(st.occ[..., None], st.feats, 0.0)
        return jnp.transpose(x, (0, 2, 3, 4, 1)).reshape(b, h, w, c * d)
    if isinstance(st, ColumnTensor):
        return csp.columns_to_bev_batched(
            st.feats, st.zmask, st.keys, st.mask, st.grid, st.c
        )
    dense = jax.vmap(lambda f, k, m: sp.to_dense(f, k, m, st.grid))(
        st.feats, st.keys, st.mask
    )  # (B, D, H, W, C)
    b, d, h, w, c = dense.shape
    return jnp.transpose(dense, (0, 2, 3, 4, 1)).reshape(b, h, w, c * d)


def to_global(st: SparseTensor, cfg: Config, stride: int):
    """Voxel indices -> metric xyz centers-of-origin (reference
    sparse_cnn.py:91-105: xyz = flip(ijk) * voxel_size * stride + offset).

    Returns (xyz (B, N, 3), feats, mask) — fixed capacity with masks in
    place of the reference's random-subsample dense padding (:107-126).
    """
    vs = jnp.asarray(cfg.voxel_size) * stride
    off = jnp.asarray(cfg.grid_bounds[:3])
    coords = st.coords  # (B, N, 3) ZYX
    xyz = coords[..., ::-1].astype(jnp.float32) * vs + off
    xyz = jnp.where(st.mask[..., None], xyz, 0.0)
    return xyz, st.feats, st.mask


class SpMiddleFHD(nn.Module):
    """Reference channel plan (sparse_cnn.py:151-175): per block,
    2-3 subm convs then a strided conv; 4 -> 16 -> 32 -> 64 -> 64."""

    cfg: Config

    def block_specs(self):
        c = self.cfg
        return [
            # (subm channel list, down-conv spec)
            ([16, 16], dict(features=32, kernel=(3, 3, 3), stride=(2, 2, 2),
                            pad=(1, 1, 1), out_cap=c.stage_voxel_capacity(1),
                            out_col_cap=c.stage_column_capacity(1))),
            ([32, 32], dict(features=64, kernel=(3, 3, 3), stride=(2, 2, 2),
                            pad=(1, 1, 1), out_cap=c.stage_voxel_capacity(2),
                            out_col_cap=c.stage_column_capacity(2))),
            ([64, 64, 64], dict(features=64, kernel=(3, 3, 3), stride=(2, 2, 2),
                                pad=(0, 1, 1), out_cap=c.stage_voxel_capacity(3),
                                out_col_cap=c.stage_column_capacity(3))),
            ([64, 64, 64], dict(features=64, kernel=(3, 1, 1), stride=(2, 1, 1),
                                pad=(0, 0, 0), out_cap=c.stage_voxel_capacity(4),
                                out_col_cap=c.stage_column_capacity(4))),
        ]

    @nn.compact
    def __call__(self, st, train: bool = False, need_scales: bool = True,
                 n_stages: int = None):
        """Returns (multiscale [stride-1, 2, 4, 8 tensors], bev map).

        Works on either representation; with ColumnTensor input the
        multiscale outputs are converted to voxel-sparse form (as needed
        by PV-RCNN's set abstraction) only when ``need_scales``.

        ``n_stages`` (diagnostics only, tools/compile_bisect.py): stop
        after the first n blocks and return (None, scalar summary) so
        compile time can be attributed per stage.
        """
        scales = [st]
        x = st
        dt = self.cfg.compute_dtype
        for si, (subm_channels, down) in enumerate(self.block_specs()):
            if n_stages is not None and si >= n_stages:
                return None, jnp.sum(x.feats.astype(jnp.float32))
            dense_from = (self.cfg.train_dense_from_stage if train
                          else self.cfg.dense_from_stage)
            if si >= dense_from:
                # late stages run as dense masked volumes (see DenseTensor)
                if isinstance(x, SparseTensor):
                    if train:
                        # custom-VJP direct densify (backward = one gather)
                        x = dense_from_sparse(x, keep_keys=need_scales)
                    else:
                        x, cdrop = dense_from_sparse_cols(
                            x, keep_keys=need_scales,
                            ncol_cap=self.cfg.stage_column_capacity(si),
                        )
                        self.sow("diagnostics", f"stage{si}_densify_dropped",
                                 cdrop.sum(), reduce_fn=lambda a, b: b)
                elif isinstance(x, ColumnTensor):
                    x = dense_from_columns(
                        x, keep_keys=need_scales,
                        voxel_cap=self.cfg.stage_voxel_capacity(si),
                    )
            # submanifold layers in a block share the active set, so the
            # neighbor rulebook is built once per block (spconv shares via
            # indice_key, reference sparse_cnn.py:154-172)
            rb = plan = None
            if isinstance(x, SparseTensor):
                # ONE dense-table build and ONE merged query gather per
                # stage, covering the (block-shared, spconv indice_key
                # style) subm rulebook and the down-conv rulebook: a
                # second query gather into the same table in one program
                # measured ~15x slower (see sp.plan_stage_batched).
                if train:
                    # full-tap rulebooks + transpose rulebook: every
                    # backward runs as a rulebook conv (see
                    # sp.plan_stage_train_batched)
                    rb, rbd, rbt, ok, om, ndrop = sp.plan_stage_train_batched(
                        x.keys, x.mask, x.grid, down["kernel"],
                        down["stride"], down["pad"], down["out_cap"],
                        subm_kernel=(3, 3, 3) if subm_channels else None,
                    )
                    plan = (rbd, rbt, ok, om)
                else:
                    rb, rbd, ok, om, ndrop = sp.plan_stage_batched(
                        x.keys, x.mask, x.grid, down["kernel"],
                        down["stride"], down["pad"], down["out_cap"],
                        subm_kernel=(3, 3, 3) if subm_channels else None,
                        # tight per-COLUMN rulebook-cache capacities: the
                        # cache build scales with columns, not sites
                        # (overflow counts into the stageN_dropped sow)
                        subm_col_cap=self.cfg.stage_column_capacity(si),
                        down_col_cap=self.cfg.stage_column_capacity(si + 1),
                    )
                    plan = (rbd, ok, om)
                # capacity-overflow detector: non-zero means the static
                # stage capacity truncated real active sites (the silent
                # bug class that invalidated round-1 numbers). Surfaced
                # via the "diagnostics" collection; bench.py and the train
                # loop read it out with mutable=["diagnostics"].
                self.sow("diagnostics", f"stage{si + 1}_dropped",
                         ndrop.sum(), reduce_fn=lambda a, b: b)
            elif subm_channels and isinstance(x, ColumnTensor):
                rb = csp.build_bev_rulebook_batched(
                    x.keys, x.mask, (x.grid[1], x.grid[2]), (3, 3), (1, 1),
                    (1, 1),
                )
            zw = self.cfg.zwin_backend
            for ch in subm_channels:
                x = SubMConv(features=ch, dtype=dt, zwin=zw)(x, train, rb=rb)
            x = SparseConvDown(dtype=dt, zwin=zw, **down)(x, train, plan=plan)
            scales.append(x)
        bev = to_bev(scales[-1])
        if n_stages is not None:
            return None, jnp.sum(bev.astype(jnp.float32))
        scales = scales[:-1]
        if not need_scales:
            return None, bev
        if isinstance(st, ColumnTensor):
            caps = [self.cfg.stage_voxel_capacity(i) for i in range(len(scales))]
            scales = [
                s.to_voxel_sparse(c) if isinstance(s, ColumnTensor) else s
                for s, c in zip(scales, caps)
            ]
        scales = [
            s.to_voxel_sparse() if isinstance(s, DenseTensor) else s
            for s in scales
        ]
        return scales, bev


class SpMiddleFHDLite(SpMiddleFHD):
    """Strided-conv-only variant (reference sparse_cnn.py:178-186)."""

    def block_specs(self):
        specs = super().block_specs()
        return [([], down) for _, down in specs]


CNN_FACTORY = dict(SpMiddleFHD=SpMiddleFHD, SpMiddleFHDLite=SpMiddleFHDLite)
