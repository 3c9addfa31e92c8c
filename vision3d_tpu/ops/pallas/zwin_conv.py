"""Pallas z-window align+GEMM: the compute half of the sparse conv.

Division of labor (measured round 3, v5e): XLA's row gather is already at
the physical floor (every gathered row costs ceil(lanes/128) 2KB tiles of
HBM traffic; per-sample gathers run ~3ns/row), while Pallas per-row DMAs
are scalar-issue-bound at ~25ns/row — so the GATHER stays XLA. What XLA
cannot do is consume the gathered rows without re-materializing every
align/mask pass to HBM (dot operands and elementwise results always
materialize; the XLA align in ops/sparse.conv_zwin_apply costs ~3x the
gather). This kernel is that consumer: a standard blocked pipeline (no
manual DMA) that, per (batch, site-block), applies the z-window
tap-alignment masks in VMEM and runs one GEMM per BEV offset on the MXU.

Contract matches ops/sparse.conv_zwin_apply: inputs are the z-window
rulebook's gathered rows and tap masks; candidate j of a window maps to
kernel tap dz iff bit dz of the site's pattern is set and j prior
candidates are active (mask m(dz, j) = bit_dz & (popcount(bits<dz) == j)).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vision3d_tpu.ops import sparse as sp


def _pairs(kz):
    return [(dz, j) for dz in range(kz) for j in range(dz + 1)]


def _kernel(g_ref, m_ref, w_ref, out_ref, *, k2, kz, c, cout, blk):
    # build the full (BLK, K2*kz*C) im2col block in VMEM, then ONE GEMM —
    # 9 per-offset GEMMs measured ~14us/block of pipeline-fill overhead
    pairs = _pairs(kz)
    cols = []
    for j2 in range(k2):
        g = g_ref[0, j2]                      # (BLK, kz*C)
        for dz in range(kz):
            t = jnp.zeros((blk, c), jnp.float32)
            for j in range(dz + 1):
                m = m_ref[0, j2, :, pairs.index((dz, j)):
                          pairs.index((dz, j)) + 1]   # (BLK, 1)
                t = t + g[:, j * c:(j + 1) * c].astype(jnp.float32) * m
            cols.append(t)
    x = jnp.concatenate(cols, axis=1).astype(jnp.bfloat16)
    out_ref[0] = jnp.dot(x, w_ref[...],
                         preferred_element_type=jnp.float32)


@partial(jax.jit, static_argnames=("kernel", "block_sites"))
def zwin_conv_gemm(g_km, masks, weight, kernel, block_sites=256):
    """g_km (B, K2, M, kz*C) gathered windows (k2-major, zeros at misses);
    masks (B, K2, M, P) f32/bf16 tap masks, P = kz*(kz+1)/2 in (dz, j)
    order; weight (K*Cin, Cout) shared layout. -> (B, M, Cout) f32."""
    b, k2, m, kzc = g_km.shape
    kz = kernel[0]
    c = kzc // kz
    cout = weight.shape[1]
    blk = block_sites
    m_pad = -(-m // blk) * blk
    if m_pad != m:
        padw = [(0, 0), (0, 0), (0, m_pad - m), (0, 0)]
        g_km = jnp.pad(g_km, padw)
        masks = jnp.pad(masks, padw)

    # (K2*kz*C, Cout): weight rows regrouped (k2, dz, c)-major to match
    # the kernel's im2col column order
    w3 = weight.reshape(kz, k2, c, cout).transpose(1, 0, 2, 3)
    w3 = w3.reshape(k2 * kz * c, cout).astype(jnp.bfloat16)

    p = masks.shape[-1]
    out = pl.pallas_call(
        partial(_kernel, k2=k2, kz=kz, c=c, cout=cout, blk=blk),
        grid=(b, m_pad // blk),
        in_specs=[
            pl.BlockSpec((1, k2, blk, kzc), lambda bb, i: (bb, 0, i, 0)),
            pl.BlockSpec((1, k2, blk, p), lambda bb, i: (bb, 0, i, 0)),
            pl.BlockSpec((k2 * kz * c, cout), lambda bb, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, blk, cout), lambda bb, i: (bb, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, m_pad, cout), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=jax.default_backend() != "tpu",  # CPU tests
    )(g_km, masks, w3)
    return out[:, :m]


def _kernel_v2(x_ref, m_ref, e_ref, w_ref, o_ref, *, kz):
    # zero-relayout block body: every op is either a full-width VPU
    # multiply or an MXU matmul on the block's native (sublane, lane)
    # layout. The (blk, P) @ (P, D) mask expansion replaces per-(dz, j)
    # lane slices (c = 16..64 offsets are 128-misaligned and forced
    # Mosaic relayouts in the v1 kernel — measured slower than XLA).
    x = x_ref[0]  # (blk, D)
    acc = None
    for s in range(kz):
        # Mosaic requires 32-bit matmul accumulators; the 0/1 mask values
        # are exact in bf16 after the downcast
        mf = jax.lax.dot(m_ref[s, 0], e_ref[...],
                         preferred_element_type=jnp.float32)  # (blk, D)
        t = jax.lax.dot(x * mf.astype(x.dtype), w_ref[s],
                        preferred_element_type=jnp.float32)
        acc = t if acc is None else acc + t
    o_ref[0] = acc


@partial(jax.jit, static_argnames=("kernel", "block_sites"))
def zwin_conv_gemm_v2(x, msk, weight, kernel, block_sites=512):
    """x (B, M, K2*kz*C) gathered candidate rows (m-major im2col, zeros at
    misses); msk (kz, B, M, K2*kz) 0/1 shift masks in (j2, j) column
    order; weight the shared (K*Cin, Cout) layout. -> (B, M, Cout) f32.

    out = sum_s (x * expand(msk[s])) @ Wshift[s], where Wshift[s] routes
    candidate j of each window to kernel tap dz = j + s (the z-shift is
    folded into the weights, so alignment never moves data — only masks).
    """
    b, m, dd = x.shape
    kz, ky, kx = kernel
    k2 = ky * kx
    c = dd // (k2 * kz)
    cout = weight.shape[1]
    cdt = x.dtype
    p = k2 * kz

    # shift-folded weights: Wshift[s][(j2, j, i), :] = W[j+s, j2, i, :]
    wk = weight.reshape(kz, k2, c, cout)
    zero = jnp.zeros((c, cout), weight.dtype)
    wshift = jnp.stack(
        [
            jnp.concatenate(
                [wk[j + s, j2] if j + s < kz else zero
                 for j2 in range(k2) for j in range(kz)], axis=0
            )
            for s in range(kz)
        ],
        axis=0,
    ).astype(cdt)  # (kz, D, Cout)

    expand = jnp.asarray(
        np.kron(np.eye(p, dtype=np.float32), np.ones((1, c), np.float32)),
        cdt,
    )  # (P, D) static 0/1

    blk = block_sites
    m_pad = -(-m // blk) * blk
    if m_pad != m:
        x = jnp.pad(x, ((0, 0), (0, m_pad - m), (0, 0)))
        msk = jnp.pad(msk, ((0, 0), (0, 0), (0, m_pad - m), (0, 0)))

    out = pl.pallas_call(
        partial(_kernel_v2, kz=kz),
        grid=(b, m_pad // blk),
        in_specs=[
            pl.BlockSpec((1, blk, dd), lambda bb, i: (bb, i, 0)),
            pl.BlockSpec((kz, 1, blk, p), lambda bb, i: (0, bb, i, 0)),
            pl.BlockSpec((p, dd), lambda bb, i: (0, 0)),
            pl.BlockSpec((kz, dd, cout), lambda bb, i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, blk, cout), lambda bb, i: (bb, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, m_pad, cout), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=jax.default_backend() != "tpu",  # CPU tests
    )(x, msk, expand, wshift)
    return out[:, :m]


def conv_zwin_apply_pallas2(feats, start, pattern, weight, kernel,
                            compute_dtype=jnp.bfloat16, block_sites=512):
    """Drop-in replacement for sp.conv_zwin_apply: XLA gather (at its
    physical floor) + zero-relayout Pallas align/GEMM (v2).

    Same contract as conv_zwin_apply (ops/sparse.py): feats (B, N, C),
    (start, pattern) from csr_zwin_rulebook/zwin_rulebook_compact in
    m-major (site, BEV-offset) order, shared (K*Cin, Cout) weights.
    """
    b, n, c = feats.shape
    kz, ky, kx = kernel
    k2 = ky * kx
    q = start.shape[1]
    m = q // k2
    fz = jnp.concatenate(
        [feats, jnp.zeros((b, kz, c), feats.dtype)], axis=1
    ).astype(compute_dtype)
    zwin = jnp.concatenate(
        [fz[:, dz: n + 1 + dz] for dz in range(kz)], axis=-1
    )  # (B, N+1, kz*C)
    g = sp._take_maybe_per_sample(zwin, start)  # (B, Q, kz*C) m-major
    x = g.reshape(b, m, k2 * kz * c)

    pat = pattern.reshape(b, m, k2)
    bits = [(pat >> dz) & 1 for dz in range(kz)]
    jof = [sum(bits[:dz]) if dz else 0 for dz in range(kz)]
    msks = []
    for s in range(kz):
        cols = []  # (j2-major, j-minor) to match x's column order
        for j in range(kz):
            dz = j + s
            cols.append(
                (bits[dz] > 0) & (jof[dz] == j) if dz < kz
                else jnp.zeros_like(pat, dtype=bool)
            )
        msks.append(jnp.stack(cols, axis=-1).reshape(b, m, k2 * kz))
    msk = jnp.stack(msks, axis=0).astype(compute_dtype)  # (kz, B, M, P)
    return zwin_conv_gemm_v2(x, msk, weight, kernel, block_sites=block_sites)


def _kernel_v3(x_ref, m_ref, e_ref, w_ref, o_ref, *, kz, k2, kzc, cp):
    # v2 math on the gather-native k2-major layout: per-offset blocks are
    # LEADING-dim slices (free), each zero-padded to a 128-lane boundary
    # so the concat and every mask/GEMM stays tile-aligned. Avoids the
    # XLA-side (B, Q, kzc) -> (B, M, K2*kzc) physical relayout v2 pays.
    xcat = jnp.concatenate(
        [
            jnp.pad(x_ref[0, j2], ((0, 0), (0, cp - kzc)))
            for j2 in range(k2)
        ],
        axis=1,
    )  # (blk, k2*cp)
    acc = None
    for s in range(kz):
        mf = jax.lax.dot(m_ref[s, 0], e_ref[...],
                         preferred_element_type=jnp.float32)
        t = jax.lax.dot(xcat * mf.astype(xcat.dtype), w_ref[s],
                        preferred_element_type=jnp.float32)
        acc = t if acc is None else acc + t
    o_ref[0] = acc


@partial(jax.jit, static_argnames=("kernel", "block_sites"))
def zwin_conv_gemm_v3(g_km, msk, weight, kernel, block_sites=512):
    """g_km (B, K2, M, kz*C) gathered windows in gather-native k2-major
    layout (a free view of the (B, K2*M, kz*C) gather output); msk
    (kz, B, M, K2*kz) shift masks as in v2. -> (B, M, Cout) f32."""
    b, k2, m, kzc = g_km.shape
    kz = kernel[0]
    c = kzc // kz
    cout = weight.shape[1]
    cdt = g_km.dtype
    p = k2 * kz
    cp = -(-kzc // 128) * 128  # per-offset lane block, 128-aligned

    wk = weight.reshape(kz, k2, c, cout)
    pad_rows = jnp.zeros((cp - kzc, cout), weight.dtype)
    wshift = jnp.stack(
        [
            jnp.concatenate(
                [
                    jnp.concatenate(
                        [wk[j + s, j2] if j + s < kz
                         else jnp.zeros((c, cout), weight.dtype)
                         for j in range(kz)] + [pad_rows],
                        axis=0,
                    )
                    for j2 in range(k2)
                ],
                axis=0,
            )
            for s in range(kz)
        ],
        axis=0,
    ).astype(cdt)  # (kz, k2*cp, Cout)

    exp_np = np.zeros((p, k2 * cp), np.float32)
    for j2 in range(k2):
        for j in range(kz):
            exp_np[j2 * kz + j, j2 * cp + j * c: j2 * cp + (j + 1) * c] = 1.0
    expand = jnp.asarray(exp_np, cdt)

    blk = block_sites
    m_pad = -(-m // blk) * blk
    if m_pad != m:
        g_km = jnp.pad(g_km, ((0, 0), (0, 0), (0, m_pad - m), (0, 0)))
        msk = jnp.pad(msk, ((0, 0), (0, 0), (0, m_pad - m), (0, 0)))

    out = pl.pallas_call(
        partial(_kernel_v3, kz=kz, k2=k2, kzc=kzc, cp=cp),
        grid=(b, m_pad // blk),
        in_specs=[
            pl.BlockSpec((1, k2, blk, kzc), lambda bb, i: (bb, 0, i, 0)),
            pl.BlockSpec((kz, 1, blk, p), lambda bb, i: (0, bb, i, 0)),
            pl.BlockSpec((p, k2 * cp), lambda bb, i: (0, 0)),
            pl.BlockSpec((kz, k2 * cp, cout), lambda bb, i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, blk, cout), lambda bb, i: (bb, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, m_pad, cout), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=jax.default_backend() != "tpu",
    )(g_km, msk, expand, wshift)
    return out[:, :m]


def conv_zwin_apply_pallas3(feats, start, pattern, weight, kernel,
                            compute_dtype=jnp.bfloat16, block_sites=512):
    """v3: XLA gather in k2-major order (its natural output shape is the
    kernel's input — no relayout), Pallas align/GEMM with in-kernel
    128-aligned offset blocks.

    STATUS: measured negative — NOT the production kernel. On REAL
    production rulebooks (tools/profile_plan.py, v5e batch 8, round 5)
    v3 loses to v2 at every stage: s0 subm c16 8.31 vs 7.74ms, s0 subm
    c4 8.29 vs 5.29, s0 down 27.68 vs 25.19, s1 subm 32.67 vs 31.03,
    s1 down 29.41 vs 29.28. The hoped-for k2-major gather locality does
    not pay even on sorted plans. Kept as an equality-tested record."""
    b, n, c = feats.shape
    kz, ky, kx = kernel
    k2 = ky * kx
    q = start.shape[1]
    m = q // k2
    fz = jnp.concatenate(
        [feats, jnp.zeros((b, kz, c), feats.dtype)], axis=1
    ).astype(compute_dtype)
    zwin = jnp.concatenate(
        [fz[:, dz: n + 1 + dz] for dz in range(kz)], axis=-1
    )
    start_km = jnp.transpose(start.reshape(b, m, k2), (0, 2, 1))
    g = sp._take_maybe_per_sample(zwin, start_km.reshape(b, k2 * m))
    g_km = g.reshape(b, k2, m, kz * c)  # free view (leading-dim split)

    pat = pattern.reshape(b, m, k2)
    bits = [(pat >> dz) & 1 for dz in range(kz)]
    jof = [sum(bits[:dz]) if dz else 0 for dz in range(kz)]
    msks = []
    for s in range(kz):
        cols = []
        for j in range(kz):
            dz = j + s
            cols.append(
                (bits[dz] > 0) & (jof[dz] == j) if dz < kz
                else jnp.zeros_like(pat, dtype=bool)
            )
        msks.append(jnp.stack(cols, axis=-1).reshape(b, m, k2 * kz))
    msk = jnp.stack(msks, axis=0).astype(compute_dtype)
    return zwin_conv_gemm_v3(g_km, msk, weight, kernel,
                             block_sites=block_sites)


def conv_zwin_apply_pallas(feats, start, pattern, weight, kernel,
                           compute_dtype=jnp.bfloat16):
    """Drop-in replacement for sp.conv_zwin_apply on TPU: XLA gather (at
    its physical floor) + Pallas align/GEMM (no materialized align)."""
    b, n, c = feats.shape
    kz = kernel[0]
    k2 = kernel[1] * kernel[2]
    q = start.shape[1]
    m = q // k2
    fz = jnp.concatenate(
        [feats, jnp.zeros((b, kz, c), feats.dtype)], axis=1
    ).astype(compute_dtype)
    zwin = jnp.concatenate(
        [fz[:, dz: n + 1 + dz] for dz in range(kz)], axis=-1
    )  # (B, N+1, kz*C)
    start_km = jnp.transpose(start.reshape(b, m, k2), (0, 2, 1))
    g = sp._take_maybe_per_sample(zwin, start_km.reshape(b, k2 * m))
    g_km = g.reshape(b, k2, m, kz * c)

    pat = jnp.transpose(pattern.reshape(b, m, k2), (0, 2, 1))  # (B, K2, M)
    bits = [(pat >> dz) & 1 for dz in range(kz)]
    jof = [sum(bits[:dz]) if dz else 0 for dz in range(kz)]
    masks = jnp.stack(
        [
            ((bits[dz] > 0) & (jof[dz] == j)) for dz, j in _pairs(kz)
        ],
        axis=-1,
    ).astype(compute_dtype)  # (B, K2, M, P)
    return zwin_conv_gemm(g_km, masks, weight, kernel)


# The kernel Config.zwin_backend="auto"/"pallas" dispatches to (see
# models/sparse_cnn._zwin_conv). v2 and v3 are numerically equivalent;
# the winner is chosen by tools/microbench_zwin.py on the target chip.
PRODUCTION_ZWIN = conv_zwin_apply_pallas2
