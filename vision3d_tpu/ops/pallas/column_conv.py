"""Pallas column-sparse conv: tile-aligned DMA gather + in-VMEM im2col.

STATUS: measured negative — NOT in the production path. The per-row DMA
issue rate is scalar-bound at ~25ns/row on v5e (ARCHITECTURE.md round-3
notes), worse than XLA's ~3ns/row small-row gather for every relevant
row count; the production conv path is the XLA gather + Pallas z-window
align/GEMM (ops/pallas/zwin_conv.py). Kept as the honest record of the
measurement (tools/microbench_gather.py drives it).

Why this kernel was tried (measured round 3, v5e): TPU stores every 2-D
array in (8, 128) tiles, so ANY single-row XLA gather fetches a full 2KB
tile — payload efficiency is W_bytes/2KB and the row gather is already
at physical HBM bandwidth. And XLA materializes every dot operand, so
im2col-style formulations pay the assembled operand to HBM and back.
Both limits fall away when (a) the gather table stores one BEV COLUMN
(z-dense (D, C) flattened + zero-padded to exactly 1024 lanes) per
(8, 128) TILE — a (R, 8, 128) memref slices tile-aligned at any dynamic
row, so each DMA moves 2KB at 100%% payload — and (b) the z-window
im2col + per-output-z GEMMs run on the gathered block while it sits in
VMEM, never materializing to HBM.

Per grid step (one batch sample x one block of BLK output columns):
issue K2*BLK row-tile DMAs (the 3x3 BEV neighborhood per output column,
rulebook-routed, misses -> the zero row), wait once, then for every
output z: slice the kz*C window from each of the 9 neighbor blocks,
concatenate to the (BLK, K2*kz*C) im2col operand, and one MXU GEMM
against the shared (K*Cin, Cout) weight. FLOPs are the exact 27-tap
count; HBM traffic is K2 x the active column bytes (no halo reuse yet).

Semantics match ops/column_sparse.column_conv_batched exactly (same
rulebook, weight layout, stride_z/pad_z) — tested against it.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 1024  # one (8, 128) bf16... tile-group: 8 sublanes x 128 lanes


def _kernel(rb_ref, table_ref, w_ref, out_ref, gbuf, sem, *, n_rows,
            k2, blk, kz, c, d_out, stride_z, cout):
    b = pl.program_id(0)
    row_base = b * n_rows

    def issue(j, _):
        row = row_base + rb_ref[0, 0, j // blk, j % blk]
        pltpu.make_async_copy(
            table_ref.at[pl.ds(row, 1)], gbuf.at[pl.ds(j, 1)], sem
        ).start()
        return 0

    jax.lax.fori_loop(0, k2 * blk, issue, 0)

    def drain(j, _):
        row = row_base + rb_ref[0, 0, j // blk, j % blk]
        pltpu.make_async_copy(
            table_ref.at[pl.ds(row, 1)], gbuf.at[pl.ds(j, 1)], sem
        ).wait()
        return 0

    jax.lax.fori_loop(0, k2 * blk, drain, 0)

    # (K2*BLK, 8, 128) -> per-k2 (BLK, 1024) flat views, then z-window
    # lane slices + one GEMM per output z, all VMEM-resident
    flats = [
        gbuf[j * blk:(j + 1) * blk].reshape(blk, LANES) for j in range(k2)
    ]
    w = w_ref[...]
    for zo in range(d_out):
        z0c = zo * stride_z * c
        xz = jnp.concatenate(
            [f[:, z0c: z0c + kz * c] for f in flats], axis=1
        )  # (BLK, K2*kz*C)
        out_ref[0, :, zo * cout:(zo + 1) * cout] = jnp.dot(
            xz, w, preferred_element_type=jnp.float32
        )


@partial(jax.jit, static_argnames=("kernel", "d", "c", "stride_z", "pad_z",
                                   "block_cols"))
def column_conv_pallas(col_feats, rb_idx, weight, kernel, d, c, stride_z=1,
                       pad_z=0, block_cols=256):
    """col_feats (B, N, D*C) bf16 flat rows; rb_idx (B, M*K2) int32 with
    misses at N (column_sparse rulebook contract, K2 minor); weight
    (K*Cin, Cout). Returns (B, M, D_out*Cout) f32."""
    b, n, _ = col_feats.shape
    kz, ky, kx = kernel
    k2 = ky * kx
    m = rb_idx.shape[1] // k2
    cout = weight.shape[1]
    d_out = (d + 2 * pad_z - kz) // stride_z + 1
    dp = d + 2 * pad_z
    assert dp * c <= LANES, (dp, c)

    ct = col_feats.astype(jnp.bfloat16)
    if pad_z:
        zc = jnp.zeros((b, n, pad_z * c), jnp.bfloat16)
        ct = jnp.concatenate([zc, ct, zc], axis=-1)
    pad_lanes = LANES - dp * c
    if pad_lanes:
        ct = jnp.concatenate(
            [ct, jnp.zeros((b, n, pad_lanes), jnp.bfloat16)], axis=-1
        )
    table = jnp.concatenate(
        [ct, jnp.zeros((b, 1, LANES), jnp.bfloat16)], axis=1
    ).reshape(b * (n + 1), 8, 128)

    blk = block_cols
    m_pad = -(-m // blk) * blk
    nblk = m_pad // blk
    rb = rb_idx.reshape(b, m, k2)
    if m_pad != m:
        rb = jnp.concatenate(
            [rb, jnp.full((b, m_pad - m, k2), n, jnp.int32)], axis=1
        )
    # per-block SMEM layout: (B, nblk, K2, BLK) — the last two dims must
    # equal the full array dims (Pallas SMEM block constraint), and
    # whole-array scalar prefetch would need B*K2*M*4 bytes of SMEM
    # (4.6MB at stage 0 vs the 1MB SMEM)
    rb_blocks = jnp.transpose(rb.reshape(b, nblk, blk, k2), (0, 1, 3, 2))

    wperm = weight.reshape(kz, k2, c, cout).transpose(1, 0, 2, 3)
    wperm = wperm.reshape(k2 * kz * c, cout).astype(jnp.bfloat16)

    out = pl.pallas_call(
        partial(_kernel, n_rows=n + 1, k2=k2, blk=blk, kz=kz, c=c,
                d_out=d_out, stride_z=stride_z, cout=cout),
        grid=(b, nblk),
        in_specs=[
            pl.BlockSpec((1, 1, k2, blk), lambda bb, i: (bb, i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec((k2 * kz * c, cout), lambda bb, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, blk, d_out * cout), lambda bb, i: (bb, i, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((k2 * blk, 8, 128), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
        out_shape=jax.ShapeDtypeStruct((b, m_pad, d_out * cout),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=jax.default_backend() != "tpu",  # CPU tests
    )(rb_blocks, table, wperm)
    return out[:, :m]
