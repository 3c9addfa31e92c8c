"""Pallas DMA row-gather: many outstanding HBM row copies per block.

STATUS (round 3, MEASURED NEGATIVE — kept as an engineering record):
per-row DMA issue is SCALAR-CORE-BOUND at ~25ns/row (one SMEM index
load + descriptor setup + start per fori iteration, issue+drain loops),
independent of block size — worse than XLA's per-sample row gather
(~2.8-3ns/row, which is itself at the physical tile-fetch floor: every
row costs ceil(lanes/128) x 2KB of HBM traffic). See ARCHITECTURE.md
"Round-3 measurement campaign". Production gathers therefore stay on
XLA; Pallas is used only for the compute on gathered data
(ops/pallas/zwin_conv.py). This kernel remains the concurrency-correct
DMA-gather reference (block of copies in flight on one semaphore).

Semantics: out[i] = table[idx[i]]. Rows must be in [0, R). The row
payload should be a multiple of 128 lanes for best DMA efficiency — pad
the minor dim on the caller side (a (.., 64)-bf16 table is lane-padded
by XLA anyway, so a 128-wide table costs the same memory).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@partial(jax.jit, static_argnames=("block_rows",))
def dma_gather_rows(table, idx, block_rows: int = 256):
    """table (R, W), idx (M,) int32 -> (M, W). M must divide by block_rows."""
    m = idx.shape[0]
    w = table.shape[1]
    assert m % block_rows == 0, (m, block_rows)

    def kernel(idx_ref, table_ref, out_ref, sem):
        base = pl.program_id(0) * block_rows

        def issue(j, _):
            row = idx_ref[base + j]
            pltpu.make_async_copy(
                table_ref.at[pl.ds(row, 1), :],
                out_ref.at[pl.ds(j, 1), :],
                sem,
            ).start()
            return 0

        jax.lax.fori_loop(0, block_rows, issue, 0)

        def drain(j, _):
            row = idx_ref[base + j]
            pltpu.make_async_copy(
                table_ref.at[pl.ds(row, 1), :],
                out_ref.at[pl.ds(j, 1), :],
                sem,
            ).wait()
            return 0

        jax.lax.fori_loop(0, block_rows, drain, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(m // block_rows,),
        # HBM explicitly: under ANY the compiler promotes small tables to
        # VMEM, where 1-row slices must be 8-sublane aligned (Mosaic
        # error); the DMA engine has no such constraint on HBM sources.
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        out_specs=pl.BlockSpec(
            (block_rows, w), lambda i, idx: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, w), table.dtype),
    )(idx, table)
