"""Pallas TPU row-gather kernel.

XLA's GatherOp runs on the TPU scalar core (~1 element/cycle), which makes
the sparse-conv im2col gather (540k rows x C per layer at full KITTI
scale) the dominant cost of the whole detector. This kernel keeps the
gather table resident in VMEM, DMAs each tile of indices into SMEM, and
copies rows with dynamic sublane slices — turning an HBM-scalar-core
bottleneck into a VMEM-local loop.

Used by vision3d_tpu/ops/sparse.py when enabled; falls back to jnp.take
off-TPU (interpret mode keeps CPU tests exact).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather_kernel(idx_ref, table_ref, out_ref, scratch_idx, sem):
    t = out_ref.shape[0]
    # DMA this tile's indices from (VMEM) into SMEM for scalar addressing
    cp = pltpu.make_async_copy(idx_ref, scratch_idx, sem)
    cp.start()
    cp.wait()

    def body(j, _):
        i = scratch_idx[j]
        out_ref[pl.ds(j, 1), :] = table_ref[pl.ds(i, 1), :]
        return 0

    jax.lax.fori_loop(0, t, body, 0)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def gather_rows(table, idx, tile: int = 1024, interpret: bool = False):
    """out[i] = table[idx[i]] — (N, C) table, (Q,) int32 idx -> (Q, C).

    idx must be in [0, N). Q must be a multiple of ``tile`` (callers pad).
    """
    q = idx.shape[0]
    n, c = table.shape
    assert q % tile == 0, (q, tile)
    grid = (q // tile,)
    return pl.pallas_call(
        _gather_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.ANY),
            pl.BlockSpec((n, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((q, c), table.dtype),
        scratch_shapes=[
            pltpu.SMEM((tile,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(idx, table)
