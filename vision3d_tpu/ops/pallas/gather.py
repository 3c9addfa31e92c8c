"""Pallas TPU row-gather kernel.

STATUS: see ops/pallas/sparse_conv.py — on v5e both XLA's GatherOp and
Pallas scalar row-copy loops are bounded by the same ~5-7ns/index
dynamic-address rate, so this kernel does not beat jnp.take; Mosaic also
requires 128-lane blocks (C must be padded). Kept as the substrate for a
future vectorized-dynamic-gather variant.

Design: table resident in VMEM, index tiles streamed through SMEM,
rows copied with dynamic sublane slices. Interpret mode keeps CPU tests
exact.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather_kernel(idx_ref, table_ref, out_ref):
    t = out_ref.shape[0]

    def body(j, _):
        i = idx_ref[0, j]
        out_ref[pl.ds(j, 1), :] = table_ref[pl.ds(i, 1), :]
        return 0

    jax.lax.fori_loop(0, t, body, 0, unroll=8)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def gather_rows(table, idx, tile: int = 2048, interpret: bool = False):
    """out[i] = table[idx[i]] — (N, C) table, (Q,) int32 idx -> (Q, C).

    idx must be in [0, N). Q is padded up to a multiple of ``tile``
    internally; callers receive exactly (Q, C).
    """
    q = idx.shape[0]
    n, c = table.shape
    pad = (-q) % tile
    idx_p = jnp.pad(idx, (0, pad)).reshape(-1, tile)
    grid = (idx_p.shape[0],)
    out = pl.pallas_call(
        _gather_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((n, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((q + pad, c), table.dtype),
        interpret=interpret,
    )(idx_p, table)
    return out[:q]
