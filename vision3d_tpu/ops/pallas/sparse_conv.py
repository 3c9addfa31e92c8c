"""Fused Pallas sparse-conv kernel: VMEM-resident gather + MXU GEMM.

STATUS (measured on v5e, see ARCHITECTURE.md perf notes): NOT faster than
XLA — 4.05ms vs 2.79ms per (N=20000, K=27, C=128) layer. Both paths are
limited by the scalar core's dynamic-address issue rate (~5-7ns/index):
this kernel's fori_loop row copies pay the same per-index cost as XLA's
GatherOp, plus loop overhead. Kept as the starting point for a
vectorized-dynamic-gather (tpu.DynamicGatherOp) or tile-sparse redesign;
the production path remains ops/sparse.py's XLA take + GEMM.

Design: feature table in VMEM (padded to 128 lanes), each output tile's
rulebook indices streamed through SMEM, im2col built with VMEM-local row
copies, MXU GEMM in-kernel. Rulebook indices are built once per stage in
XLA (ops/sparse.py lookup).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _kernel(idx_ref, table_ref, w_ref, out_ref, col_scratch):
    t = out_ref.shape[0]          # output tile rows
    k = idx_ref.shape[2] // t     # kernel taps

    def body(j, _):
        base = j * k

        def tap(kk, __):
            i = idx_ref[0, 0, base + kk]
            col_scratch[pl.ds(j, 1), pl.ds(kk * LANES, LANES)] = table_ref[
                pl.ds(i, 1), :
            ]
            return 0

        jax.lax.fori_loop(0, k, tap, 0, unroll=True)
        return 0

    jax.lax.fori_loop(0, t, body, 0)
    out_ref[:, :] = jnp.dot(
        col_scratch[:, :], w_ref[:, :], preferred_element_type=jnp.float32
    )


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def fused_gather_gemm(table, idx, weight, tile: int = 128,
                      interpret: bool = False):
    """out[n] = concat_k(table[idx[n, k]]) @ weight.

    table: (N, C) f32 — row N-1 should be a zero row reserved for missing
      neighbors if callers use it that way (this kernel just reads rows).
    idx: (N_out, K) int32 in [0, N).
    weight: (K*C, Cout) f32.
    Returns (N_out, Cout) f32.
    """
    n, c = table.shape
    n_out, k = idx.shape
    cout = weight.shape[1]
    assert weight.shape[0] == k * c

    # pad lanes to 128 and rows to the sublane multiple
    table_p = jnp.zeros((((n + 7) // 8) * 8, LANES), table.dtype)
    table_p = table_p.at[:n, :c].set(table)
    w_p = jnp.zeros((k * LANES, LANES), weight.dtype)
    w_p = w_p.at[
        (jnp.arange(k * c) // c) * LANES + (jnp.arange(k * c) % c), :cout
    ].set(weight)

    pad_rows = (-n_out) % tile
    # trailing (1, tile*k) dims equal the array dims so the SMEM block
    # passes Mosaic's (8, 128)-divisibility check via the equality branch
    idx_p = jnp.pad(idx, ((0, pad_rows), (0, 0))).reshape(-1, 1, tile * k)

    grid = (idx_p.shape[0],)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, tile * k), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((table_p.shape[0], LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k * LANES, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_out + pad_rows, LANES), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tile, k * LANES), jnp.float32)],
        interpret=interpret,
    )(idx_p, table_p, w_p)
    return out[:n_out, :cout]
