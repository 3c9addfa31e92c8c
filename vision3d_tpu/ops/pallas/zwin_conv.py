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
