"""Microbenchmarks of the gather/lookup primitives that bound the sparse
CNN on TPU, at exact stage-0..2 shapes (batch 8). Decides the round-2
middle-extractor representation (see ARCHITECTURE.md perf notes).

Run on TPU: python tools/microbench_gather.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from tools.tpu_timing import timeit_scanned

B = 8


def rnd_idx(rng, n_idx, n_rows):
    return jnp.asarray(rng.integers(0, n_rows, (B, n_idx)).astype(np.int32))


def flat_gather(table, idx):
    """(B, R, C) table + (B, Q) idx -> one flat take (the production path)."""
    b, r, c = table.shape
    flat = (idx + jnp.arange(b, dtype=jnp.int32)[:, None] * r).reshape(-1)
    return jnp.take(table.reshape(b * r, c), flat, axis=0)


def main():
    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()[0]}", flush=True)

    # ---- 1. row gathers: index count vs row width ----
    # (rows, row_bytes) covering: voxel path stage0 (27N thin rows),
    # z-blocked (9Nblk fat rows), column path (9Ncol 2.6KB rows)
    cases = [
        ("voxel s0: 27N x C16", 540_000, 20_000, 16, jnp.float32),
        ("voxel s0 bf16", 540_000, 20_000, 16, jnp.bfloat16),
        ("voxel s2: 27N x C64", 270_000, 10_000, 64, jnp.float32),
        ("zblk s0: 9N x 10*C16", 180_000, 25_000, 160, jnp.float32),
        ("zblk s0 bf16", 180_000, 25_000, 160, jnp.bfloat16),
        ("zblk s2: 9N x 13*C64", 90_000, 10_000, 832, jnp.bfloat16),
        ("col s0: 9N x 41*C16", 160_000, 18_000, 656, jnp.float32),
        ("col s0 bf16", 160_000, 18_000, 656, jnp.bfloat16),
    ]
    for name, q, r, c, dt in cases:
        table = jnp.asarray(rng.normal(size=(B, r, c)), dt)
        idx = rnd_idx(rng, q, r)
        t = timeit_scanned(flat_gather, (table, idx), iters=20)
        nbytes = B * q * c * table.dtype.itemsize
        print(
            f"{name:24s} {t*1e3:7.3f} ms  {B*q/1e6:5.1f}M idx "
            f"{t/(B*q)*1e9:5.2f} ns/idx  {nbytes/t/1e9:6.1f} GB/s",
            flush=True,
        )

    # ---- 2. key lookup: sort-based searchsorted vs dense table ----
    from vision3d_tpu.ops.sparse import lookup_keys_batched

    for name, n, q, grid in [
        ("lookup s0 27N sort", 20_000, 540_000, (41, 1600, 1408)),
        ("lookup s0 9N sort", 20_000, 180_000, (41, 1600, 1408)),
        ("lookup s1 27N table", 20_000, 540_000, (21, 800, 704)),
        ("lookup s1 9N table", 20_000, 180_000, (21, 800, 704)),
    ]:
        d, h, w = grid
        keys = jnp.sort(
            jnp.asarray(rng.integers(0, d * h * w, (B, n)).astype(np.int32)),
            axis=1,
        )
        mask = jnp.ones((B, n), bool)
        queries = jnp.asarray(
            rng.integers(0, d * h * w, (B, q)).astype(np.int32)
        )
        t = timeit_scanned(
            lambda k, m, qq: lookup_keys_batched(k, m, qq, grid)[0],
            (keys, mask, queries), iters=10,
        )
        print(f"{name:24s} {t*1e3:7.3f} ms  {t/(B*q)*1e9:5.2f} ns/query",
              flush=True)

    # ---- 3. im2col GEMM at stage-0 shape ----
    for name, rows, k, cout, dt in [
        ("gemm s0 (160k,432)x16", 160_000, 432, 16, jnp.float32),
        ("gemm s0 bf16", 160_000, 432, 16, jnp.bfloat16),
        ("gemm s2 (80k,1728)x64", 80_000, 1728, 64, jnp.bfloat16),
    ]:
        a = jnp.asarray(rng.normal(size=(rows, k)), dt)
        w = jnp.asarray(rng.normal(size=(k, cout)), dt)
        t = timeit_scanned(
            lambda a, w: jnp.dot(a, w, preferred_element_type=jnp.float32),
            (a, w), iters=20,
        )
        fl = 2 * rows * k * cout
        print(f"{name:24s} {t*1e3:7.3f} ms  {fl/t/1e12:5.1f} TFLOP/s", flush=True)

    # ---- 4. sort costs (downsample active-set & method=sort searches) ----
    for name, n in [("sort 540k x8", 540_000), ("sort 180k x8", 180_000)]:
        x = jnp.asarray(rng.integers(0, 1 << 30, (B, n)).astype(np.int32))
        t = timeit_scanned(lambda x: jnp.sort(x, axis=1), (x,), iters=10)
        print(f"{name:24s} {t*1e3:7.3f} ms", flush=True)

    # ---- 5. scatter (to_dense BEV + table builds) ----
    for name, q, cells, c in [
        ("scatter s4 bev 5k x 256", 5_000, 35_200, 256),
        ("table build s1 (94M)", 20_000, 11_700_000, 1),
    ]:
        idx = rnd_idx(rng, q, cells)
        vals = jnp.asarray(rng.normal(size=(B, q, c)), jnp.float32)

        def scat(idx, vals):
            return (
                jnp.zeros((B * cells, c), jnp.float32)
                .at[(idx + jnp.arange(B, dtype=jnp.int32)[:, None] * cells).reshape(-1)]
                .set(vals.reshape(-1, c), mode="drop")
            )

        t = timeit_scanned(scat, (idx, vals), iters=10)
        print(f"{name:24s} {t*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
