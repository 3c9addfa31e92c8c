"""Round-3 gather microbenchmarks: what controls the ~19 ns/row rate?

Probes, at the sparse CNN's exact hot shapes (batch 8):
  1. dense_from_sparse gather (12.4M rows from (64001, 64) bf16 tables):
     flat vs per-sample vs 128-wide table vs sorted-row scatter.
  2. zwin conv gather (4.3M rows from (60001, 96) bf16).
  3. CSR record gather (1.4M/4.3M 16B rows from a 36MB int32 table) vs
     column-packed (14k, 36) int32 tables.
  4. Pallas DMA gather vs the XLA take for each of the above.

Run on TPU: python tools/microbench_r3.py [--only substr]
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

B = 8


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/vision3d_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from tools.tpu_timing import timeit_scanned
    from vision3d_tpu.ops.pallas.dma_gather import dma_gather_rows

    rng = np.random.default_rng(0)
    wanted = [w for w in args.only.split(",") if w]

    def report(name, fn, fargs, n_rows):
        if wanted and not any(w in name for w in wanted):
            return
        try:
            t = timeit_scanned(fn, fargs, iters=args.iters)
        except Exception as e:  # noqa: BLE001 - report and continue
            print(f"{name:40s} FAILED: {type(e).__name__}: {e}", flush=True)
            return
        print(f"{name:40s} {t*1e3:8.2f} ms  {t/n_rows*1e9:6.2f} ns/row",
              flush=True)

    def flat_take(table, idx):
        b, r = table.shape[:2]
        flat = (idx + jnp.arange(b, dtype=jnp.int32)[:, None] * r).reshape(-1)
        return jnp.take(table.reshape((b * r,) + table.shape[2:]), flat, axis=0)

    def per_sample_take(table, idx):
        return jnp.stack(
            [jnp.take(table[i], idx[i], axis=0) for i in range(table.shape[0])]
        )

    # ---- 1. dense_from_sparse shape: 1.55M idx/sample from (64001, C) ----
    q, r = 1_548_800, 64_001
    idx = jnp.asarray(rng.integers(0, r, (B, q)).astype(np.int32))
    for c, dt, tag in [(64, jnp.bfloat16, "c64"), (128, jnp.bfloat16, "c128")]:
        table = jnp.asarray(rng.normal(size=(B, r, c)), dt)
        report(f"densify.flat.{tag}", flat_take, (table, idx), B * q)
        report(f"densify.persample.{tag}", per_sample_take, (table, idx), B * q)
        report(
            f"densify.pallas.{tag}",
            lambda t, i: jax.vmap(dma_gather_rows)(t, i),
            (table, idx), B * q,
        )
    # sorted-row scatter alternative (scatter 64k rows instead of
    # gathering 1.55M): sorted unique indices
    sidx = jnp.asarray(
        np.sort(
            rng.choice(q, size=(B, r - 1), replace=False).astype(np.int32), axis=1
        )
    )
    vals = jnp.asarray(rng.normal(size=(B, r - 1, 64)), jnp.bfloat16)

    def row_scatter(sidx, vals):
        b = sidx.shape[0]
        flat = (sidx + jnp.arange(b, dtype=jnp.int32)[:, None] * q).reshape(-1)
        return (
            jnp.zeros((b * q, 64), jnp.bfloat16)
            .at[flat]
            .set(vals.reshape(-1, 64), mode="drop", indices_are_sorted=True,
                 unique_indices=True)
        )

    report("densify.rowscatter.sorted", row_scatter, (sidx, vals), B * (r - 1))

    # ---- 2. zwin conv gather: 540k idx/sample from (60001, 96) bf16 ----
    q2, r2 = 540_000, 60_001
    idx2 = jnp.asarray(rng.integers(0, r2, (B, q2)).astype(np.int32))
    for c, tag in [(96, "c96"), (128, "c128")]:
        t2 = jnp.asarray(rng.normal(size=(B, r2, c)), jnp.bfloat16)
        report(f"zwin.flat.{tag}", flat_take, (t2, idx2), B * q2)
        report(f"zwin.persample.{tag}", per_sample_take, (t2, idx2), B * q2)
        report(
            f"zwin.pallas.{tag}",
            lambda t, i: jax.vmap(dma_gather_rows)(t, i),
            (t2, idx2), B * q2,
        )

    # ---- 3. CSR record gather: (2.25M, 4) int32 vs column-packed ----
    hw = 2_252_801
    rec = jnp.asarray(rng.integers(0, 1 << 20, (B, hw, 4)).astype(np.int32))
    q3 = 180_000
    idx3 = jnp.asarray(rng.integers(0, hw, (B, q3 * 9)).astype(np.int32))
    report("rec.persample.9xsites", per_sample_take, (rec, idx3), B * q3 * 9)

    ncol = 16_384
    colrb = jnp.asarray(rng.integers(0, 1 << 20, (B, ncol, 36)).astype(np.int32))
    idxc = jnp.asarray(rng.integers(0, ncol, (B, 20_000)).astype(np.int32))
    report("colrb.flat.36", flat_take, (colrb, idxc), B * 20_000)
    idxc9 = jnp.asarray(rng.integers(0, ncol, (B, ncol * 9)).astype(np.int32))
    report("colrb.build.9xcols", flat_take, (rec, idxc9), B * ncol * 9)

    # ---- 4. int32 element gather 1-D (unpadded) ----
    flat1d = jnp.asarray(rng.integers(0, 1 << 20, (B, hw)).astype(np.int32))
    report("rec1d.element.9xsites", flat_take, (flat1d[..., None], idx3),
           B * q3 * 9)


if __name__ == "__main__":
    main()
