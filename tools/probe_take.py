"""Measure the exact indexed-op rates behind the plan costs: element
takes from per-sample slot maps, record-row takes from compact t4c
tables (flat vs forced per-sample), and cached-row takes at cache sizes.

Prints ns/op for each — these rates times op counts should reproduce the
zwin_rulebook_* timings, isolating which gather runs on the slow path.
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/vision3d_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from tools.tpu_timing import timeit_scanned

    rng = np.random.default_rng(0)
    B = 8

    def report(name, fn, fargs, nops):
        dt = timeit_scanned(fn, fargs, iters=args.iters)
        print(f"{name:44s} {dt*1e3:8.2f} ms  {dt/nops*1e9:6.2f} ns/op",
              flush=True)

    def per_sample_take(table, idx):
        return jnp.stack([jnp.take(table[i], idx[i], axis=0)
                          for i in range(table.shape[0])], axis=0)

    # element takes from per-sample slot maps (s0: 2.25M cells, s1: 563k)
    for name, cells, q in [("slotmap s0 (4.5MB/sample int16)", 2254401, 270009),
                           ("slotmap s1 (1.1MB/sample int16)", 563202, 270009)]:
        tab = jnp.asarray(rng.integers(-1, 30000, (B, cells)), jnp.int16)
        idx = jnp.asarray(rng.integers(0, cells, (B, q)), jnp.int32)
        report(f"elem {name}", per_sample_take, (tab, idx), B * q)

    # record-row takes from t4c (flat global vs per-sample unrolled)
    for name, nc, q in [("t4c s0 (20001 rows)", 20001, 270009),
                        ("t4c s1 (60001 rows)", 60001, 270009),
                        ("t4c s1 dense-q", 60001, 576000)]:
        tab = jnp.asarray(rng.integers(0, 1 << 15, (B, nc, 4)), jnp.int32)
        idx = jnp.asarray(rng.integers(0, nc, (B, q)), jnp.int32)

        def flat_take(tab, idx, nc=nc):
            fl = (idx + jnp.arange(B, dtype=jnp.int32)[:, None] * nc).reshape(-1)
            return jnp.take(tab.reshape(B * nc, 4), fl, axis=0)

        report(f"row4 flat {name}", flat_take, (tab, idx), B * q)
        report(f"row4 psamp {name}", per_sample_take, (tab, idx), B * q)

    # cached-row takes (crow): (B, NC+1, 36) int32 at down-cache size
    for name, nc, q in [("cache36 nc=30001", 30001, 64000),
                        ("cache36 nc=18001", 18001, 60000)]:
        tab = jnp.asarray(rng.integers(0, 1 << 15, (B, nc, 36)), jnp.int32)
        idx = jnp.asarray(rng.integers(0, nc, (B, q)), jnp.int32)
        report(f"row36 psamp {name}", per_sample_take, (tab, idx), B * q)

    # zwin feature gathers: (B, N+1, kz*C) bf16 at s1 subm geometry
    for name, n, w, q in [("zwin s1 (60001 x 96 bf16)", 60001, 96, 540000),
                          ("zwin s0 (20001 x 48 bf16)", 20001, 48, 180000)]:
        tab = jnp.asarray(rng.normal(size=(B, n, w)), jnp.bfloat16)
        idx = jnp.asarray(rng.integers(0, n, (B, q)), jnp.int32)
        report(f"rowF psamp {name}", per_sample_take, (tab, idx), B * q)


if __name__ == "__main__":
    main()
