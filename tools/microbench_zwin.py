"""Microbench: z-window conv variants at bench geometry (TPU).

Compares, per stage-0/1 shape, the XLA align path (sp.conv_zwin_apply)
against the Pallas kernels (v1 per-(dz,j) mask-slice kernel, v2
zero-relayout shift-folded-weight kernel) on identical rulebooks.

Usage: python tools/microbench_zwin.py [--batch 8]
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--blocks", default="256,512,1024")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/vision3d_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from tools.tpu_timing import timeit_scanned
    from vision3d_tpu.ops import sparse as sp
    from vision3d_tpu.ops.pallas.zwin_conv import (
        conv_zwin_apply_pallas,
        conv_zwin_apply_pallas2,
        conv_zwin_apply_pallas3,
    )

    rng = np.random.default_rng(0)
    b = args.batch

    # (name, N_in, M_out, Cin, Cout) at bench capacities
    shapes = [
        ("s0.subm  c16", 20000, 20000, 16, 16),
        ("s0.down  c16->32", 20000, 60000, 16, 32),
        ("s1.subm  c32", 60000, 60000, 32, 32),
        ("s1.down  c32->64", 60000, 64000, 32, 64),
    ]
    for name, n, m, c, cout in shapes:
        feats = jnp.asarray(
            rng.normal(size=(b, n, c)).astype(np.float32), jnp.bfloat16
        )
        start = jnp.asarray(
            rng.integers(0, n + 1, (b, m * 9)).astype(np.int32)
        )
        pattern = jnp.where(
            start == n, 0,
            jnp.asarray(rng.integers(1, 8, (b, m * 9)).astype(np.int32)),
        )
        w = jnp.asarray(
            rng.normal(size=(27 * c, cout)).astype(np.float32)
        )

        dt = timeit_scanned(
            lambda f, s, p, ww: sp.conv_zwin_apply(
                f, s, p, ww, (3, 3, 3), compute_dtype=jnp.bfloat16
            ),
            (feats, start, pattern, w), iters=args.iters,
        )
        print(f"{name:22s} xla        {dt*1e3:8.2f} ms", flush=True)

        dt = timeit_scanned(
            lambda f, s, p, ww: conv_zwin_apply_pallas(
                f, s, p, ww, (3, 3, 3)
            ),
            (feats, start, pattern, w), iters=args.iters,
        )
        print(f"{name:22s} pallas-v1  {dt*1e3:8.2f} ms", flush=True)

        for blk in [int(x) for x in args.blocks.split(",")]:
            dt = timeit_scanned(
                lambda f, s, p, ww, blk=blk: conv_zwin_apply_pallas2(
                    f, s, p, ww, (3, 3, 3), block_sites=blk
                ),
                (feats, start, pattern, w), iters=args.iters,
            )
            print(f"{name:22s} pallas-v2/{blk:<5d} {dt*1e3:6.2f} ms",
                  flush=True)
            dt = timeit_scanned(
                lambda f, s, p, ww, blk=blk: conv_zwin_apply_pallas3(
                    f, s, p, ww, (3, 3, 3), block_sites=blk
                ),
                (feats, start, pattern, w), iters=args.iters,
            )
            print(f"{name:22s} pallas-v3/{blk:<5d} {dt*1e3:6.2f} ms",
                  flush=True)


if __name__ == "__main__":
    main()
