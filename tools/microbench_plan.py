"""Microbench: plan_stage_batched internals at stage-0/1 bench geometry.

Times downsample_active_set, build_col_compact, zwin_rulebook_compact
(subm and down) separately to locate the plan cost.
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--points", type=int, default=18000)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/vision3d_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from tools.profile_stages import bench_clouds
    from tools.tpu_timing import timeit_scanned
    from vision3d_tpu.config import Config
    from vision3d_tpu.core.voxelize import voxelize_batch
    from vision3d_tpu.models.second import build_middle_input
    from vision3d_tpu.ops import sparse as sp

    cfg = Config().replace(num_classes=1, compute_dtype="bfloat16")
    cfg = cfg.replace(anchors=cfg.anchors[:1])
    pts = jnp.asarray(bench_clouds(args.batch, args.points))
    num = jnp.full((args.batch,), args.points, jnp.int32)
    vox = jax.jit(lambda p, n: voxelize_batch(p, n, cfg))(pts, num)
    st0 = jax.jit(lambda v: build_middle_input(cfg, v))(vox)
    keys, mask = st0.keys, st0.mask

    def report(name, fn, fargs):
        dt = timeit_scanned(fn, fargs, iters=args.iters)
        print(f"{name:34s} {dt*1e3:9.2f} ms", flush=True)

    stages = [((41, 1600, 1408), (3, 3, 3), (2, 2, 2), (1, 1, 1)),
              ((21, 800, 704), (3, 3, 3), (2, 2, 2), (1, 1, 1))]
    for si, (grid, dk, ds, dp) in enumerate(stages):
        n = keys.shape[1]
        out_cap = cfg.stage_voxel_capacity(si + 1)
        out_grid = sp.out_grid_shape(grid, dk, ds, dp)

        report(f"s{si}.downsample",
               lambda k, m, grid=grid, dk=dk, ds=ds, dp=dp, oc=out_cap:
                   jax.vmap(lambda kk, mm: sp.downsample_active_set(
                       kk, mm, grid, dk, ds, dp, oc))(k, m),
               (keys, mask))
        ok, om, _ = jax.jit(
            lambda k, m, grid=grid, dk=dk, ds=ds, dp=dp, oc=out_cap:
                jax.vmap(lambda kk, mm: sp.downsample_active_set(
                    kk, mm, grid, dk, ds, dp, oc))(k, m))(keys, mask)

        report(f"s{si}.build_col_compact",
               lambda k, m, grid=grid, n=n: sp.build_col_compact(
                   k, m, grid, n),
               (keys, mask))
        t4c, slotmap, _, _, col_cell = jax.jit(
            lambda k, m, grid=grid, n=n: sp.build_col_compact(k, m, grid, n)
        )(keys, mask)

        report(f"s{si}.zwin_rb_subm_compact",
               lambda t, s, k, m, grid=grid, n=n: sp.zwin_rulebook_compact(
                   t, s, n, grid, k, m, grid, (3, 3, 3), (1, 1, 1),
                   (1, 1, 1)),
               (t4c, slotmap, keys, mask))
        report(f"s{si}.zwin_rb_down_compact",
               lambda t, s, k, m, grid=grid, n=n, og=out_grid, dk=dk,
                      ds=ds, dp=dp: sp.zwin_rulebook_compact(
                   t, s, n, grid, k, m, og, dk, ds, dp),
               (t4c, slotmap, ok, om))
        ccap_in = cfg.stage_column_capacity(si)
        ccap_out = cfg.stage_column_capacity(si + 1)
        report(f"s{si}.zwin_rb_subm_cached",
               lambda t, s, k, m, grid=grid, n=n, cc=ccap_in:
                   sp.zwin_rulebook_cached(
                       t, s, n, grid, k, m, grid, (3, 3, 3), (1, 1, 1),
                       (1, 1, 1), col_cap=cc),
               (t4c, slotmap, keys, mask))
        report(f"s{si}.zwin_rb_down_cached",
               lambda t, s, k, m, grid=grid, n=n, og=out_grid, dk=dk,
                      ds=ds, dp=dp, cc=ccap_out: sp.zwin_rulebook_cached(
                   t, s, n, grid, k, m, og, dk, ds, dp, col_cap=cc),
               (t4c, slotmap, ok, om))
        report(f"s{si}.plan_stage_full",
               lambda k, m, grid=grid, dk=dk, ds=ds, dp=dp, oc=out_cap,
                      ci=ccap_in, co=ccap_out:
                   sp.plan_stage_batched(k, m, grid, dk, ds, dp, oc,
                                         subm_kernel=(3, 3, 3),
                                         subm_col_cap=ci, down_col_cap=co),
               (keys, mask))
        keys, mask = ok, om


if __name__ == "__main__":
    main()
