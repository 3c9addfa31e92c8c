"""Probe the s1 plan composition overhead (plan_full 180ms vs 114ms
sum-of-parts): try optimization_barrier between the downsample sort and
the rulebook builds, and a subm-less plan, to find the bad fusion.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main():
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
    pts = jnp.asarray(bench_clouds(8, 18000))
    num = jnp.full((8,), 18000, jnp.int32)
    vox = jax.jit(lambda p, n: voxelize_batch(p, n, cfg))(pts, num)
    st0 = jax.jit(lambda v: build_middle_input(cfg, v))(vox)
    g0 = (41, 1600, 1408)
    ok, om, _ = jax.jit(
        lambda k, m: jax.vmap(lambda kk, mm: sp.downsample_active_set(
            kk, mm, g0, (3, 3, 3), (2, 2, 2), (1, 1, 1),
            cfg.stage_voxel_capacity(1)))(k, m)
    )(st0.keys, st0.mask)
    g1 = (21, 800, 704)
    keys, mask = ok, om
    oc = cfg.stage_voxel_capacity(2)
    ci, co = cfg.stage_column_capacity(1), cfg.stage_column_capacity(2)

    def report(name, fn, fargs):
        dt = timeit_scanned(fn, fargs, iters=10)
        print(f"{name:34s} {dt*1e3:9.2f} ms", flush=True)

    report("s1.plan_full (again)",
           lambda k, m: sp.plan_stage_batched(
               k, m, g1, (3, 3, 3), (2, 2, 2), (1, 1, 1), oc,
               subm_kernel=(3, 3, 3), subm_col_cap=ci, down_col_cap=co),
           (keys, mask))

    def plan_barrier(k, m):
        out_keys, out_mask, nd = jax.vmap(
            lambda kk, mm: sp.downsample_active_set(
                kk, mm, g1, (3, 3, 3), (2, 2, 2), (1, 1, 1), oc)
        )(k, m)
        k, m, out_keys, out_mask = jax.lax.optimization_barrier(
            (k, m, out_keys, out_mask))
        t4c, slotmap, _, _, _ = sp.build_col_compact(k, m, g1, k.shape[1])
        t4c, slotmap = jax.lax.optimization_barrier((t4c, slotmap))
        n = k.shape[1]
        rbs = sp.zwin_rulebook_cached(t4c, slotmap, n, g1, k, m, g1,
                                      (3, 3, 3), (1, 1, 1), (1, 1, 1),
                                      col_cap=ci)
        rbd = sp.zwin_rulebook_cached(t4c, slotmap, n, g1, out_keys,
                                      out_mask, (11, 400, 352), (3, 3, 3),
                                      (2, 2, 2), (1, 1, 1), col_cap=co)
        return rbs, rbd, out_keys, out_mask, nd

    report("s1.plan_barrier", plan_barrier, (keys, mask))

    report("s1.plan_nosubm",
           lambda k, m: sp.plan_stage_batched(
               k, m, g1, (3, 3, 3), (2, 2, 2), (1, 1, 1), oc,
               down_col_cap=co),
           (keys, mask))


if __name__ == "__main__":
    main()
