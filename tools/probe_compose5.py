"""Round-5 s1 plan composition probe: parts sum to ~84ms but the
composed plan_stage_batched measures 114ms. Insert optimization
barriers between phases to find the bad fusion, and time reduced
variants (no subm rulebook / no dfs) to attribute the overhead.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


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
    keys, mask, _ = jax.jit(
        lambda k, m: jax.vmap(lambda kk, mm: sp.downsample_active_set(
            kk, mm, g0, (3, 3, 3), (2, 2, 2), (1, 1, 1),
            cfg.stage_voxel_capacity(1)))(k, m)
    )(st0.keys, st0.mask)
    g1 = (21, 800, 704)
    og = sp.out_grid_shape(g1, (3, 3, 3), (2, 2, 2), (1, 1, 1))
    n = keys.shape[1]
    oc = cfg.stage_voxel_capacity(2)

    def report(name, fn, fargs):
        dt = timeit_scanned(fn, fargs, iters=10)
        print(f"{name:30s} {dt*1e3:9.2f} ms", flush=True)

    report("plan_full",
           lambda k, m: sp.plan_stage_batched(
               k, m, g1, (3, 3, 3), (2, 2, 2), (1, 1, 1), oc,
               subm_kernel=(3, 3, 3)),
           (keys, mask))

    def plan_phased(k, m, *, barriers, subm=True, dfs=True, rbs_on=True,
                    rbd_on=True):
        bar = (jax.lax.optimization_barrier if barriers
               else (lambda x: x))
        t4c, _, _, _, col_cell = sp.build_col_compact(
            k, m, g1, n, want_slotmap=False)
        t4c, col_cell = bar((t4c, col_cell))
        img = sp.dense_record_image(t4c, col_cell, g1)
        img = bar(img)
        stack_d = sp.dense_shift_stack(img, g1, og, (3, 3, 3), (2, 2, 2),
                                       (1, 1, 1))
        stack_d = bar(stack_d)
        if dfs:
            ok, om, nd = sp.downsample_from_stack(
                stack_d, g1[0], og, (3, 3, 3), (2, 2, 2), (1, 1, 1), oc)
        else:
            ok, om, nd = jax.vmap(
                lambda kk, mm: sp.downsample_active_set(
                    kk, mm, g1, (3, 3, 3), (2, 2, 2), (1, 1, 1), oc)
            )(k, m)
        ok, om = bar((ok, om))
        out = [ok, om, nd]
        if subm and rbs_on:
            out += list(sp.zwin_rulebook_dense_shift(
                t4c, col_cell, n, g1, k, m, g1, (3, 3, 3), (1, 1, 1),
                (1, 1, 1), img=img))
        if rbd_on:
            out += list(sp.zwin_rulebook_dense_shift(
                t4c, col_cell, n, g1, ok, om, og, (3, 3, 3), (2, 2, 2),
                (1, 1, 1), stack=stack_d))
        return tuple(out)

    report("phased_nobar",
           lambda k, m: plan_phased(k, m, barriers=False), (keys, mask))
    report("phased_bar",
           lambda k, m: plan_phased(k, m, barriers=True), (keys, mask))
    report("phased_bar_nosubm",
           lambda k, m: plan_phased(k, m, barriers=True, subm=False),
           (keys, mask))
    report("phased_bar_nodown",
           lambda k, m: plan_phased(k, m, barriers=True, rbd_on=False),
           (keys, mask))
    report("phased_bar_rbonly",
           lambda k, m: plan_phased(k, m, barriers=True, dfs=False),
           (keys, mask))


if __name__ == "__main__":
    main()
