"""TPU timing of plan_stage_batched's COMPONENTS at bench geometry.

profile_plan.py times plan_stage as one op; this splits it into
downsample_active_set / build_col_compact / zwin_rulebook_cached (subm) /
zwin_rulebook_down_scatter so the round-4 plan work targets the right row.

Usage: python tools/profile_plan_parts.py [--batch 8]
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
    ap.add_argument("--only", default="")
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
    rng = jax.random.PRNGKey(0)
    wanted = [w for w in args.only.split(",") if w]
    results = {}

    def report(name, fn, fargs, **kw):
        if wanted and not any(w in name for w in wanted):
            return
        dt = timeit_scanned(fn, fargs, iters=args.iters, **kw)
        results[name] = dt * 1e3
        print(f"{name:34s} {dt*1e3:9.2f} ms", flush=True)

    vox = jax.jit(lambda p, n: voxelize_batch(p, n, cfg))(pts, num)
    st0 = jax.jit(lambda v: build_middle_input(cfg, v))(vox)
    keys, mask = st0.keys, st0.mask

    stages = [
        ((41, 1600, 1408), ((3, 3, 3), (2, 2, 2), (1, 1, 1))),
        ((21, 800, 704), ((3, 3, 3), (2, 2, 2), (1, 1, 1))),
    ]
    for si, (grid, (dk, ds, dp)) in enumerate(stages):
        n = keys.shape[1]
        out_cap = cfg.stage_voxel_capacity(si + 1)

        report(
            f"s{si}.downsample_active_set",
            lambda k, m, grid=grid, dk=dk, ds=ds, dp=dp, oc=out_cap:
                jax.vmap(lambda kk, mm: sp.downsample_active_set(
                    kk, mm, grid, dk, ds, dp, oc))(k, m),
            (keys, mask),
        )
        report(
            f"s{si}.build_col_compact",
            lambda k, m, grid=grid, nn=n:
                sp.build_col_compact(k, m, grid, nn),
            (keys, mask),
        )
        t4c, slotmap, _, _, col_cell = jax.jit(
            lambda k, m, grid=grid, nn=n: sp.build_col_compact(k, m, grid, nn)
        )(keys, mask)
        ok, om, _ = jax.jit(
            lambda k, m, grid=grid, dk=dk, ds=ds, dp=dp, oc=out_cap:
                jax.vmap(lambda kk, mm: sp.downsample_active_set(
                    kk, mm, grid, dk, ds, dp, oc))(k, m)
        )(keys, mask)
        scc = cfg.stage_column_capacity(si)
        dcc = cfg.stage_column_capacity(si + 1)
        report(
            f"s{si}.zwin_rulebook_cached(subm)",
            lambda t, s, k, m, grid=grid, nn=n, scc=scc:
                sp.zwin_rulebook_cached(t, s, nn, grid, k, m, grid,
                                        (3, 3, 3), (1, 1, 1), (1, 1, 1),
                                        col_cap=scc),
            (t4c, slotmap, keys, mask),
        )
        report(
            f"s{si}.zwin_down_scatter",
            lambda t, cc, okk, omm, grid=grid, dk=dk, ds=ds, dp=dp, nn=n,
                   dcc=dcc:
                sp.zwin_rulebook_down_scatter(
                    t, cc, nn, grid, okk, omm,
                    sp.out_grid_shape(grid, dk, ds, dp), dk, ds, dp,
                    col_cap=dcc),
            (t4c, col_cell, ok, om),
        )
        report(
            f"s{si}.dense_record_image",
            lambda t, cc, grid=grid: sp.dense_record_image(t, cc, grid),
            (t4c, col_cell),
        )
        img = jax.jit(
            lambda t, cc, grid=grid: sp.dense_record_image(t, cc, grid)
        )(t4c, col_cell)
        report(
            f"s{si}.dshift_subm",
            lambda i, k, m, grid=grid, nn=n:
                sp.zwin_rulebook_dense_shift(
                    None, None, nn, grid, k, m, grid,
                    (3, 3, 3), (1, 1, 1), (1, 1, 1), img=i),
            (img, keys, mask),
        )
        report(
            f"s{si}.dshift_down",
            lambda i, okk, omm, grid=grid, dk=dk, ds=ds, dp=dp, nn=n:
                sp.zwin_rulebook_dense_shift(
                    None, None, nn, grid, okk, omm,
                    sp.out_grid_shape(grid, dk, ds, dp), dk, ds, dp,
                    img=i),
            (img, ok, om),
        )

        # csr_zwin_rulebook wants the int32 4-component dense record table
        # (the round-2 form; the production image is now byte-plane bf16)
        hw1 = grid[1] * grid[2]
        img_i32 = jnp.stack(
            sp.unpack_records_bytes(
                img.reshape(args.batch, hw1, 9).astype(jnp.int32)
            ), axis=-1,
        )
        rec_img = jnp.concatenate(
            [img_i32, jnp.zeros((args.batch, 1, 4), jnp.int32)], axis=1
        ).reshape(args.batch * (hw1 + 1), 4)
        report(
            f"s{si}.csrimg_subm",
            lambda r, k, m, grid=grid, nn=n:
                sp.csr_zwin_rulebook(r, nn, grid, k, m, grid,
                                     (3, 3, 3), (1, 1, 1), (1, 1, 1)),
            (rec_img, keys, mask),
        )
        report(
            f"s{si}.csrimg_down",
            lambda r, okk, omm, grid=grid, dk=dk, ds=ds, dp=dp, nn=n:
                sp.csr_zwin_rulebook(r, nn, grid, okk, omm,
                                     sp.out_grid_shape(grid, dk, ds, dp),
                                     dk, ds, dp),
            (rec_img, ok, om),
        )

        # equality vs the production cached/scatter rulebooks
        if wanted and not any(f"s{si}" in w for w in wanted):
            keys, mask = ok, om
            continue
        rs_c = jax.jit(
            lambda t, s, k, m, grid=grid, nn=n, scc=scc:
                sp.zwin_rulebook_cached(t, s, nn, grid, k, m, grid,
                                        (3, 3, 3), (1, 1, 1), (1, 1, 1),
                                        col_cap=scc)
        )(t4c, slotmap, keys, mask)
        rs_d = jax.jit(
            lambda i, k, m, grid=grid, nn=n:
                sp.zwin_rulebook_dense_shift(
                    None, None, nn, grid, k, m, grid,
                    (3, 3, 3), (1, 1, 1), (1, 1, 1), img=i)
        )(img, keys, mask)
        eq_s = (np.array_equal(np.asarray(rs_c[0]), np.asarray(rs_d[0]))
                and np.array_equal(np.asarray(rs_c[1]), np.asarray(rs_d[1])))
        rd_c = jax.jit(
            lambda t, cc, okk, omm, grid=grid, dk=dk, ds=ds, dp=dp, nn=n,
                   dcc=dcc:
                sp.zwin_rulebook_down_scatter(
                    t, cc, nn, grid, okk, omm,
                    sp.out_grid_shape(grid, dk, ds, dp), dk, ds, dp,
                    col_cap=dcc)
        )(t4c, col_cell, ok, om)
        rd_d = jax.jit(
            lambda i, okk, omm, grid=grid, dk=dk, ds=ds, dp=dp, nn=n:
                sp.zwin_rulebook_dense_shift(
                    None, None, nn, grid, okk, omm,
                    sp.out_grid_shape(grid, dk, ds, dp), dk, ds, dp,
                    img=i)
        )(img, ok, om)
        eq_d = (np.array_equal(np.asarray(rd_c[0]), np.asarray(rd_d[0]))
                and np.array_equal(np.asarray(rd_c[1]), np.asarray(rd_d[1])))
        print(f"s{si} dense_shift equality: subm={eq_s} down={eq_d}",
              flush=True)
        keys, mask = ok, om

    print({k: round(v, 2) for k, v in results.items()})


if __name__ == "__main__":
    main()
