"""TPU timing of the sparse CNN's REAL per-stage ops (the model path):
plan_stage_batched (compact-record rulebooks + downsample) and the
z-window convs (XLA align vs Pallas v2), plus densify and dense tail,
at bench geometry. Complements tools/profile_sparse.py, which measures
the older dense-CSR building blocks.

Usage: python tools/profile_plan.py [--batch 8] [--only substr,substr]
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
    from vision3d_tpu.models import sparse_cnn as scnn
    from vision3d_tpu.models.second import build_middle_input
    from vision3d_tpu.ops import sparse as sp
    from vision3d_tpu.ops.pallas.zwin_conv import (
        conv_zwin_apply_pallas2,
        conv_zwin_apply_pallas3,
    )

    cfg = Config().replace(num_classes=1, compute_dtype="bfloat16")
    cfg = cfg.replace(anchors=cfg.anchors[:1])
    pts = jnp.asarray(bench_clouds(args.batch, args.points))
    num = jnp.full((args.batch,), args.points, jnp.int32)
    rng = jax.random.PRNGKey(0)
    b = args.batch
    wanted = [w for w in args.only.split(",") if w]
    results = {}

    def report(name, fn, fargs, **kw):
        if wanted and not any(w in name for w in wanted):
            return
        dt = timeit_scanned(fn, fargs, iters=args.iters, **kw)
        results[name] = dt * 1e3
        print(f"{name:34s} {dt*1e3:9.2f} ms", flush=True)

    report("voxelize", lambda p, n: voxelize_batch(p, n, cfg), (pts, num))
    vox = jax.jit(lambda p, n: voxelize_batch(p, n, cfg))(pts, num)
    st0 = jax.jit(lambda v: build_middle_input(cfg, v))(vox)
    keys, mask = st0.keys, st0.mask
    print("stage0 active:", np.asarray(mask.sum(1)), flush=True)

    stages = [
        # grid, cin, subm channels, down cout, down (k, s, p)
        ((41, 1600, 1408), 4, [16, 16], 32,
         ((3, 3, 3), (2, 2, 2), (1, 1, 1))),
        ((21, 800, 704), 32, [32, 32], 64,
         ((3, 3, 3), (2, 2, 2), (1, 1, 1))),
    ]
    for si, (grid, cin, subm_ch, cdown, (dk, ds, dp)) in enumerate(stages):
        n = keys.shape[1]
        out_cap = cfg.stage_voxel_capacity(si + 1)

        report(
            f"s{si}.plan_stage",
            lambda k, m, grid=grid, dk=dk, ds=ds, dp=dp, oc=out_cap:
                sp.plan_stage_batched(k, m, grid, dk, ds, dp, oc,
                                      subm_kernel=(3, 3, 3)),
            (keys, mask),
        )
        rbs, rbd, ok, om, _ = jax.jit(
            lambda k, m, grid=grid, dk=dk, ds=ds, dp=dp, oc=out_cap:
                sp.plan_stage_batched(k, m, grid, dk, ds, dp, oc,
                                      subm_kernel=(3, 3, 3))
        )(keys, mask)
        print(f"  s{si+1} active:", np.asarray(om.sum(1)), flush=True)

        for cc in {cin, subm_ch[0]}:
            feats = jax.random.normal(rng, (b, n, cc), jnp.bfloat16)
            w = jax.random.normal(rng, (27 * cc, subm_ch[0]), jnp.float32)
            report(
                f"s{si}.subm_conv_xla_c{cc}",
                lambda f, s, p, ww: sp.conv_zwin_apply(
                    f, s, p, ww, (3, 3, 3), compute_dtype=jnp.bfloat16),
                (feats, rbs[0], rbs[1], w),
            )
            report(
                f"s{si}.subm_conv_pl2_c{cc}",
                lambda f, s, p, ww: conv_zwin_apply_pallas2(
                    f, s, p, ww, (3, 3, 3)),
                (feats, rbs[0], rbs[1], w),
            )
            # v3 on the REAL rulebook: its k2-major gather's locality
            # (consecutive sites of one tap fetch near-consecutive rows)
            # only shows on sorted production plans, not random patterns
            report(
                f"s{si}.subm_conv_pl3_c{cc}",
                lambda f, s, p, ww: conv_zwin_apply_pallas3(
                    f, s, p, ww, (3, 3, 3)),
                (feats, rbs[0], rbs[1], w),
            )
        feats = jax.random.normal(rng, (b, n, subm_ch[-1]), jnp.bfloat16)
        wd = jax.random.normal(rng, (27 * subm_ch[-1], cdown), jnp.float32)
        report(
            f"s{si}.down_conv_xla",
            lambda f, s, p, ww: sp.conv_zwin_apply(
                f, s, p, ww, dk, compute_dtype=jnp.bfloat16),
            (feats, rbd[0], rbd[1], wd),
        )
        report(
            f"s{si}.down_conv_pl2",
            lambda f, s, p, ww: conv_zwin_apply_pallas2(f, s, p, ww, dk),
            (feats, rbd[0], rbd[1], wd),
        )
        report(
            f"s{si}.down_conv_pl3",
            lambda f, s, p, ww: conv_zwin_apply_pallas3(f, s, p, ww, dk),
            (feats, rbd[0], rbd[1], wd),
        )
        keys, mask = ok, om

    # densify + dense tail at stage 2
    g2 = (11, 400, 352)
    f2 = jax.random.normal(rng, (b, keys.shape[1], 64), jnp.bfloat16)
    report(
        "s2.dense_from_sparse",
        lambda f, k, m: scnn.dense_from_sparse(
            scnn.SparseTensor(feats=f, keys=k, mask=m, grid=g2), False
        ).feats,
        (f2, keys, mask),
    )
    dt2 = jax.jit(
        lambda f, k, m: scnn.dense_from_sparse(
            scnn.SparseTensor(feats=f, keys=k, mask=m, grid=g2), False
        )
    )(f2, keys, mask)
    w64 = jax.random.normal(rng, (27 * 64, 64), jnp.float32)
    report(
        "s2.dense_subm_conv",
        lambda f, w: scnn._dense_conv(
            f, w, (3, 3, 3), (1, 1, 1), (1, 1, 1), jnp.bfloat16),
        (dt2.feats, w64),
    )
    report(
        "s2.dense_down_conv",
        lambda f, w: scnn._dense_conv(
            f, w, (3, 3, 3), (2, 2, 2), (0, 1, 1), jnp.bfloat16),
        (dt2.feats, w64),
    )
    g3 = (6, 200, 176)
    f3 = jax.random.normal(rng, (b,) + g3 + (64,), jnp.bfloat16)
    report(
        "s3.dense_subm_conv",
        lambda f, w: scnn._dense_conv(
            f, w, (3, 3, 3), (1, 1, 1), (1, 1, 1), jnp.bfloat16),
        (f3, w64),
    )
    w311 = jax.random.normal(rng, (3 * 64, 64), jnp.float32)
    report(
        "s3.dense_down_311",
        lambda f, w: scnn._dense_conv(
            f, w, (3, 1, 1), (2, 1, 1), (0, 0, 0), jnp.bfloat16),
        (f3, w311),
    )
    print({k: round(v, 2) for k, v in results.items()})


if __name__ == "__main__":
    main()
