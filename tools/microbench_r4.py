"""Round-4 microbench: the pending-measurement candidates, on TPU.

1. stage-2 densify: dense_from_sparse (CSR, 69.5ms measured) vs the
   column-route dense_from_sparse_cols the model actually runs.
2. stage-2/3 dense subm conv: conv3d (NDHWC) vs z-slice-batched conv2d
   (out[z] = sum_dz conv2d(x[z+dz-1], W[dz]) — same FLOPs, 2D lowering).
3. z-window conv: Pallas v2 (production) vs v3 (k2-major, no XLA
   relayout) at the s0-down / s1-subm / s1-down bench shapes.

Usage: python tools/microbench_r4.py [--batch 8] [--only substr]
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

    vox = jax.jit(lambda p, n: voxelize_batch(p, n, cfg))(pts, num)
    st0 = jax.jit(lambda v: build_middle_input(cfg, v))(vox)
    keys, mask = st0.keys, st0.mask

    # walk the active sets to stage-2 geometry via the real plans
    stages = [
        ((41, 1600, 1408), ((3, 3, 3), (2, 2, 2), (1, 1, 1))),
        ((21, 800, 704), ((3, 3, 3), (2, 2, 2), (1, 1, 1))),
    ]
    plans = []
    for si, (grid, (dk, ds, dp)) in enumerate(stages):
        n = keys.shape[1]
        out_cap = cfg.stage_voxel_capacity(si + 1)
        rbs, rbd, ok, om, _ = jax.jit(
            lambda k, m, grid=grid, dk=dk, ds=ds, dp=dp, oc=out_cap,
                   scc=cfg.stage_column_capacity(si),
                   dcc=cfg.stage_column_capacity(si + 1):
                sp.plan_stage_batched(k, m, grid, dk, ds, dp, oc,
                                      subm_kernel=(3, 3, 3),
                                      subm_col_cap=scc, down_col_cap=dcc)
        )(keys, mask)
        plans.append((grid, keys, mask, rbs, rbd, ok, om))
        keys, mask = ok, om

    # ---- 1. stage-2 densify variants ----
    g2 = (11, 400, 352)
    f2 = jax.random.normal(rng, (b, keys.shape[1], 64), jnp.bfloat16)
    report(
        "densify.csr",
        lambda f, k, m: scnn.dense_from_sparse(
            scnn.SparseTensor(feats=f, keys=k, mask=m, grid=g2), False
        ).feats,
        (f2, keys, mask),
    )
    report(
        "densify.cols",
        lambda f, k, m: scnn.dense_from_sparse_cols(
            scnn.SparseTensor(feats=f, keys=k, mask=m, grid=g2), False,
            ncol_cap=cfg.stage_column_capacity(2),
        )[0].feats,
        (f2, keys, mask),
    )

    # ---- 2. dense conv lowering ----
    dt2 = jax.jit(
        lambda f, k, m: scnn.dense_from_sparse(
            scnn.SparseTensor(feats=f, keys=k, mask=m, grid=g2), False
        )
    )(f2, keys, mask)
    w64 = jax.random.normal(rng, (27 * 64, 64), jnp.float32)
    report(
        "s2conv.conv3d",
        lambda f, w: scnn._dense_conv(
            f, w, (3, 3, 3), (1, 1, 1), (1, 1, 1), jnp.bfloat16),
        (dt2.feats, w64),
    )
    report(
        "s2conv.z2d",
        lambda f, w: scnn._dense_conv_z2d(
            f, w, (3, 3, 3), (1, 1, 1), (1, 1, 1), jnp.bfloat16),
        (dt2.feats, w64),
    )
    report(
        "s2conv.down.conv3d",
        lambda f, w: scnn._dense_conv(
            f, w, (3, 3, 3), (2, 2, 2), (0, 1, 1), jnp.bfloat16),
        (dt2.feats, w64),
    )
    report(
        "s2conv.down.z2d",
        lambda f, w: scnn._dense_conv_z2d(
            f, w, (3, 3, 3), (2, 2, 2), (0, 1, 1), jnp.bfloat16),
        (dt2.feats, w64),
    )
    g3 = (6, 200, 176)
    f3 = jax.random.normal(rng, (b,) + g3 + (64,), jnp.bfloat16)
    report(
        "s3conv.conv3d",
        lambda f, w: scnn._dense_conv(
            f, w, (3, 3, 3), (1, 1, 1), (1, 1, 1), jnp.bfloat16),
        (f3, w64),
    )
    report(
        "s3conv.z2d",
        lambda f, w: scnn._dense_conv_z2d(
            f, w, (3, 3, 3), (1, 1, 1), (1, 1, 1), jnp.bfloat16),
        (f3, w64),
    )

    # ---- 3. zwin conv v2 vs v3 at the model shapes ----
    zshapes = [
        # (name, plan idx, rulebook, cin, cout, kernel)
        ("s0.subm_c16", 0, "subm", 16, 16, (3, 3, 3)),
        ("s0.down", 0, "down", 16, 32, (3, 3, 3)),
        ("s1.subm_c32", 1, "subm", 32, 32, (3, 3, 3)),
        ("s1.down", 1, "down", 32, 64, (3, 3, 3)),
    ]
    for name, pi, which, cin, cout, kern in zshapes:
        grid, k_, m_, rbs, rbd, ok, om = plans[pi]
        rb = rbs if which == "subm" else rbd
        n = k_.shape[1]
        feats = jax.random.normal(rng, (b, n, cin), jnp.bfloat16)
        w = jax.random.normal(
            rng, (kern[0] * kern[1] * kern[2] * cin, cout), jnp.float32)
        report(
            f"zwin.{name}.v2",
            lambda f, s, p, ww, kern=kern: conv_zwin_apply_pallas2(
                f, s, p, ww, kern),
            (feats, rb[0], rb[1], w),
        )
        report(
            f"zwin.{name}.v3",
            lambda f, s, p, ww, kern=kern: conv_zwin_apply_pallas3(
                f, s, p, ww, kern),
            (feats, rb[0], rb[1], w),
        )

    print({k: round(v, 2) for k, v in results.items()})


if __name__ == "__main__":
    main()
