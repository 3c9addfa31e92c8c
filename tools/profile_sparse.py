"""Fine-grained TPU timing of every sparse-CNN sub-op at bench geometry.

Times, per stage (batch 8, 18k pts, bf16, honest capacities):
  build_csr / csr_zwin_rulebook (subm + down) / downsample_active_set /
  conv_zwin_apply (subm + down) / dense_from_sparse / dense stage convs.

Usage: python tools/profile_sparse.py [--batch 8] [--points 18000]
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
    ap.add_argument("--only", default="", help="comma-list of item substrings")
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

    cfg = Config().replace(num_classes=1, compute_dtype="bfloat16")
    cfg = cfg.replace(anchors=cfg.anchors[:1])
    pts = jnp.asarray(bench_clouds(args.batch, args.points))
    num = jnp.full((args.batch,), args.points, jnp.int32)

    results = {}
    wanted = [w for w in args.only.split(",") if w]

    def report(name, fn, fargs, **kw):
        if wanted and not any(w in name for w in wanted):
            return None
        dt = timeit_scanned(fn, fargs, iters=args.iters, **kw)
        results[name] = dt * 1e3
        print(f"{name:36s} {dt*1e3:9.2f} ms", flush=True)
        return dt

    # ---- stage inputs -------------------------------------------------
    vox = jax.jit(lambda p, n: voxelize_batch(p, n, cfg))(pts, num)
    st0 = jax.jit(lambda v: build_middle_input(cfg, v))(vox)
    keys0, mask0 = st0.keys, st0.mask
    g0 = cfg.grid_shape_zyx                       # (41, 1600, 1408)
    print("stage0 active:", np.asarray(mask0.sum(1)), flush=True)

    rng = jax.random.PRNGKey(0)
    b = args.batch

    specs = [
        # (grid, cap, c_subm, c_out, down kernel/stride/pad, n_subm)
        (g0, cfg.stage_voxel_capacity(0), 16, 32,
         ((3, 3, 3), (2, 2, 2), (1, 1, 1)), 2),
        ((21, 800, 704), cfg.stage_voxel_capacity(1), 32, 64,
         ((3, 3, 3), (2, 2, 2), (1, 1, 1)), 2),
    ]

    keys, mask = keys0, mask0
    for si, (grid, cap, c, c_out, (dk, ds, dp), n_subm) in enumerate(specs):
        n = keys.shape[1]
        feats = jax.random.normal(rng, (b, n, c), jnp.bfloat16)
        out_grid = sp.out_grid_shape(grid, dk, ds, dp)
        out_cap = cfg.stage_voxel_capacity(si + 1)

        report(f"s{si}.build_csr", lambda k, m: sp.build_csr(k, m, grid),
               (keys, mask))
        rec = jax.jit(lambda k, m: sp.build_csr(k, m, grid))(keys, mask)

        report(
            f"s{si}.zwin_rb_subm",
            lambda r, k, m: sp.csr_zwin_rulebook(
                r, n, grid, k, m, grid, (3, 3, 3), (1, 1, 1), (1, 1, 1)
            ),
            (rec, keys, mask),
        )
        rbs = jax.jit(
            lambda r, k, m: sp.csr_zwin_rulebook(
                r, n, grid, k, m, grid, (3, 3, 3), (1, 1, 1), (1, 1, 1)
            )
        )(rec, keys, mask)

        report(
            f"s{si}.down_active_set",
            lambda k, m: jax.vmap(
                lambda kk, mm: sp.downsample_active_set(
                    kk, mm, grid, dk, ds, dp, out_cap
                )
            )(k, m),
            (keys, mask),
        )
        ok, om, _ = jax.jit(
            lambda k, m: jax.vmap(
                lambda kk, mm: sp.downsample_active_set(
                    kk, mm, grid, dk, ds, dp, out_cap
                )
            )(k, m)
        )(keys, mask)
        print(f"  s{si+1} active:", np.asarray(om.sum(1)), flush=True)

        report(
            f"s{si}.zwin_rb_down",
            lambda r, o, m: sp.csr_zwin_rulebook(
                r, n, grid, o, m, out_grid, dk, ds, dp
            ),
            (rec, ok, om),
        )
        rbd = jax.jit(
            lambda r, o, m: sp.csr_zwin_rulebook(
                r, n, grid, o, m, out_grid, dk, ds, dp
            )
        )(rec, ok, om)

        w_subm = jax.random.normal(rng, (27 * c, c), jnp.float32)
        report(
            f"s{si}.conv_subm_x{n_subm}",
            lambda f, s, p, w: sp.conv_zwin_apply(
                f, s, p, w, (3, 3, 3), compute_dtype=jnp.bfloat16
            ),
            (feats, rbs[0], rbs[1], w_subm),
        )
        w_down = jax.random.normal(rng, (27 * c, c_out), jnp.float32)
        report(
            f"s{si}.conv_down",
            lambda f, s, p, w: sp.conv_zwin_apply(
                f, s, p, w, dk, compute_dtype=jnp.bfloat16
            ),
            (feats, rbd[0], rbd[1], w_down),
        )
        keys, mask = ok, om

    # ---- dense tail (stages 2-3) --------------------------------------
    g2 = (11, 400, 352)
    cap2 = cfg.stage_voxel_capacity(2)
    keys2, mask2 = keys, mask
    f2 = jax.random.normal(rng, (b, keys2.shape[1], 64), jnp.bfloat16)
    st2 = scnn.SparseTensor(feats=f2, keys=keys2, mask=mask2, grid=g2)
    report(
        "s2.dense_from_sparse",
        lambda f, k, m: scnn.dense_from_sparse(
            scnn.SparseTensor(feats=f, keys=k, mask=m, grid=g2), False
        ).feats,
        (f2, keys2, mask2),
    )
    dt2 = jax.jit(
        lambda f, k, m: scnn.dense_from_sparse(
            scnn.SparseTensor(feats=f, keys=k, mask=m, grid=g2), False
        )
    )(f2, keys2, mask2)

    w64 = jax.random.normal(rng, (27 * 64, 64), jnp.float32)
    report(
        "s2.dense_subm_conv_x3",
        lambda f, w: scnn._dense_conv(
            f, w, (3, 3, 3), (1, 1, 1), (1, 1, 1), jnp.bfloat16
        ),
        (dt2.feats, w64),
    )
    report(
        "s2.dense_down_conv",
        lambda f, w: scnn._dense_conv(
            f, w, (3, 3, 3), (2, 2, 2), (0, 1, 1), jnp.bfloat16
        ),
        (dt2.feats, w64),
    )

    print({k: round(v, 2) for k, v in results.items()})


if __name__ == "__main__":
    main()
