"""Phase breakdown of dense_from_sparse_cols at the stage-2 cutover (TPU).

The whole densify is ~62ms measured vs a ~2.5ms HBM-traffic floor
(1.6GB output volume) — time each internal phase to find the off-rate op.
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
    pts = jnp.asarray(bench_clouds(args.batch, 18000))
    num = jnp.full((args.batch,), 18000, jnp.int32)
    b = args.batch

    vox = jax.jit(lambda p, n: voxelize_batch(p, n, cfg))(pts, num)
    st0 = jax.jit(lambda v: build_middle_input(cfg, v))(vox)
    keys, mask = st0.keys, st0.mask
    stages = [
        ((41, 1600, 1408), (3, 3, 3), (2, 2, 2), (1, 1, 1), 1),
        ((21, 800, 704), (3, 3, 3), (2, 2, 2), (1, 1, 1), 2),
    ]
    for grid, dk, ds, dp, so in stages:
        cap = cfg.stage_voxel_capacity(so)
        keys, mask = jax.jit(
            lambda k, m, grid=grid, dk=dk, ds=ds, dp=dp, cap=cap:
            jax.vmap(lambda kk, mm: sp.downsample_active_set(
                kk, mm, grid, dk, ds, dp, cap)[:2])(k, m)
        )(keys, mask)

    g2 = (11, 400, 352)
    d, h, w = g2
    hw = h * w
    n = keys.shape[1]
    c = 64
    nc = cfg.stage_column_capacity(2)
    rng = jax.random.PRNGKey(0)
    feats = jax.random.normal(rng, (b, n, c), jnp.bfloat16)
    print("n sites:", n, "col cap:", nc, flush=True)

    results = {}

    def report(name, fn, fargs):
        dt = timeit_scanned(fn, fargs, iters=args.iters)
        results[name] = dt * 1e3
        print(f"{name:30s} {dt*1e3:9.2f} ms", flush=True)

    report("col_compact", lambda k, m: sp.build_col_compact(k, m, g2, nc)[0],
           (keys, mask))
    t4c, slotmap, _, _, _ = jax.jit(
        lambda k, m: sp.build_col_compact(k, m, g2, nc))(keys, mask)

    def srow_fn(t4c):
        w0 = t4c[..., 0][:, :, None]
        w1 = t4c[..., 1][:, :, None]
        w2 = t4c[..., 2][:, :, None]
        colstart = t4c[..., 3][:, :, None]
        pc = jax.lax.population_count
        zs = jnp.arange(d, dtype=jnp.int32)[None, None, :]

        def below(t):
            tc = jnp.clip(t, 0, 16)
            return jnp.where(tc >= 16, 0xFFFF, (jnp.int32(1) << tc) - 1)

        rank = (pc(w0 & below(zs)) + pc(w1 & below(zs - 16))
                + pc(w2 & below(zs - 32)))
        word = jnp.where(zs < 16, w0, jnp.where(zs < 32, w1, w2))
        present = ((word >> jnp.clip(zs % 16, 0, 15)) & 1) > 0
        return jnp.where(present, colstart + rank, n), present

    report("srow_math", srow_fn, (t4c,))
    srow, present = jax.jit(srow_fn)(t4c)

    def slab_fn(feats, srow):
        fz = jnp.concatenate([feats, jnp.zeros((b, 1, c), feats.dtype)],
                             axis=1)
        return sp._take_maybe_per_sample(
            fz, srow.reshape(b, (nc + 1) * d)).reshape(b, nc + 1, d * c)

    report("slab_build", slab_fn, (feats, srow))
    slab = jax.jit(slab_fn)(feats, srow)

    cells = jnp.broadcast_to(jnp.arange(hw, dtype=jnp.int32)[None], (b, hw))

    def slot_fn(slotmap):
        return jnp.stack(
            [jnp.take(slotmap[i], cells[i]) for i in range(b)], axis=0
        ).astype(jnp.int32)

    report("slot_lookup", slot_fn, (slotmap,))
    slot = jax.jit(slot_fn)(slotmap)

    def bev_fn(slab, slot):
        cidx = jnp.where((slot >= 0) & (slot < nc), slot, nc)
        s2 = slab.at[:, nc].set(0.0)
        return sp._take_maybe_per_sample(s2, cidx)

    report("bev_gather", bev_fn, (slab, slot))
    df = jax.jit(bev_fn)(slab, slot)

    def occ_fn(present, slot):
        cidx = jnp.where((slot >= 0) & (slot < nc), slot, nc)
        pz = jnp.concatenate([present[:, :nc],
                              jnp.zeros((b, 1, d), bool)], axis=1)
        occ_hw = sp._take_maybe_per_sample(pz, cidx)
        return jnp.transpose(occ_hw.reshape(b, h, w, d), (0, 3, 1, 2))

    report("occ_gather", occ_fn, (present, slot))

    def transpose_fn(df):
        return jnp.transpose(df.reshape(b, h, w, d, c), (0, 3, 1, 2, 4))

    report("transpose", transpose_fn, (df,))

    report("FULL cols", lambda f, k, m: scnn.dense_from_sparse_cols(
        scnn.SparseTensor(feats=f, keys=k, mask=m, grid=g2), False,
        ncol_cap=nc)[0].feats, (feats, keys, mask))

    print({k: round(v, 2) for k, v in results.items()})


if __name__ == "__main__":
    main()
