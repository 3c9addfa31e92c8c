"""Round-5 densify shootout at the stage-2 cutover (the eval path's
dense_from_sparse_cols and its parts), batch 8, (11, 400, 352), C=64.

Questions this answers:
- how much of the ~65-70ms densify is the (0,3,1,2,4) transpose into
  the z-major conv layout vs the gathers;
- whether the direct per-cell gather (dense_from_sparse, the train
  path) beats the column route at eval too;
- what an NHWDC-layout densify (reshape instead of transpose) would
  cost, to size the end-to-end layout-swap experiment (probe_nhwdc.py
  already showed conv3d runs at the same speed in either layout).
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
    from vision3d_tpu.models import sparse_cnn as scnn
    from vision3d_tpu.models.second import build_middle_input
    from vision3d_tpu.ops import sparse as sp

    cfg = Config().replace(num_classes=1, compute_dtype="bfloat16")
    cfg = cfg.replace(anchors=cfg.anchors[:1])
    pts = jnp.asarray(bench_clouds(8, 18000))
    num = jnp.full((8,), 18000, jnp.int32)
    vox = jax.jit(lambda p, n: voxelize_batch(p, n, cfg))(pts, num)
    st0 = jax.jit(lambda v: build_middle_input(cfg, v))(vox)

    # advance the ACTIVE SET to stage 2 by two downsamples
    keys, mask = st0.keys, st0.mask
    grid = (41, 1600, 1408)
    for si in (1, 2):
        ok, om, _ = jax.jit(
            lambda k, m, g=grid, oc=cfg.stage_voxel_capacity(si):
            jax.vmap(lambda kk, mm: sp.downsample_active_set(
                kk, mm, g, (3, 3, 3), (2, 2, 2), (1, 1, 1), oc))(k, m)
        )(keys, mask)
        keys, mask = ok, om
        grid = sp.out_grid_shape(grid, (3, 3, 3), (2, 2, 2), (1, 1, 1))
    assert grid == (11, 400, 352), grid
    import numpy as np
    print("s2 active:", np.asarray(mask.sum(1)))

    rng = jax.random.PRNGKey(0)
    feats = jax.random.normal(rng, keys.shape + (64,), jnp.bfloat16)
    feats = jnp.where(mask[..., None], feats, 0)
    ncol_cap = cfg.stage_column_capacity(2)

    def report(name, fn, fargs):
        dt = timeit_scanned(fn, fargs, iters=10)
        print(f"{name:28s} {dt*1e3:9.2f} ms", flush=True)

    def mk(f, k, m):
        return scnn.SparseTensor(feats=f, keys=k, mask=m, grid=grid)

    report("cols (eval path)",
           lambda f, k, m: scnn.dense_from_sparse_cols(
               mk(f, k, m), False, ncol_cap)[0].feats,
           (feats, keys, mask))
    report("direct (train path)",
           lambda f, k, m: scnn.dense_from_sparse(mk(f, k, m), False).feats,
           (feats, keys, mask))

    # the cols route minus the final transpose: (B, HW, D*C) out
    def cols_flat(f, k, m):
        st = mk(f, k, m)
        d, h, w = st.grid
        b, n, c = st.feats.shape
        hw = h * w
        t4c, slotmap, _, nd, _ = sp.build_col_compact(
            st.keys, st.mask, st.grid, ncol_cap)
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
        srow = jnp.where(present, colstart + rank, n)
        fz = jnp.concatenate(
            [st.feats, jnp.zeros((b, 1, c), st.feats.dtype)], axis=1)
        nc = ncol_cap
        slab = sp._take_maybe_per_sample(
            fz, srow.reshape(b, (nc + 1) * d)).reshape(b, nc + 1, d * c)
        cells = jnp.broadcast_to(jnp.arange(hw, dtype=jnp.int32)[None],
                                 (8, hw))
        slot = jnp.stack(
            [jnp.take(slotmap[i], cells[i]) for i in range(b)], axis=0
        ).astype(jnp.int32)
        cidx = jnp.where((slot >= 0) & (slot < nc), slot, nc)
        slab = slab.at[:, nc].set(0.0)
        return sp._take_maybe_per_sample(slab, cidx)  # (B, HW, D*C)

    report("cols_flat (no transpose)", cols_flat, (feats, keys, mask))

    def cols_hwdc(f, k, m):
        df = cols_flat(f, k, m)
        d, h, w = grid
        return df.reshape(8, h, w, d, 64) + 0.0  # free reshape + copy

    report("cols_hwdc (reshape only)", cols_hwdc, (feats, keys, mask))

    def cols_trans(f, k, m):
        df = cols_flat(f, k, m)
        d, h, w = grid
        return jnp.transpose(df.reshape(8, h, w, d, 64), (0, 3, 1, 2, 4))

    report("cols_trans (to z-major)", cols_trans, (feats, keys, mask))


if __name__ == "__main__":
    main()
