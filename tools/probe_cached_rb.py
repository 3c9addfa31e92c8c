"""Bisect zwin_rulebook_cached's cost at stage-1 bench geometry (TPU).

Times each internal phase in isolation (col structure, slot lookups,
record gather, crow fetch, z-window math) to find which indexed op runs
above the ~3ns/row per-sample floor.
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
    ap.add_argument("--cap", type=int, default=0, help="col cap (0=model)")
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
    pts = jnp.asarray(bench_clouds(args.batch, 18000))
    num = jnp.full((args.batch,), 18000, jnp.int32)
    b = args.batch

    vox = jax.jit(lambda p, n: voxelize_batch(p, n, cfg))(pts, num)
    st0 = jax.jit(lambda v: build_middle_input(cfg, v))(vox)
    keys, mask = st0.keys, st0.mask
    # walk to stage 1
    grid0 = (41, 1600, 1408)
    ok, om, _ = jax.jit(
        lambda k, m: jax.vmap(lambda kk, mm: sp.downsample_active_set(
            kk, mm, grid0, (3, 3, 3), (2, 2, 2), (1, 1, 1),
            cfg.stage_voxel_capacity(1)))(k, m)
    )(keys, mask)
    keys, mask = ok, om
    grid = (21, 800, 704)
    n = keys.shape[1]
    nc_cap = args.cap or cfg.stage_column_capacity(1)
    print("n sites:", n, "col cap:", nc_cap, flush=True)

    t4c, slotmap, _, _, _ = jax.jit(
        lambda k, m: sp.build_col_compact(k, m, grid, n)
    )(keys, mask)

    d, h, w = grid
    hw = h * w
    kz, ky, kx = 3, 3, 3
    k2 = 9
    od, oh, ow = grid
    nc = nc_cap

    results = {}

    def report(name, fn, fargs):
        dt = timeit_scanned(fn, fargs, iters=args.iters)
        results[name] = dt * 1e3
        print(f"{name:30s} {dt*1e3:9.2f} ms", flush=True)

    # phase 1: out column structure + compact col cells (vector + scatter)
    def colstruct(out_keys, out_mask):
        okk = jnp.where(out_mask, out_keys, 0)
        cell_out = jnp.where(out_mask, okk // od, oh * ow)
        f = jnp.concatenate(
            [jnp.ones((b, 1), bool), cell_out[:, 1:] != cell_out[:, :-1]],
            axis=1) & out_mask
        colslot = jnp.cumsum(f.astype(jnp.int32), axis=1) - 1
        bidx = jnp.arange(b, dtype=jnp.int32)[:, None]
        size = b * (nc + 1)
        addr_f = jnp.where(f & (colslot < nc), bidx * (nc + 1) + colslot,
                           size)
        col_cell = jnp.full((size,), oh * ow, jnp.int32).at[
            addr_f.reshape(-1)
        ].set(cell_out.reshape(-1), mode="drop").reshape(b, nc + 1)
        return colslot, col_cell

    report("colstruct", colstruct, (keys, mask))
    colslot, col_cell = jax.jit(colstruct)(keys, mask)

    # phase 2: neighbor cell computation (vector)
    offs = np.stack(
        np.meshgrid(np.arange(ky), np.arange(kx), indexing="ij"), -1
    ).reshape(-1, 2)

    def cellq_fn(col_cell):
        coly = col_cell // ow
        colx = col_cell % ow
        ny = coly[:, :, None] - 1 + jnp.asarray(offs)[:, 0]
        nx = colx[:, :, None] - 1 + jnp.asarray(offs)[:, 1]
        okq = ((ny >= 0) & (ny < h) & (nx >= 0) & (nx < w)
               & (col_cell < oh * ow)[:, :, None])
        return jnp.where(okq, ny * w + nx, hw).reshape(b, (nc + 1) * k2)

    report("cellq", cellq_fn, (col_cell,))
    cellq = jax.jit(cellq_fn)(col_cell)

    # phase 3: slot lookups (per-sample int16 map gathers)
    def slots_fn(slotmap, cellq):
        return jnp.stack(
            [jnp.take(slotmap[i], cellq[i]) for i in range(b)], axis=0
        ).astype(jnp.int32)

    report("slot_lookup", slots_fn, (slotmap, cellq))
    slot = jax.jit(slots_fn)(slotmap, cellq)

    # phase 4: record gather (16B rows from VMEM-size table)
    ncin = t4c.shape[1] - 1

    def recs_fn(t4c, slot):
        ridx = jnp.where((slot >= 0) & (slot < ncin), slot, ncin)
        return sp._take_maybe_per_sample(t4c, ridx)

    report("record_gather", recs_fn, (t4c, slot))
    recs = jax.jit(recs_fn)(t4c, slot)

    # phase 4b: record gather PACKED - t4c as (NC+1, 4) viewed rows but
    # fetch through a (NC+1, 8)-padded table (tile-aligned rows)
    def recs_fn8(t4c, slot):
        t8 = jnp.pad(t4c, ((0, 0), (0, 0), (0, 4)))
        ridx = jnp.where((slot >= 0) & (slot < ncin), slot, ncin)
        return sp._take_maybe_per_sample(t8, ridx)

    report("record_gather_pad8", recs_fn8, (t4c, slot))

    # phase 5: crow fetch (one 144B row per site)
    def crow_fn(recs, colslot, out_mask):
        cache = recs.reshape(b, nc + 1, k2 * 4)
        crow_idx = jnp.where(out_mask & (colslot < nc), colslot, nc)
        zero_tail = jnp.zeros((b, 1, k2 * 4), cache.dtype)
        cache2 = jnp.concatenate([cache[:, :nc], zero_tail], axis=1)
        return sp._take_maybe_per_sample(cache2, crow_idx)

    report("crow_fetch", crow_fn, (recs, colslot, mask))
    crow = jax.jit(crow_fn)(recs, colslot, mask)

    # phase 5b: crow via scatter+cumsum forward fill (zero per-site gathers)
    f_sites = jnp.concatenate(
        [jnp.ones((b, 1), bool),
         jnp.where(mask, keys, 0)[:, 1:] // od
         != jnp.where(mask, keys, 0)[:, :-1] // od],
        axis=1) & mask

    def crow_ffill_fn(recs, f, colslot, out_mask):
        cache = recs.reshape(b, nc + 1, k2 * 4)
        return sp._crow_ffill(cache[:, :nc], f, colslot,
                              out_mask & (colslot < nc), n)

    report("crow_ffill", crow_ffill_fn, (recs, f_sites, colslot, mask))

    # phase 6: z-window math (pure vector)
    def zmath_fn(crow, out_keys, out_mask):
        comp = crow.reshape(b, n, k2, 4)
        w0 = comp[..., 0].reshape(b, n * k2)
        w1 = comp[..., 1].reshape(b, n * k2)
        w2 = comp[..., 2].reshape(b, n * k2)
        colstart = comp[..., 3].reshape(b, n * k2)
        okk = jnp.where(out_mask, out_keys, 0)
        oz = jnp.where(out_mask, okk % od, 0)
        z0 = jnp.broadcast_to(
            (oz - 1)[:, :, None], (b, n, k2)).reshape(b, n * k2)
        return sp._zwin_from_records(w0, w1, w2, colstart, z0, d, kz, n)

    report("zwin_math", zmath_fn, (crow, keys, mask))

    # full call for reference
    report(
        "FULL zwin_rulebook_cached",
        lambda t, s, k, m: sp.zwin_rulebook_cached(
            t, s, n, grid, k, m, grid, (3, 3, 3), (1, 1, 1), (1, 1, 1),
            col_cap=nc_cap),
        (t4c, slotmap, keys, mask),
    )

    # ---- down_scatter phases (s1 -> s2) ----
    cfg2_cap = 64000
    nco = 29000
    t4c_f, _, _, _, col_cell = jax.jit(
        lambda k, m: sp.build_col_compact(k, m, grid, nc_cap)
    )(keys, mask)
    okeys, omask, _ = jax.jit(
        lambda k, m: jax.vmap(lambda kk, mm: sp.downsample_active_set(
            kk, mm, grid, (3, 3, 3), (2, 2, 2), (1, 1, 1), cfg2_cap))(k, m)
    )(keys, mask)
    og = (11, 400, 352)
    md = okeys.shape[1]
    ohw = og[1] * og[2]
    ncin = t4c_f.shape[1] - 1

    def d_colstruct(out_keys, out_mask):
        okk = jnp.where(out_mask, out_keys, 0)
        cell_out = jnp.where(out_mask, okk // og[0], ohw)
        fd = jnp.concatenate(
            [jnp.ones((b, 1), bool), cell_out[:, 1:] != cell_out[:, :-1]],
            axis=1) & out_mask
        colslot_d = jnp.cumsum(fd.astype(jnp.int32), axis=1) - 1
        bidx = jnp.arange(b, dtype=jnp.int32)[:, None]
        omap_addr = jnp.where(fd & (colslot_d < nco),
                              bidx * (ohw + 2) + cell_out,
                              bidx * (ohw + 2) + ohw + 1).reshape(-1)
        oslotmap = jnp.full((b * (ohw + 2),), -1, jnp.int32).at[
            omap_addr].set(jnp.minimum(colslot_d, nco).reshape(-1),
                           mode="drop").reshape(b, ohw + 2)
        return colslot_d, oslotmap

    report("down.colstruct", d_colstruct, (okeys, omask))
    colslot_d, oslotmap = jax.jit(d_colstruct)(okeys, omask)

    def d_candidates(col_cell):
        iy = col_cell // w
        ix = col_cell % w
        joffs = np.stack(np.meshgrid(np.arange(2), np.arange(2),
                                     indexing="ij"), -1).reshape(-1, 2)
        jy = jnp.asarray(joffs[:, 0])
        jx = jnp.asarray(joffs[:, 1])
        dy0 = (iy[:, :, None] + 1) % 2
        dx0 = (ix[:, :, None] + 1) % 2
        dy = dy0 + jy * 2
        dx = dx0 + jx * 2
        oy = (iy[:, :, None] + 1 - dy) // 2
        ox = (ix[:, :, None] + 1 - dx) // 2
        okc = ((dy < 3) & (dx < 3) & (oy >= 0) & (oy < og[1])
               & (ox >= 0) & (ox < og[2]) & (col_cell < hw)[:, :, None])
        ocell = jnp.where(okc, oy * og[2] + ox, ohw)
        qc = col_cell.shape[1] * 4
        return (ocell.reshape(b, qc), (dy * 3 + dx).reshape(b, qc),
                okc.reshape(b, qc))

    report("down.candidates", d_candidates, (col_cell,))
    ocell, offidx, okc = jax.jit(d_candidates)(col_cell)

    def d_oslot(oslotmap, ocell, okc):
        return jnp.stack(
            [jnp.take(oslotmap[i], jnp.where(okc, ocell, ohw)[i])
             for i in range(b)], axis=0)

    report("down.oslot_lookup", d_oslot, (oslotmap, ocell, okc))
    oslot = jax.jit(d_oslot)(oslotmap, ocell, okc)

    def d_nbrscatter(oslot, offidx, okc):
        bidx = jnp.arange(b, dtype=jnp.int32)[:, None]
        valid = okc & (oslot >= 0) & (oslot < nco)
        qc = oslot.shape[1]
        inslot = jnp.broadcast_to(
            jnp.arange(qc // 4, dtype=jnp.int32)[None, :, None],
            (b, qc // 4, 4)).reshape(b, qc)
        addr = jnp.where(valid,
                         (bidx * (nco + 1) + oslot) * 9 + offidx,
                         b * (nco + 1) * 9).reshape(-1)
        return jnp.full((b * (nco + 1) * 9 + 1,), ncin, jnp.int32).at[
            addr].set(inslot.reshape(-1), mode="drop")[:-1].reshape(
            b, (nco + 1) * 9)

    report("down.nbrscatter", d_nbrscatter, (oslot, offidx, okc))
    nbrslot = jax.jit(d_nbrscatter)(oslot, offidx, okc)

    def d_recs(t4c_f, nbrslot):
        return sp._take_maybe_per_sample(t4c_f, nbrslot)

    report("down.record_gather", d_recs, (t4c_f, nbrslot))
    recs_d = jax.jit(d_recs)(t4c_f, nbrslot)

    def d_crow(recs_d, colslot_d, omask):
        cache = recs_d.reshape(b, nco + 1, 36)
        crow_idx = jnp.where(omask & (colslot_d < nco), colslot_d, nco)
        zero_tail = jnp.zeros((b, 1, 36), cache.dtype)
        cache2 = jnp.concatenate([cache[:, :nco], zero_tail], axis=1)
        return sp._take_maybe_per_sample(cache2, crow_idx)

    report("down.crow_fetch", d_crow, (recs_d, colslot_d, omask))

    report(
        "FULL down_scatter",
        lambda t, c, k, m: sp.zwin_rulebook_down_scatter(
            t, c, n, grid, k, m, og, (3, 3, 3), (2, 2, 2), (1, 1, 1),
            col_cap=nco)[:2],
        (t4c_f, col_cell, okeys, omask),
    )

    print({k: round(v, 2) for k, v in results.items()})


if __name__ == "__main__":
    main()
