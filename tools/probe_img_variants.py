"""TPU shootout of dense_record_image build strategies at stage-1
geometry (the round-5 bf16 sink-row scatter measured 56ms vs the
round-4 f32 RMW form's 19ms — this names the cheap variant).

Variants:
  f32_rmw    round-4: (B*HW+1, 4) f32, unsorted .at[].set (RMW class)
  bf16_sink  round-5: (B*(HW+1+NC), 9) bf16 byte planes, sorted+unique
  f32_sink   4-lane f32, sorted+unique sink rows
  i32_sink9  ONE int32 scatter of 3 packed lanes into sink rows, then a
             streaming elementwise unpack to the 9 bf16 byte planes
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


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

    # advance to stage 1 (grid (21,800,704), ~49k sites at bench density)
    g0 = (41, 1600, 1408)
    ok1, om1, _ = jax.jit(lambda k, m: jax.vmap(
        lambda kk, mm: sp.downsample_active_set(
            kk, mm, g0, (3, 3, 3), (2, 2, 2), (1, 1, 1),
            cfg.stage_voxel_capacity(1))
    )(k, m))(st0.keys, st0.mask)
    grid = (21, 800, 704)
    n = ok1.shape[1]
    t4c, _, _, _, col_cell = jax.jit(
        lambda k, m: sp.build_col_compact(k, m, grid, n, want_slotmap=False)
    )(ok1, om1)
    b = args.batch
    _, h, w = grid
    hw = h * w
    nc = t4c.shape[1] - 1

    def f32_rmw(t4c, col_cell):
        bidx = jnp.arange(b, dtype=jnp.int32)[:, None]
        addr = jnp.where(col_cell[:, :nc] < hw,
                         bidx * hw + col_cell[:, :nc], b * hw).reshape(-1)
        img = jnp.zeros((b * hw + 1, 4), jnp.float32).at[addr].set(
            t4c[:, :nc].reshape(-1, 4).astype(jnp.float32), mode="drop")[:-1]
        return img.reshape(b, h, w, 4)

    def f32_sink(t4c, col_cell):
        stride_r = hw + 1 + nc
        bidx = jnp.arange(b, dtype=jnp.int32)[:, None]
        slots = jnp.arange(nc, dtype=jnp.int32)[None, :]
        cc = col_cell[:, :nc]
        addr = jnp.where(cc < hw, bidx * stride_r + cc,
                         bidx * stride_r + hw + 1 + slots).reshape(-1)
        img = jnp.zeros((b * stride_r, 4), jnp.float32).at[addr].set(
            t4c[:, :nc].reshape(-1, 4).astype(jnp.float32),
            indices_are_sorted=True, unique_indices=True, mode="drop")
        return img.reshape(b, stride_r, 4)[:, :hw].reshape(b, h, w, 4)

    def bf16_sink(t4c, col_cell):
        return sp.dense_record_image(t4c, col_cell, grid)

    def i32_sink9(t4c, col_cell):
        stride_r = hw + 1 + nc
        bidx = jnp.arange(b, dtype=jnp.int32)[:, None]
        slots = jnp.arange(nc, dtype=jnp.int32)[None, :]
        cc = col_cell[:, :nc]
        addr = jnp.where(cc < hw, bidx * stride_r + cc,
                         bidx * stride_r + hw + 1 + slots).reshape(-1)
        packed = jnp.stack(
            [t4c[..., 0] | (t4c[..., 1] << 16), t4c[..., 2], t4c[..., 3]],
            axis=-1)  # (B, NC+1, 3) int32
        img = jnp.zeros((b * stride_r, 3), jnp.int32).at[addr].set(
            packed[:, :nc].reshape(-1, 3),
            indices_are_sorted=True, unique_indices=True, mode="drop")
        img = img.reshape(b, stride_r, 3)[:, :hw]
        w0 = img[..., 0] & 0xFFFF
        w1 = (img[..., 0] >> 16) & 0xFFFF
        t = jnp.stack([w0 & 255, w0 >> 8,
                       img[..., 1] & 255, img[..., 1] >> 8,
                       w1 & 255, w1 >> 8,
                       img[..., 2] & 255, (img[..., 2] >> 8) & 255,
                       (img[..., 2] >> 16) & 255], axis=-1)
        # NOTE: byte-plane order here is (w0, w2, w1, ...) scrambled — this
        # probe times traffic only; the real impl must order planes.
        return t.astype(jnp.bfloat16).reshape(b, h, w, 9)

    for name, fn in [("f32_rmw", f32_rmw), ("f32_sink", f32_sink),
                     ("bf16_sink", bf16_sink), ("i32_sink9", i32_sink9)]:
        dt = timeit_scanned(fn, (t4c, col_cell), iters=args.iters)
        print(f"s1.img.{name:12s} {dt*1e3:9.2f} ms", flush=True)

    # the consumers, for context
    img = jax.jit(bf16_sink)(t4c, col_cell)
    og = sp.out_grid_shape(grid, (3, 3, 3), (2, 2, 2), (1, 1, 1))
    dt = timeit_scanned(
        lambda i: sp.dense_shift_stack(i, grid, grid, (3, 3, 3),
                                       (1, 1, 1), (1, 1, 1)), (img,),
        iters=args.iters)
    print(f"s1.stack.subm          {dt*1e3:9.2f} ms", flush=True)
    dt = timeit_scanned(
        lambda i: sp.dense_shift_stack(i, grid, og, (3, 3, 3),
                                       (2, 2, 2), (1, 1, 1)), (img,),
        iters=args.iters)
    print(f"s1.stack.down          {dt*1e3:9.2f} ms", flush=True)
    stack_d = jax.jit(lambda i: sp.dense_shift_stack(
        i, grid, og, (3, 3, 3), (2, 2, 2), (1, 1, 1)))(img)
    dt = timeit_scanned(
        lambda sd: sp.downsample_from_stack(
            sd, grid[0], og, (3, 3, 3), (2, 2, 2), (1, 1, 1),
            cfg.stage_voxel_capacity(2)), (stack_d,), iters=args.iters)
    print(f"s1.downsample_from_stack {dt*1e3:7.2f} ms", flush=True)
    dt = timeit_scanned(
        lambda k, m: sp.plan_stage_batched(
            k, m, grid, (3, 3, 3), (2, 2, 2), (1, 1, 1),
            cfg.stage_voxel_capacity(2), subm_kernel=(3, 3, 3)),
        (ok1, om1), iters=args.iters)
    print(f"s1.plan_stage(total)   {dt*1e3:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()
