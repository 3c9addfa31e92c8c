"""Per-component cost breakdown of SECOND inference on real hardware.

Usage:
  python tools/profile_stages.py counts   # CPU: active voxels/columns/tiles per stage
  python tools/profile_stages.py time     # TPU: per-component timings (compiles a lot)

``counts`` informs the tile-sparse design (how many t x t BEV tiles are
active per stage, and the column occupancy inside active tiles).
``time`` measures voxelize / CNN(voxel) / CNN(column) / RPN / head at the
bench geometry (batch 8, 18k pts, full KITTI grid).
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def bench_clouds(batch=8, points=18000, seed=0):
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    from bench import kitti_like_points

    rng = np.random.default_rng(seed)
    clouds = []
    for _ in range(batch):
        p = kitti_like_points(rng, int(points * 1.6))
        if len(p) < points:
            p = np.concatenate([p, p[rng.integers(0, len(p), points - len(p))]])
        clouds.append(p[:points])
    return np.stack(clouds)


STAGES = [
    # (grid_zyx, C, n_subm, down spec or None)
    ((41, 1600, 1408), 16, 2, dict(kernel=(3, 3, 3), stride=(2, 2, 2), pad=(1, 1, 1))),
    ((21, 800, 704), 32, 2, dict(kernel=(3, 3, 3), stride=(2, 2, 2), pad=(1, 1, 1))),
    ((11, 400, 352), 64, 3, dict(kernel=(3, 3, 3), stride=(2, 2, 2), pad=(0, 1, 1))),
    ((5, 200, 176), 64, 3, dict(kernel=(3, 1, 1), stride=(2, 1, 1), pad=(0, 0, 0))),
]
# generous caps so ``counts`` measures TRUE dilation (undersized caps
# would truncate and under-report — the bug class this tool exists to kill)
CAPS = [20000, 120000, 120000, 80000, 60000]


def counts():
    import os

    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    from vision3d_tpu.config import Config
    from vision3d_tpu.core.voxelize import voxelize_np
    from vision3d_tpu.ops import sparse as sp

    cfg = Config()
    pts = bench_clouds()
    all_keys = []
    for b in range(pts.shape[0]):
        _, coords, _ = voxelize_np(pts[b], cfg)
        # column-major keys ((y*W + x)*D + z), matching sp.coords_to_keys /
        # downsample_active_set's decode — a row-major key here scrambles
        # coords and invalidates every dilation count downstream
        keys = np.asarray(
            sp.coords_to_keys(coords.astype(np.int32), (41, 1600, 1408))
        ).astype(np.int64)
        all_keys.append(np.sort(keys))

    import jax.numpy as jnp

    stage_keys = []  # list over stages of list over batch of key arrays
    cur = all_keys
    for si, (grid, _, _, down) in enumerate(STAGES):
        stage_keys.append(cur)
        nxt = []
        for k in cur:
            cap = CAPS[si + 1]
            kk = np.full(CAPS[si], sp.sentinel_key(grid), np.int32)
            kk[: len(k)] = k
            m = np.zeros(CAPS[si], bool)
            m[: len(k)] = True
            ok, om, _ = sp.downsample_active_set(
                jnp.asarray(kk), jnp.asarray(m), grid,
                down["kernel"], down["stride"], down["pad"], cap,
            )
            ok = np.asarray(ok)[np.asarray(om)]
            nxt.append(ok)
        cur = nxt
    stage_keys.append(cur)

    grids = [s[0] for s in STAGES] + [(2, 200, 176)]
    for si, (grid, keys) in enumerate(zip(grids, stage_keys)):
        d, h, w = grid
        nvox = np.mean([len(k) for k in keys])
        # column-major key: BEV cell (y*w + x) is just key // d
        bev = [np.unique(k // d) for k in keys]
        ncol = np.mean([len(b_) for b_ in bev])
        line = f"stage {si} grid {grid}: vox {nvox:.0f} col {ncol:.0f}"
        for t in (4, 8, 16):
            tiles = [
                np.unique((b_ // w // t) * ((w + t - 1) // t) + (b_ % w) // t)
                for b_ in bev
            ]
            nt = np.mean([len(x) for x in tiles])
            occ = ncol / max(nt * t * t, 1)
            line += f" | t{t}: {nt:.0f} tiles occ {occ*100:.0f}%"
        print(line)


def time_components():
    import time

    import jax
    import jax.numpy as jnp

    from tools.tpu_timing import timeit_scanned
    from vision3d_tpu.config import Config
    from vision3d_tpu.core.anchors import make_anchors
    from vision3d_tpu.models.head import ProposalHead, head_inference
    from vision3d_tpu.models.rpn import RPN
    from vision3d_tpu.models.second import Second, build_middle_input
    from vision3d_tpu.models.sparse_cnn import CNN_FACTORY
    from vision3d_tpu.core.voxelize import voxelize_batch

    results = {}

    def report(name, dt):
        results[name] = dt
        print(f"{name:28s} {dt*1e3:9.2f} ms/batch", flush=True)

    pts = jnp.asarray(bench_clouds())
    num = jnp.full((pts.shape[0],), pts.shape[1], jnp.int32)

    base = Config().replace(num_classes=1, anchors=Config().anchors[:1])
    for backend in ("voxel", "column"):
        cfg = base.replace(sparse_backend=backend)
        t0 = time.perf_counter()
        vox = jax.jit(lambda p, n: voxelize_batch(p, n, cfg))(pts, num)
        st = jax.jit(lambda v: build_middle_input(cfg, v))(vox)
        cnn = CNN_FACTORY[cfg.cnn](cfg)
        # jit the init: eager init dispatches thousands of tiny ops, each a
        # round-trip on remote-compile backends (minutes-to-hours of setup)
        vs = jax.jit(
            lambda r, s: cnn.init(r, s, False, need_scales=False)
        )(jax.random.PRNGKey(0), st)
        print(f"[{backend}] setup {time.perf_counter()-t0:.1f}s", flush=True)

        dt = timeit_scanned(
            lambda s: cnn.apply(vs, s, False, need_scales=False)[1], (st,),
            iters=10,
        )
        report(f"cnn_{backend}", dt)

    cfg = base
    dt = timeit_scanned(lambda p, n: voxelize_batch(p, n, cfg), (pts, num), iters=10)
    report("voxelize", dt)
    vox = jax.jit(lambda p, n: voxelize_batch(p, n, cfg))(pts, num)
    dt = timeit_scanned(lambda v: build_middle_input(cfg, v), (vox,), iters=10)
    report("build_input_voxel", dt)

    bev = jnp.zeros((pts.shape[0], 200, 176, 128), jnp.float32)
    rpn = RPN(c_down=128, c_up=128)
    vs = jax.jit(lambda r, b: rpn.init(r, b, False))(
        jax.random.PRNGKey(0), bev)
    dt = timeit_scanned(lambda b: rpn.apply(vs, b, False), (bev,), iters=10)
    report("rpn", dt)

    head = ProposalHead(cfg)
    feats = jnp.zeros((pts.shape[0], 200, 176, 128), jnp.float32)
    hv = jax.jit(head.init)(jax.random.PRNGKey(0), feats)
    anchors = jnp.asarray(make_anchors(cfg))
    dt = timeit_scanned(lambda f: head.apply(hv, f), (feats,), iters=10)
    report("head_maps", dt)
    cls_map, reg_map = jax.jit(lambda f: head.apply(hv, f))(feats)
    dt = timeit_scanned(
        lambda c, r: head_inference(c, r, anchors, cfg), (cls_map, reg_map),
        iters=10,
    )
    report("head_decode_nms", dt)

    print({k: round(v * 1e3, 2) for k, v in results.items()})


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    if mode == "counts":
        counts()
    else:
        time_components()
