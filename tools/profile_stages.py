"""Per-stage TPU timing for the SECOND pipeline (development tool)."""

import argparse
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def timeit(fn, *args, iters=10):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / iters, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--points", type=int, default=6000)
    ap.add_argument("--full", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vision3d_tpu.config import Config
    from vision3d_tpu.core.anchors import make_anchors
    from vision3d_tpu.core.voxelize import mean_vfe, voxelize_batch
    from vision3d_tpu.models.head import head_inference
    from vision3d_tpu.models.second import Second, create_second
    from vision3d_tpu.models.sparse_cnn import from_voxels

    cfg = Config().replace(num_classes=1, anchors=Config().anchors[:1])
    if not args.full:
        cfg = cfg.replace(
            max_voxels=4096,
            voxel_size=(0.1, 0.1, 0.1),
            grid_bounds=(0.0, -19.2, -3.0, 38.4, 19.2, 1.0),
        )

    rng = np.random.default_rng(0)
    lo = np.asarray(cfg.grid_bounds[:3])
    hi = np.asarray(cfg.grid_bounds[3:])
    pts = np.concatenate(
        [
            rng.uniform(lo, hi, (args.batch, args.points, 3)),
            rng.uniform(0, 1, (args.batch, args.points, 1)),
        ],
        -1,
    ).astype(np.float32)
    points = jnp.asarray(pts)
    num = jnp.full((args.batch,), args.points, jnp.int32)

    model, variables = create_second(cfg, jax.random.PRNGKey(0), (points[:1], num[:1]))
    anchors = jnp.asarray(make_anchors(cfg))

    vox_fn = jax.jit(lambda p, n: voxelize_batch(p, n, cfg))
    t, vox = timeit(vox_fn, points, num)
    print(f"voxelize:      {t*1e3:8.2f} ms")

    feats = mean_vfe(vox["features"], vox["occupancy"])
    st = from_voxels(feats, vox["coords"], vox["voxel_mask"], cfg.grid_shape_zyx)

    cnn_fn = jax.jit(
        lambda st: model.apply(variables, st, False,
                               method=lambda m, s, tr: m.cnn(s, tr))
    )
    t, (scales, bev) = timeit(cnn_fn, st)
    print(f"sparse cnn:    {t*1e3:8.2f} ms")

    rpn_fn = jax.jit(
        lambda b: model.apply(variables, b, False,
                              method=lambda m, x, tr: m.rpn(x, tr))
    )
    t, bev2 = timeit(rpn_fn, bev)
    print(f"rpn:           {t*1e3:8.2f} ms")

    head_fn = jax.jit(
        lambda b: model.apply(variables, b, method=lambda m, x: m.head(x))
    )
    t, (cls_map, reg_map) = timeit(head_fn, bev2)
    print(f"head convs:    {t*1e3:8.2f} ms")

    post_fn = jax.jit(lambda c, r: head_inference(c, r, anchors, cfg))
    t, det = timeit(post_fn, cls_map, reg_map)
    print(f"decode+nms:    {t*1e3:8.2f} ms")

    full_fn = jax.jit(
        lambda p, n: model.apply(variables, p, n, anchors, method=Second.inference)
    )
    t, _ = timeit(full_fn, points, num)
    print(f"full pipeline: {t*1e3:8.2f} ms  ({args.batch / t:.1f} fps)")


if __name__ == "__main__":
    main()
