"""SECOND training-step benchmark on real hardware (full KITTI geometry).

Prints ONE JSON line with train-step latency, steps/s, frames/s and the
projected KITTI epoch time (3712 train frames), plus a forward-only
reference so the backward's cost is visible. The backward runs as
rulebook convs via custom VJPs (ops/sparse.py make_*_conv_vjp) — jax's
default gather VJP would be a ~750 ns/element scatter-add.

Reference anchor: the upstream trains ~10 min/epoch on an unstated GPU
(/root/reference/training.md:14).

Usage: python bench_train.py [--batch 8] [--iters 5]
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--points", type=int, default=18000)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--dense-from", type=int, default=4,
                    help="dense_from_stage for the TRAIN graph. Default 4 "
                         "(fully sparse): the dense stages' conv3d backward "
                         "materializes ~10 spatially-partitioned f32 temps "
                         "(~19GB > 16GB HBM at full geometry, measured r3); "
                         "the sparse conv-as-backward VJPs are memory-lean.")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/vision3d_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from bench import kitti_like_points
    from vision3d_tpu.config import Config
    from vision3d_tpu.training.train import create_train_state, make_train_step

    cfg = Config()
    cfg = cfg.replace(
        num_classes=1, anchors=cfg.anchors[:1], compute_dtype=args.dtype,
        train_dense_from_stage=args.dense_from,
    )
    if args.quick:
        cfg = cfg.replace(
            max_voxels=4096,
            voxel_size=(0.1, 0.1, 0.1),
            grid_bounds=(0.0, -19.2, -3.0, 38.4, 19.2, 1.0),
        )
        args.batch, args.points, args.iters = 2, 6000, 2

    rng = np.random.default_rng(0)
    P, B = args.points, args.batch
    clouds = []
    for _ in range(B):
        p = kitti_like_points(rng, int(P * 1.6))
        if len(p) < P:
            p = np.concatenate([p, p[rng.integers(0, len(p), P - len(p))]])
        clouds.append(p[:P])
    G = 32
    boxes = np.zeros((B, G, 7), np.float32)
    boxes[..., 0] = rng.uniform(5, 60, (B, G))
    boxes[..., 1] = rng.uniform(-30, 30, (B, G))
    boxes[..., 2] = -1.0
    boxes[..., 3:6] = [1.6, 3.9, 1.56]
    boxes[..., 6] = rng.uniform(-np.pi, np.pi, (B, G))
    batch = dict(
        points=jnp.asarray(np.stack(clouds)),
        num_points=jnp.full((B,), P, jnp.int32),
        boxes=jnp.asarray(boxes),
        class_idx=jnp.zeros((B, G), jnp.int32),
        gt_mask=jnp.asarray(rng.uniform(size=(B, G)) < 0.5),
        box_ignore=jnp.zeros((B, G), bool),
    )

    model, tx, state = create_train_state(
        cfg, jax.random.PRNGKey(0), steps_per_epoch=928,
        example_batch=(batch["points"][:1], batch["num_points"][:1]),
    )
    train_step = make_train_step(model, tx, cfg)

    # chain iters train steps in ONE jit program: the state carry is a
    # true data dependency, and the input perturbation (a loss-dependent
    # epsilon on the points) stops target assignment from being hoisted.
    def chained(state, batch):
        def body(carry, _):
            st, eps = carry
            b2 = dict(batch, points=batch["points"] + eps)
            st2, losses = train_step(st, b2)
            return (st2, losses["loss"].astype(jnp.float32) * 1e-20), None

        (st, eps), _ = jax.lax.scan(
            body, (state, jnp.float32(0.0)), None, length=args.iters
        )
        return st.step, eps

    f = jax.jit(chained)

    t0 = time.perf_counter()
    out = f(state, batch)
    np.asarray(out[1])
    compile_s = time.perf_counter() - t0

    trivial = jax.jit(lambda x: x + 1)
    np.asarray(trivial(jnp.ones(())))
    t0 = time.perf_counter()
    np.asarray(trivial(jnp.ones(())))
    rt = time.perf_counter() - t0

    per_step = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        out = f(state, batch)
        np.asarray(out[1])
        per_step.append(max(time.perf_counter() - t0 - rt, 1e-9) / args.iters)

    p50 = float(np.median(per_step))
    best = float(min(per_step))
    frames_s = B / p50
    epoch_s = 3712 / frames_s
    print(json.dumps({
        "metric": "second_train_step_ms",
        "value": round(p50 * 1e3, 1),
        "unit": "ms/step",
        "step_ms_best": round(best * 1e3, 1),
        "train_frames_per_sec": round(frames_s, 2),
        "epoch_minutes_kitti3712": round(epoch_s / 60, 2),
        "batch": B,
        "points_per_frame": P,
        "compile_s": round(compile_s, 1),
        "dtype": args.dtype,
        "device": str(jax.devices()[0]),
        "backward": "rulebook-conv custom VJPs (no scatter-add)",
    }))


if __name__ == "__main__":
    main()
