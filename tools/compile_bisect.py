"""Bisect where XLA compile time goes in the SECOND inference graph.

Times jit lowering + compilation of successive pipeline prefixes at full
KITTI geometry (voxelize, +VFE, +stage0..3, +RPN, +decode/NMS) plus the
full graph wrapped in the bench's 20-iteration chained scan, printing
seconds per prefix. Run on CPU (JAX_PLATFORMS=cpu, shapes matter — not
data) or on the TPU (remote compiler) to see which side is slow.

    python tools/compile_bisect.py [--quick] [--scan-iters 20]

The persistent compilation cache is intentionally DISABLED here: the
point is to measure cold compiles.
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--scan-iters", type=int, default=20)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vision3d_tpu.config import Config
    from vision3d_tpu.core.anchors import make_anchors
    from vision3d_tpu.models.second import Second, create_second

    cfg = Config().replace(
        num_classes=1, anchors=Config().anchors[:1], compute_dtype=args.dtype
    )
    if args.quick:
        cfg = cfg.replace(
            max_voxels=4096,
            voxel_size=(0.1, 0.1, 0.1),
            grid_bounds=(0.0, -19.2, -3.0, 38.4, 19.2, 1.0),
        )
        args.batch = 2

    B, P = args.batch, 18000 if not args.quick else 6000
    rng = np.random.default_rng(0)
    lo, hi = np.asarray(cfg.grid_bounds[:3]), np.asarray(cfg.grid_bounds[3:])
    pts = np.concatenate(
        [rng.uniform(lo, hi, (B, P, 3)), rng.uniform(0, 1, (B, P, 1))], -1
    ).astype(np.float32)
    points = jnp.asarray(pts)
    num = jnp.full((B,), P, jnp.int32)
    model, variables = create_second(cfg, jax.random.PRNGKey(0),
                                     (points[:1], num[:1]))
    anchors = jnp.asarray(make_anchors(cfg))

    def timed_compile(name, fn, *xs):
        t0 = time.perf_counter()
        lowered = jax.jit(fn).lower(*xs)
        t_lower = time.perf_counter() - t0
        t0 = time.perf_counter()
        lowered.compile()
        t_comp = time.perf_counter() - t0
        print(f"{name:28s} lower {t_lower:7.1f}s   compile {t_comp:7.1f}s",
              flush=True)

    def prefix(n_stages, with_rpn=False, with_nms=False):
        def fn(points, num):
            return model.apply(
                variables, points, num, anchors, method=Second.inference_prefix,
                n_stages=n_stages, with_rpn=with_rpn, with_nms=with_nms,
            )
        return fn

    # full graph single-shot and scan-chained (what bench.py compiles)
    def full(points, num):
        return model.apply(variables, points, num, anchors,
                           method=Second.inference)

    def chained(points, num):
        def body(carry, _):
            det = full(points + carry * 1e-12, num)
            return (det.scores.sum() + det.boxes.sum() * 1e-6).astype(
                jnp.float32
            ), None
        tot, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                              length=args.scan_iters)
        return tot

    if hasattr(Second, "inference_prefix"):
        for n in range(0, 5):
            timed_compile(f"prefix: {n} stages", prefix(n), points, num)
        timed_compile("prefix: +rpn", prefix(4, True), points, num)
        timed_compile("prefix: +nms", prefix(4, True, True), points, num)
    timed_compile("full inference", full, points, num)
    timed_compile(f"chained x{args.scan_iters}", chained, points, num)


if __name__ == "__main__":
    main()
