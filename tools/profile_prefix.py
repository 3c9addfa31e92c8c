"""Composed end-to-end cost ladder: time Second.inference_prefix at each
pipeline cut (stage 0..4 CNN, +RPN/head, +decode/NMS) and report the
DIFFS. Unlike tools/profile_plan.py (isolated per-op timings), this
attributes the full measured batch latency — BN/ReLU, layout moves,
casts, the dense cutover and the head are all priced where they run.

Usage: python tools/profile_prefix.py [--batch 8] [--iters 10]
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
    ap.add_argument("--dense-from", type=int, default=None)
    ap.add_argument("--cuts", default="",
                    help="comma list of cut names to run (default: all). "
                         "Names: stage0..stage4, rpn_head, decode_nms. "
                         "Remote-compile services can take ~10min per fresh "
                         "graph — pick 2-3 cuts when iterating.")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/vision3d_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from tools.profile_stages import bench_clouds
    from tools.tpu_timing import timeit_scanned
    from vision3d_tpu.config import Config
    from vision3d_tpu.core.anchors import make_anchors
    from vision3d_tpu.models.second import Second

    cfg = Config().replace(num_classes=1, compute_dtype="bfloat16")
    cfg = cfg.replace(anchors=cfg.anchors[:1])
    if args.dense_from is not None:
        cfg = cfg.replace(dense_from_stage=args.dense_from)
    model = Second(cfg)
    pts = jnp.asarray(bench_clouds(args.batch, args.points))
    num = jnp.full((args.batch,), args.points, jnp.int32)
    anchors = jnp.asarray(make_anchors(cfg))
    variables = jax.jit(
        lambda p, n: model.init(jax.random.PRNGKey(0), p, n, train=False)
    )(pts, num)

    cuts = [("stage%d" % k, dict(n_stages=k)) for k in range(5)]
    cuts += [("rpn_head", dict(with_rpn=True)),
             ("decode_nms", dict(with_rpn=True, with_nms=True))]
    if args.cuts:
        want = set(args.cuts.split(","))
        cuts = [c for c in cuts if c[0] in want]
    prev, prev_name = 0.0, "start"
    for name, kw in cuts:
        def fn(p, n, kw=kw):
            return model.apply(variables, p, n, anchors,
                               method=Second.inference_prefix, **kw)
        dt = timeit_scanned(fn, (pts, num), iters=args.iters) * 1e3
        print(f"{name:12s} cum {dt:8.2f} ms   +{dt - prev:7.2f} "
              f"(over {prev_name})", flush=True)
        prev, prev_name = dt, name


if __name__ == "__main__":
    main()
