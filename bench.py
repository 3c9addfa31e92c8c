"""SECOND inference benchmark on real hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
Baseline target: >= 500 KITTI frames/sec/chip on TPU v5e (BASELINE.md).

Measures the full single-graph pipeline — voxelize -> sparse CNN -> RPN ->
head decode -> rotated NMS — at the reference's full KITTI geometry
(voxel 0.05x0.05x0.1, grid 41x1600x1408, 20k voxel cap, top-100, car
config), on synthetic KITTI-density clouds. ``--quick`` shrinks shapes
for a fast smoke run.
"""

import argparse
import json
import time

import numpy as np


def kitti_like_points(rng, n):
    """Synthetic cloud with KITTI-like structure: a ground plane, box-like
    objects and vertical clutter at radial density. The z distribution
    matters beyond realism — sparse-conv active-set dilation (and thus the
    cost of every CNN stage) depends on the cloud being surface-like, as
    LiDAR returns are, rather than volume-filling."""
    n_ground = int(n * 0.45)
    n_obj = int(n * 0.35)
    n_clut = n - n_ground - n_obj

    def radial(m):
        r = 3.0 + 67.0 * rng.beta(1.2, 2.2, m)
        th = rng.uniform(-0.7, 0.7, m)
        return r * np.cos(th), r * np.sin(th)

    gx, gy = radial(n_ground)
    gz = -1.73 + 0.05 * rng.standard_normal(n_ground) + 0.008 * gx

    n_boxes = 40
    cx, cy = radial(n_boxes)
    cw = rng.uniform(0.5, 2.2, n_boxes)
    cl = rng.uniform(0.5, 4.5, n_boxes)
    ch = rng.uniform(1.0, 2.2, n_boxes)
    bi = rng.integers(0, n_boxes, n_obj)
    # points on box surfaces (visible faces)
    u = rng.uniform(-0.5, 0.5, n_obj)
    v = rng.uniform(0, 1, n_obj)
    face = rng.integers(0, 2, n_obj)
    ox = cx[bi] + np.where(face == 0, -0.5 * cl[bi], u * cl[bi])
    oy = cy[bi] + np.where(face == 0, u * cw[bi], -0.5 * cw[bi])
    oz = -1.7 + v * ch[bi]

    tx, ty = radial(n_clut)
    tz = -1.7 + 2.8 * rng.beta(1.1, 2.5, n_clut)

    x = np.concatenate([gx, ox, tx])
    y = np.concatenate([gy, oy, ty])
    z = np.concatenate([gz, oz, tz])
    i = rng.uniform(0, 1, (len(x), 1))
    keep = (x > 0) & (x < 70.4) & (np.abs(y) < 40) & (z > -3) & (z < 1)
    pts = np.concatenate([np.stack([x, y, z], -1), i], -1).astype(np.float32)
    pts = pts[keep]
    return pts[rng.permutation(len(pts))]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--points", type=int, default=18000)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=5,
                    help="timed repetitions; headline is the p50")
    ap.add_argument("--quick", action="store_true")
    # bf16 compute is the TPU-idiomatic production setting (params, BN and
    # accumulation stay f32); pass --dtype float32 for bit-strict runs
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--backend", default=None,
                    help="sparse backend override: voxel | column")
    ap.add_argument("--dense-from", type=int, default=None,
                    help="override cfg.dense_from_stage (2=default, 3=run "
                         "stage 2 sparse)")
    ap.add_argument("--model", default="second",
                    choices=["second", "pvrcnn", "pvrcnn2"],
                    help="pvrcnn = stage-1 proposal path; pvrcnn2 = full "
                         "two-stage (RoI grid pool + refinement)")
    args = ap.parse_args()

    import jax

    # persistent compilation cache: repeat bench runs (and any same-shape
    # production process) skip XLA recompilation entirely
    jax.config.update("jax_compilation_cache_dir", "/tmp/vision3d_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from vision3d_tpu.config import Config
    from vision3d_tpu.core.anchors import make_anchors
    from vision3d_tpu.models.second import Second, create_second

    cfg = Config()
    cfg = cfg.replace(
        num_classes=1,
        anchors=cfg.anchors[:1],
        compute_dtype=args.dtype,
    )
    if args.backend:
        cfg = cfg.replace(sparse_backend=args.backend)
    if args.dense_from is not None:
        cfg = cfg.replace(dense_from_stage=args.dense_from)
    if args.quick:
        cfg = cfg.replace(
            max_voxels=4096,
            voxel_size=(0.1, 0.1, 0.1),
            grid_bounds=(0.0, -19.2, -3.0, 38.4, 19.2, 1.0),
        )
        args.batch, args.points, args.iters = 2, 6000, 5

    # scale over every visible chip: per-chip batch stays args.batch, the
    # global batch is sharded over a 1-D data mesh (the day 8 chips exist,
    # the v5e-8 aggregate number is this same command)
    ndev = jax.device_count()
    total_batch = args.batch * ndev

    rng = np.random.default_rng(0)
    P = args.points
    clouds = []
    for _ in range(total_batch):
        p = kitti_like_points(rng, int(P * 1.6))
        if len(p) < P:
            p = np.concatenate([p, p[rng.integers(0, len(p), P - len(p))]])
        clouds.append(p[:P])
    points = jnp.asarray(np.stack(clouds))
    num = jnp.full((total_batch,), P, jnp.int32)

    anchors = jnp.asarray(make_anchors(cfg))
    if args.model == "second":
        model, variables = create_second(
            cfg, jax.random.PRNGKey(0), (points[:1], num[:1])
        )
        infer_method, extra = Second.inference, {}
    else:
        from vision3d_tpu.models.pvrcnn import PV_RCNN, create_pvrcnn

        model, variables = create_pvrcnn(
            cfg, jax.random.PRNGKey(0), (points[:1], num[:1]),
            two_stage=args.model == "pvrcnn2",
        )
        if args.model == "pvrcnn2":
            infer_method = PV_RCNN.inference_two_stage
            extra = dict(rng=jax.random.PRNGKey(0))
        else:
            infer_method, extra = PV_RCNN.inference, {}

    if ndev > 1:
        from vision3d_tpu.parallel import mesh as pmesh

        mesh = pmesh.make_mesh()
        points, num = pmesh.shard_batch((points, num), mesh)
        variables = pmesh.replicate(variables, mesh)
        anchors = pmesh.replicate(anchors, mesh)

    def infer(points, num):
        return model.apply(
            variables, points, num, anchors, method=infer_method, **extra
        )

    # capacity-overflow diagnostics (outside the timed loop): stage_dropped
    # MUST be all zeros — non-zero means the static stage capacities
    # truncated real active sites and the throughput below priced a
    # partially-blanked network (the round-1 bug class).
    _, diag = jax.jit(
        lambda p, n: model.apply(
            variables, p, n, anchors, method=infer_method,
            mutable=["diagnostics"], **extra,
        )
    )(points, num)
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(diag)[0]:
        name = "/".join(
            getattr(k, "key", getattr(k, "idx", "")).__str__() for k in path
        )
        flat[name] = flat.get(name, 0) + int(np.asarray(leaf).sum())
    # every capacity-overflow counter the graph sows: voxel-backend
    # stage{i}_dropped, column-backend columns_dropped / input col drops,
    # and the densify cutover's stage{i}_densify_dropped
    stage_dropped = [
        v for k, v in sorted(flat.items())
        if "dropped" in k and "voxelizer" not in k
    ]
    vox_dropped = sum(v for k, v in flat.items() if "voxelizer" in k)

    # The host<->device link in some environments has tens of ms of
    # round-trip latency and an unreliable block_until_ready, so we chain
    # ``iters`` executions inside ONE jit program via lax.scan (with a
    # data-dependent perturbation so iterations cannot be CSE'd), read
    # back a scalar once, and divide.
    def chained(points, num):
        def body(carry, _):
            det = infer(points + carry * 1e-12, num)
            s = det.scores.sum() + det.boxes.sum() * 1e-6
            return s.astype(jnp.float32), None

        total, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=args.iters)
        return total

    f = jax.jit(chained)
    t_compile = time.perf_counter()
    np.asarray(f(points, num))  # compile + execute once
    compile_s = time.perf_counter() - t_compile

    trivial = jax.jit(lambda x: x + 1)
    np.asarray(trivial(jnp.ones(())))
    t0 = time.perf_counter()
    np.asarray(trivial(jnp.ones(())))
    rt_latency = time.perf_counter() - t0

    reps = []
    for _ in range(args.warmup):
        t0 = time.perf_counter()
        np.asarray(f(points, num))
        reps.append(time.perf_counter() - t0)
    per_iter = [max(r - rt_latency, 1e-9) / args.iters for r in reps]
    best, p50 = min(per_iter), float(np.median(per_iter))

    # headline = p50 of the repetitions (round-2 VERDICT: standardize on
    # p50 of >= 5 reps; best-rep is still reported for reference)
    fps_aggregate = total_batch / p50
    fps = fps_aggregate / ndev  # headline metric is per chip
    # BASELINE.json's >=500 f/s target is for a v5e-8 (8 chips); per chip
    # that is 62.5 f/s — vs_baseline compares like with like.
    baseline_fps = 500.0 / 8.0
    print(
        json.dumps(
            {
                "metric": f"{args.model}_inference_frames_per_sec_per_chip"
                if args.model != "second"
                else "second_inference_frames_per_sec_per_chip",
                "value": round(float(fps), 2),
                "unit": "frames/s",
                "vs_baseline": round(float(fps) / baseline_fps, 4),
                "n_devices": ndev,
                "aggregate_frames_per_sec": round(float(fps_aggregate), 2),
                # honest latency: executions are serialized inside one jit
                # scan (data dependency through the carry), so per-iteration
                # time IS the on-device latency of one batch; a frame's
                # latency equals its batch's latency at this batch size.
                # One measured host round-trip is subtracted from each
                # chain total before dividing (it is reported separately —
                # a real client pays it once per request).
                "batch_latency_ms_p50": round(p50 * 1e3, 3),
                "batch_latency_ms_best": round(best * 1e3, 3),
                "host_roundtrip_ms": round(rt_latency * 1e3, 3),
                "latency_method": "chained-scan, serialized batches",
                "batch": args.batch,
                "points_per_frame": args.points,
                "compile_s": round(compile_s, 1),
                "device": str(jax.devices()[0]),
                "dtype": args.dtype,
                # Round-1 numbers are NOT comparable: per-stage capacities
                # then truncated up to 88% of the dilated active sets
                # (whole BEV regions were silently dropped); capacities
                # now cover the measured spconv dilation like the
                # reference's dynamic kernels do.
                "stage_capacities": [
                    cfg.stage_column_capacity(i)
                    if cfg.sparse_backend == "column"
                    else cfg.stage_voxel_capacity(i)
                    for i in range(5)
                ],
                "sparse_backend": cfg.sparse_backend,
                "dense_from_stage": cfg.dense_from_stage,
                # all-zero = no capacity truncated any real active site on
                # this workload (runtime overflow detector, VERDICT r2 #4)
                "stage_dropped": stage_dropped,
                "voxelizer_dropped_reference_semantics": vox_dropped,
            }
        )
    )


if __name__ == "__main__":
    main()
