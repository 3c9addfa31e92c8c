"""Training entry point (reference vision3d/train.py).

The reference hardcodes paths and hyperparameters in module scope
(SURVEY L6: no argparse anywhere); here the same defaults are exposed as
flags. Run:

    python -m vision3d_tpu.train_cli --config configs/second/car.yaml

Loop semantics match the reference (train.py:57-72): per-iteration LR
schedule, grad-clip 35, metrics every 10 steps, checkpoint every 3 epochs
and at the end — with the TPU differences that the whole step (target
assignment included) is one jit program and batches shard over the device
mesh.
"""

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

# Honor JAX_PLATFORMS even when an early jax import (e.g. an interpreter
# sitecustomize registering an experimental TPU platform) has already
# locked the backend choice: re-assert the env var through jax.config so
# `JAX_PLATFORMS=cpu python -m vision3d_tpu.train_cli ...` means CPU.
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None, help="reference-format YAML")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--ckpt-dir", default=None)
    ap.add_argument("--data-root", default=None, help="KITTI training/ dir")
    ap.add_argument("--split-dir", default=None)
    ap.add_argument("--cache-dir", default=None)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--metrics-jsonl", default="./metrics.jsonl")
    ap.add_argument("--workers", type=int, default=6,
                    help="data-loader worker processes (reference train.py:18)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--model", default="second",
                    choices=["second", "pvrcnn", "pvrcnn2"],
                    help="second (default) | pvrcnn (stage-1 proposal "
                         "training, the reference's trainable surface) | "
                         "pvrcnn2 (two-stage incl. refinement loss)")
    ap.add_argument("--dense-from", type=int, default=None,
                    help="cfg.train_dense_from_stage override. The default "
                         "(4, fully sparse training graph) fits full KITTI "
                         "geometry in 16GB HBM; lower values run late "
                         "stages as dense conv3d, whose backward "
                         "materializes 25-35GB of temporaries at full "
                         "geometry. Parameters are representation-"
                         "independent, so checkpoints trained at any "
                         "setting evaluate at any other.")
    args = ap.parse_args(argv)

    from vision3d_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from vision3d_tpu.config import Config
    from vision3d_tpu.data.kitti import KittiDatasetTrain
    from vision3d_tpu.data.loader import DataLoader
    from vision3d_tpu.parallel.mesh import (
        initialize_distributed, make_mesh, replicate, shard_batch,
    )

    # multi-host (one process per host): no-op single-process
    initialize_distributed()
    n_proc, proc_id = jax.process_count(), jax.process_index()
    from vision3d_tpu.training.checkpoint import maybe_resume, save_checkpoint
    from vision3d_tpu.training.metrics import JsonlWriter, MetricLogger, StdoutWriter
    from vision3d_tpu.training.train import create_train_state, make_train_step

    import dataclasses

    cfg = Config.from_yaml(args.config) if args.config else Config()
    overrides = {}
    if args.epochs:
        overrides["epochs"] = args.epochs
    if args.batch_size:
        overrides["batch_size"] = args.batch_size
    if args.ckpt_dir:
        overrides["ckpt_dir"] = args.ckpt_dir
    if overrides:
        cfg = cfg.replace(train=dataclasses.replace(cfg.train, **overrides))
    data_overrides = {}
    if args.data_root:
        data_overrides["rootdir"] = args.data_root
    if args.split_dir:
        data_overrides["splitdir"] = args.split_dir
    if args.cache_dir:
        data_overrides["cachedir"] = args.cache_dir
    if data_overrides:
        cfg = cfg.replace(data=dataclasses.replace(cfg.data, **data_overrides))
    if args.dense_from is not None:
        cfg = cfg.replace(train_dense_from_stage=args.dense_from)

    dataset = KittiDatasetTrain(cfg, rng=np.random.default_rng(args.seed),
                                verbose=proc_id == 0)
    # cfg.train.batch_size is the GLOBAL batch; each process loads and
    # collates only its own 1/n_proc shard of every epoch
    assert cfg.train.batch_size % n_proc == 0, (cfg.train.batch_size, n_proc)
    loader = DataLoader(dataset, cfg, seed=args.seed,
                        batch_size=cfg.train.batch_size // n_proc,
                        num_workers=args.workers,
                        num_shards=n_proc, shard_id=proc_id)
    steps_per_epoch = len(loader)

    if args.model == "second":
        model, tx, state = create_train_state(
            cfg, jax.random.PRNGKey(args.seed), steps_per_epoch
        )
    else:
        from vision3d_tpu.training.train import (
            create_pvrcnn_train_state, make_pvrcnn_train_step,
        )

        model, tx, state = create_pvrcnn_train_state(
            cfg, jax.random.PRNGKey(args.seed), steps_per_epoch,
            two_stage=args.model == "pvrcnn2",
        )
    start_epoch = 0
    if args.resume:
        state, start_epoch = maybe_resume(cfg.train.ckpt_dir, state)

    if n_proc > 1:
        # the global mesh spans every host; no device subsetting
        assert cfg.train.batch_size % jax.device_count() == 0
        mesh = make_mesh()
    else:
        # use the largest device count that divides the batch size
        devices = jax.devices()
        n = len(devices)
        while cfg.train.batch_size % n:
            n -= 1
        mesh = make_mesh(devices[:n])
        if n != len(devices):
            print(f"using {n}/{len(devices)} devices (batch {cfg.train.batch_size})")
    state = replicate(state, mesh)
    if args.model == "second":
        raw_step = make_train_step(model, tx, cfg)
    else:
        raw_step = make_pvrcnn_train_step(
            model, tx, cfg, train_stage2=args.model == "pvrcnn2",
            seed=args.seed,
        )
    step_fn = jax.jit(raw_step, donate_argnums=0)
    logger = MetricLogger(
        writers=[StdoutWriter(), JsonlWriter(args.metrics_jsonl)]
        if proc_id == 0 else []
    )

    import time

    step = int(jax.device_get(state.step))
    for epoch in range(start_epoch, cfg.train.epochs):
        t_epoch = time.perf_counter()
        t_host = 0.0
        t0 = time.perf_counter()
        for batch in loader:
            t_host += time.perf_counter() - t0
            batch.pop("frame_idx", None)
            batch = shard_batch(
                {k: jnp.asarray(v) for k, v in batch.items()}, mesh
            )
            state, losses = step_fn(state, batch)
            step += 1
            logger.update(step, losses)
            t0 = time.perf_counter()
        jax.block_until_ready(state.params)
        dt = time.perf_counter() - t_epoch
        n_frames = steps_per_epoch * cfg.train.batch_size
        if proc_id == 0:
            print(
                f"epoch {epoch}: {dt:.1f}s ({n_frames / dt:.1f} frames/s; "
                f"host wait {t_host:.1f}s = {t_host / dt:.0%})", flush=True,
            )
        # every-3-epochs semantics per the reference (train.py:71-72):
        # save after epochs 3, 6, ... and always after the last one.
        # (params are fully replicated, so process 0's copy is the model)
        if (epoch + 1) % cfg.train.ckpt_interval_epochs == 0 or epoch == cfg.train.epochs - 1:
            if proc_id == 0:
                path = save_checkpoint(cfg.train.ckpt_dir, state, epoch)
                print(f"saved {path}")
    if hasattr(loader, "close"):
        loader.close()


if __name__ == "__main__":
    main()
