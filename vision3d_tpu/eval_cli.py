"""KITTI validation evaluation: run SECOND over a split, report 3D AP@R40.

    python -m vision3d_tpu.eval_cli --config configs/second/car.yaml \
        --ckpt ./ckpts/epoch_12 --split val

The reference has no evaluation at all (SURVEY §6); this closes the loop
for the Car 3D AP parity target in BASELINE.md.
"""

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

# see train_cli: make JAX_PLATFORMS effective despite early jax imports
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def run_eval(cfg, model, variables, dataset, batch_size=8, verbose=True,
             model_kind="second"):
    from vision3d_tpu.core.anchors import make_anchors
    from vision3d_tpu.data.loader import DataLoader
    from vision3d_tpu.eval.kitti_eval import evaluate_all
    from vision3d_tpu.models.head import extract_detections
    from vision3d_tpu.models.second import Second

    anchors = jnp.asarray(make_anchors(cfg))
    if model_kind == "second":
        method, extra = Second.inference, {}
    else:
        from vision3d_tpu.models.pvrcnn import PV_RCNN

        if model_kind == "pvrcnn2":
            method = PV_RCNN.inference_two_stage
            extra = dict(rng=jax.random.PRNGKey(0))
        else:
            method, extra = PV_RCNN.inference, {}
    infer = jax.jit(
        lambda p, n: model.apply(variables, p, n, anchors, method=method,
                                 **extra)
    )
    loader = DataLoader(dataset, cfg, batch_size=batch_size, shuffle=False,
                        drop_last=False)
    detections, ground_truths = [], []
    for batch in loader:
        det = infer(jnp.asarray(batch["points"]), jnp.asarray(batch["num_points"]))
        per_sample = extract_detections(det)
        for b, d in enumerate(per_sample):
            fi = int(batch["frame_idx"][b])
            if fi < 0:
                continue
            anno = dataset.annotations[fi]
            detections.append(d)
            ground_truths.append(
                dict(
                    boxes=anno["boxes"],
                    class_idx=np.asarray(anno["class_idx"]),
                    levels=np.asarray(anno.get("levels", np.ones(len(anno["boxes"])))),
                )
            )
    table = evaluate_all(detections, ground_truths, cfg.num_classes)
    if verbose:
        for c, row in table.items():
            name = cfg.anchors[c].names[0] if c < len(cfg.anchors) else str(c)
            print(f"{name}: " + " ".join(f"{k}={v:.2f}" for k, v in row.items()))
    return table


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--split", default="val")
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--data-root", default=None, help="KITTI training/ dir")
    ap.add_argument("--split-dir", default=None)
    ap.add_argument("--cache-dir", default=None)
    ap.add_argument("--out-json", default=None)
    ap.add_argument("--model", default="second",
                    choices=["second", "pvrcnn", "pvrcnn2"])
    args = ap.parse_args(argv)

    import dataclasses

    from vision3d_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from vision3d_tpu.config import Config
    from vision3d_tpu.data.kitti import KittiDataset
    from vision3d_tpu.training.checkpoint import load_checkpoint
    from vision3d_tpu.training.train import create_train_state

    cfg = Config.from_yaml(args.config) if args.config else Config()
    data_overrides = {}
    if args.data_root:
        data_overrides["rootdir"] = args.data_root
    if args.split_dir:
        data_overrides["splitdir"] = args.split_dir
    if args.cache_dir:
        data_overrides["cachedir"] = args.cache_dir
    if data_overrides:
        cfg = cfg.replace(data=dataclasses.replace(cfg.data, **data_overrides))
    dataset = KittiDataset(cfg, split=args.split)
    if args.model == "second":
        model, tx, state = create_train_state(cfg, jax.random.PRNGKey(0))
    else:
        from vision3d_tpu.training.train import create_pvrcnn_train_state

        model, tx, state = create_pvrcnn_train_state(
            cfg, jax.random.PRNGKey(0), two_stage=args.model == "pvrcnn2",
        )
    if args.ckpt:
        state = load_checkpoint(args.ckpt, state)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    table = run_eval(cfg, model, variables, dataset, args.batch_size,
                     model_kind=args.model)
    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump(table, f, indent=2)


if __name__ == "__main__":
    main()
