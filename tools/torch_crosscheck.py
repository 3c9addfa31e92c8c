"""AP cross-check: our trained SECOND vs the torch restatement.

Loads a vision3d-tpu checkpoint, converts its weights INTO the reference
state_dict layout (the exact inverse of tools/convert_checkpoint.py),
runs the torch dense-grid restatement of the reference network
(tests/test_parity_stack.py — reference SpMiddleFHD/RPN/head semantics,
torch ops) over validation frames, pushes both models' maps through the
same decode+NMS, and scores both with the official-protocol evaluator.
Agreement of the two AP numbers (and per-frame box deltas) demonstrates
the checkpoint-converter + network parity on REAL trained weights, not
just the random-weight unit parity test.

The torch path materializes the full dense voxel grid per frame, so this
runs on a frame subset (--frames, default 16).

Usage:
    python tools/torch_crosscheck.py --ckpt ./ckpts/epoch_N \
        --config configs/second/car.yaml --data-root .../training/ \
        --split-dir .../splitfiles/ --cache-dir .../cache/ [--frames 16]
"""

import argparse
import dataclasses
import importlib.util
import json
import pathlib
import sys

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def load_parity_module():
    spec = importlib.util.spec_from_file_location(
        "parity_stack", ROOT / "tests" / "test_parity_stack.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def invert_to_torch_sd(variables, cfg):
    """flax Second variables -> reference state_dict (numpy tensors);
    inverse of tools/convert_checkpoint.convert_state_dict."""
    import torch

    p = variables["params"]
    s = variables["batch_stats"]
    sd = {}

    def put_bn(bn_key, scale, bias, mean, var):
        sd[f"{bn_key}.weight"] = torch.tensor(np.asarray(scale))
        sd[f"{bn_key}.bias"] = torch.tensor(np.asarray(bias))
        sd[f"{bn_key}.running_mean"] = torch.tensor(np.asarray(mean))
        sd[f"{bn_key}.running_var"] = torch.tensor(np.asarray(var))

    spec = [2, 2, 3, 3]
    subm_i = down_i = 0
    for b, n_subm in enumerate(spec):
        for l in range(n_subm + 1):
            if l == n_subm:
                name = f"SparseConvDown_{down_i}"
                down_i += 1
            else:
                name = f"SubMConv_{subm_i}"
                subm_i += 1
            k = np.asarray(p["cnn"][name]["kernel"])
            kcin, cout = k.shape
            # down-conv kernels can be (3,1,1) etc: infer from stage plan
            kshape = (3, 3, 3)
            if l == n_subm and b == 3:
                kshape = (3, 1, 1)
            cin = kcin // int(np.prod(kshape))
            sd[f"cnn.blocks.{b}.{l}.0.weight"] = torch.tensor(
                k.reshape(*kshape, cin, cout)
            )
            bnp = p["cnn"][name]["MaskedBatchNorm_0"]
            bns = s["cnn"][name]["MaskedBatchNorm_0"]
            put_bn(f"cnn.blocks.{b}.{l}.1", bnp["scale"], bnp["bias"],
                   bns["mean"], bns["var"])

    torch_layers = [(1, 2)] + [(3 * i + 4, 3 * i + 5) for i in range(5)]
    for i, (ci, bi) in enumerate(torch_layers):
        k = np.asarray(p["rpn"][f"ConvBNReLU_{i}"]["Conv_0"]["kernel"])
        sd[f"rpn.down_block.{ci}.weight"] = torch.tensor(
            np.transpose(k, (3, 2, 0, 1))
        )
        bnp = p["rpn"][f"ConvBNReLU_{i}"]["BatchNorm_0"]
        bns = s["rpn"][f"ConvBNReLU_{i}"]["BatchNorm_0"]
        put_bn(f"rpn.down_block.{bi}", bnp["scale"], bnp["bias"],
               bns["mean"], bns["var"])
    k = np.asarray(p["rpn"]["ConvBNReLU_6"]["Conv_0"]["kernel"])
    sd["rpn.up_block.0.weight"] = torch.tensor(np.transpose(k, (3, 2, 0, 1)))
    bnp = p["rpn"]["ConvBNReLU_6"]["BatchNorm_0"]
    bns = s["rpn"]["ConvBNReLU_6"]["BatchNorm_0"]
    put_bn("rpn.up_block.1", bnp["scale"], bnp["bias"], bns["mean"],
           bns["var"])

    import torch as _t

    n_cls, n_yaw, dof = cfg.num_classes, cfg.num_yaw, cfg.box_dof
    kc = np.asarray(p["head"]["Conv_0"]["kernel"])
    sd["head.conv_cls.weight"] = _t.tensor(np.transpose(kc, (3, 2, 0, 1)))
    sd["head.conv_cls.bias"] = _t.tensor(np.asarray(p["head"]["Conv_0"]["bias"]))
    kr = np.transpose(np.asarray(p["head"]["Conv_1"]["kernel"]), (3, 2, 0, 1))
    br = np.asarray(p["head"]["Conv_1"]["bias"])
    cout = n_cls * n_yaw * dof
    # inverse of reg_head_permute: ours (cls, yaw, dof) -> torch (cls, dof, yaw)
    perm = (
        np.arange(cout).reshape(n_cls, n_yaw, dof).transpose(0, 2, 1).reshape(-1)
    )
    sd["head.conv_reg.weight"] = _t.tensor(kr[perm])
    sd["head.conv_reg.bias"] = _t.tensor(br[perm])
    return sd


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--config", default=None)
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--split-dir", required=True)
    ap.add_argument("--cache-dir", required=True)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--out-json", default=None)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import torch

    from vision3d_tpu.config import Config
    from vision3d_tpu.core.anchors import make_anchors
    from vision3d_tpu.core.voxelize import mean_vfe, voxelize_batch
    from vision3d_tpu.data.kitti import KittiDataset
    from vision3d_tpu.data.loader import pad_points
    from vision3d_tpu.eval.kitti_eval import evaluate_all
    from vision3d_tpu.models.head import extract_detections, head_inference
    from vision3d_tpu.models.second import Second
    from vision3d_tpu.training.checkpoint import load_checkpoint
    from vision3d_tpu.training.train import create_train_state

    parity = load_parity_module()

    cfg = Config.from_yaml(args.config) if args.config else Config()
    cfg = cfg.replace(data=dataclasses.replace(
        cfg.data, rootdir=args.data_root, splitdir=args.split_dir,
        cachedir=args.cache_dir))
    dataset = KittiDataset(cfg, split="val")
    model, tx, state = create_train_state(cfg, jax.random.PRNGKey(0))
    state = load_checkpoint(args.ckpt, state)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    sd = invert_to_torch_sd(jax.tree_util.tree_map(np.asarray, variables), cfg)
    anchors = jnp.asarray(make_anchors(cfg))
    infer = jax.jit(
        lambda pp, nn: model.apply(variables, pp, nn, anchors,
                                   method=Second.inference)
    )

    d, h, w = cfg.grid_shape_zyx
    dets_ours, dets_torch, gts = [], [], []
    rng = np.random.default_rng(0)
    for i in range(min(args.frames, len(dataset))):
        item = dataset[i]
        pts, npts = pad_points(
            item["points"].astype(np.float32), cfg.capacity.max_points, rng
        )
        points = jnp.asarray(pts)[None]
        num = jnp.asarray([npts], jnp.int32)

        det = infer(points, num)
        dets_ours.append(extract_detections(det)[0])

        vox = voxelize_batch(points, num, cfg)
        feats = np.asarray(mean_vfe(vox["features"], vox["occupancy"]))[0]
        coords = np.asarray(vox["coords"])[0]
        vmask = np.asarray(vox["voxel_mask"])[0]
        dense = np.zeros((4, d, h, w), np.float32)
        mask0 = np.zeros((d, h, w), bool)
        sel = np.flatnonzero(vmask)
        zyx = coords[sel]
        dense[:, zyx[:, 0], zyx[:, 1], zyx[:, 2]] = feats[sel].T
        mask0[zyx[:, 0], zyx[:, 1], zyx[:, 2]] = True
        with torch.no_grad():
            bev_t, _ = parity.torch_cnn_forward(
                sd, torch.tensor(dense)[None], torch.tensor(mask0)
            )
            _, cls_t, reg_t = parity.torch_rpn_head(sd, bev_t, cfg)
        det_t = head_inference(
            jnp.asarray(cls_t.numpy()), jnp.asarray(reg_t.numpy()),
            anchors, cfg,
        )
        dets_torch.append(extract_detections(det_t)[0])

        anno = dataset.annotations[dataset.inds[i]]
        gts.append(dict(
            boxes=anno["boxes"],
            class_idx=np.asarray(anno["class_idx"]),
            levels=np.asarray(anno.get("levels",
                                       np.ones(len(anno["boxes"])))),
        ))
        print(f"frame {i}: ours {len(dets_ours[-1]['boxes'])} dets, "
              f"torch {len(dets_torch[-1]['boxes'])} dets", flush=True)

    ap_ours = evaluate_all(dets_ours, gts, cfg.num_classes)
    ap_torch = evaluate_all(dets_torch, gts, cfg.num_classes)
    result = {
        "frames": len(gts),
        "ap_ours": ap_ours,
        "ap_torch_restated": ap_torch,
    }
    print(json.dumps(result, default=float))
    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump(result, f, indent=2, default=float)


if __name__ == "__main__":
    main()
