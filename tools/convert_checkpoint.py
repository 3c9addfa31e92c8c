"""Convert a reference (torch) SECOND checkpoint to vision3d-tpu params.

The reference saves ``{state_dict, optimizer, epoch, meta}`` via torch.save
(vision3d/train.py:23-32). This tool maps its ``state_dict`` onto our flax
variable tree for bit-comparable inference parity runs (SURVEY §7 build
plan step 4).

Layout mappings:
  * torch Conv2d (Cout, Cin, kh, kw)  -> flax (kh, kw, Cin, Cout)
  * spconv SubMConv3d/SparseConv3d (kz, ky, kx, Cin, Cout)
                                      -> ours (kz*ky*kx*Cin, Cout) row-major
  * BatchNorm{1,2}d {weight, bias, running_mean, running_var}
                                      -> {scale, bias} + batch_stats {mean, var}
  * head conv_reg channels: torch interprets them (n_cls, DOF, n_yaw)
    (reference proposal.py:89-92 reshape_reg); ours are (n_cls, n_yaw, DOF)
    -> channel permutation during conversion.

Conversion walks both models in call order and zips tensors, asserting
shapes at every pairing, so any architectural drift fails loudly.

Usage:
    python tools/convert_checkpoint.py --torch-ckpt epoch_12.pth \
        --config configs/second/car.yaml --out ./ckpts_converted/epoch_12
"""

import argparse
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def torch_conv2d_to_flax(w):
    return np.transpose(w, (2, 3, 1, 0))


def spconv_to_ours(w):
    """(kz, ky, kx, Cin, Cout) -> (K*Cin, Cout)."""
    kz, ky, kx, cin, cout = w.shape
    return w.reshape(kz * ky * kx * cin, cout)


def reg_head_permute(w, b, n_cls, n_yaw, dof):
    """torch channel order (cls, dof, yaw) -> ours (cls, yaw, dof)."""
    cout = n_cls * n_yaw * dof
    assert w.shape[0] == cout, w.shape
    perm = (
        np.arange(cout)
        .reshape(n_cls, dof, n_yaw)
        .transpose(0, 2, 1)
        .reshape(-1)
    )
    return w[perm], b[perm]


def convert_state_dict(state_dict, cfg):
    """Returns {'params': ..., 'batch_stats': ...} for vision3d_tpu Second."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def conv_bn(prefix_conv, prefix_bn, sparse):
        w = sd[f"{prefix_conv}.weight"]
        kernel = spconv_to_ours(w) if sparse else torch_conv2d_to_flax(w)
        bn = dict(
            scale=sd[f"{prefix_bn}.weight"],
            bias=sd[f"{prefix_bn}.bias"],
            mean=sd[f"{prefix_bn}.running_mean"],
            var=sd[f"{prefix_bn}.running_var"],
        )
        return kernel, bn

    params, stats = {}, {}

    # ---- sparse CNN: blocks.{b}.{layer}.{0=conv,1=bn} ----
    # reference block structure (sparse_cnn.py:151-175): per block,
    # 2-3 subm (SparseSequential(conv, bn, relu)) + 1 strided conv
    spec = [(2, True), (2, True), (3, True), (3, True)]  # (n_subm, has_down)
    cnn_p, cnn_s = {}, {}
    subm_i = down_i = bn_i = 0
    for b, (n_subm, _) in enumerate(spec):
        for l in range(n_subm + 1):
            is_down = l == n_subm
            kernel, bn = conv_bn(
                f"cnn.blocks.{b}.{l}.0", f"cnn.blocks.{b}.{l}.1", sparse=True
            )
            if is_down:
                name = f"SparseConvDown_{down_i}"
                down_i += 1
            else:
                name = f"SubMConv_{subm_i}"
                subm_i += 1
            cnn_p[name] = dict(
                kernel=kernel,
                MaskedBatchNorm_0=dict(scale=bn["scale"], bias=bn["bias"]),
            )
            cnn_s[name] = dict(
                MaskedBatchNorm_0=dict(mean=bn["mean"], var=bn["var"])
            )
    params["cnn"] = cnn_p
    stats["cnn"] = cnn_s

    # ---- RPN: down_block [pad, conv, bn, relu, (conv, bn, relu) x5],
    #           up_block [conv, bn, relu] ----
    rpn_p, rpn_s = {}, {}
    torch_layers = [(1, 2)] + [(3 * i + 4, 3 * i + 5) for i in range(5)]
    for i, (ci, bi) in enumerate(torch_layers):
        kernel, bn = conv_bn(
            f"rpn.down_block.{ci}", f"rpn.down_block.{bi}", sparse=False
        )
        rpn_p[f"ConvBNReLU_{i}"] = dict(
            Conv_0=dict(kernel=kernel),
            BatchNorm_0=dict(scale=bn["scale"], bias=bn["bias"]),
        )
        rpn_s[f"ConvBNReLU_{i}"] = dict(
            BatchNorm_0=dict(mean=bn["mean"], var=bn["var"])
        )
    kernel, bn = conv_bn("rpn.up_block.0", "rpn.up_block.1", sparse=False)
    rpn_p["ConvBNReLU_6"] = dict(
        Conv_0=dict(kernel=kernel),
        BatchNorm_0=dict(scale=bn["scale"], bias=bn["bias"]),
    )
    rpn_s["ConvBNReLU_6"] = dict(BatchNorm_0=dict(mean=bn["mean"], var=bn["var"]))
    params["rpn"] = rpn_p
    stats["rpn"] = rpn_s

    # ---- head: conv_cls / conv_reg 1x1 ----
    n_cls, n_yaw, dof = cfg.num_classes, cfg.num_yaw, cfg.box_dof
    wr, br = reg_head_permute(
        sd["head.conv_reg.weight"], sd["head.conv_reg.bias"], n_cls, n_yaw, dof
    )
    params["head"] = dict(
        Conv_0=dict(
            kernel=torch_conv2d_to_flax(sd["head.conv_cls.weight"]),
            bias=sd["head.conv_cls.bias"],
        ),
        Conv_1=dict(kernel=torch_conv2d_to_flax(wr), bias=br),
    )
    return {"params": params, "batch_stats": stats}


def verify_against_model(variables, cfg):
    """Shape-check the converted tree against a freshly initialized model."""
    import jax
    import jax.numpy as jnp

    from vision3d_tpu.models.second import create_second

    _, init_vars = create_second(cfg, jax.random.PRNGKey(0))
    flat_a = jax.tree_util.tree_leaves_with_path(init_vars)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(
        jax.tree_util.tree_map(jnp.asarray, variables)))
    a_map = dict(flat_a)
    missing, bad = [], []
    for path, leaf in a_map.items():
        if path not in flat_b:
            missing.append(jax.tree_util.keystr(path))
        elif tuple(flat_b[path].shape) != tuple(leaf.shape):
            bad.append((jax.tree_util.keystr(path), flat_b[path].shape, leaf.shape))
    extra = [jax.tree_util.keystr(p) for p in flat_b if p not in a_map]
    return missing, extra, bad


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--torch-ckpt", required=True)
    ap.add_argument("--config", default=None)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import torch

    from vision3d_tpu.config import Config

    cfg = Config.from_yaml(args.config) if args.config else Config()
    ckpt = torch.load(args.torch_ckpt, map_location="cpu")
    sd = ckpt.get("state_dict", ckpt)
    variables = convert_state_dict(sd, cfg)
    missing, extra, bad = verify_against_model(variables, cfg)
    if missing or extra or bad:
        print("MISMATCH:", missing, extra, bad)
        raise SystemExit(1)

    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(pathlib.Path(args.out).absolute(), variables, force=True)
    print(f"converted {args.torch_ckpt} (epoch {ckpt.get('epoch')}) -> {args.out}")


if __name__ == "__main__":
    main()
