"""End-to-end layout parity: our SECOND stack vs a torch re-statement of
the reference architecture, sharing weights via the real checkpoint
converter (tools/convert_checkpoint.py).

The torch side rebuilds the reference's compute *behavior* from its spec —
dense conv3d with explicit submanifold/dilation masks standing in for
spconv (reference detector/sparse_cnn.py:151-175), the RPN conv stack
(detector/second.py:49-94), and the head's reshape/permute + topk decode
path (detector/proposal.py:61-97) — using the reference's state_dict key
names (train.py:23-32) so ``convert_state_dict`` runs exactly as it would
on a real ``epoch_N.pth``. Any drift in weight layout, channel ordering,
BN semantics, BEV flattening, or anchor-axis flattening fails loudly here.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tools.convert_checkpoint import convert_state_dict  # noqa: E402
from vision3d_tpu.config import CapacityConfig, Config  # noqa: E402
from vision3d_tpu.core.anchors import make_anchors  # noqa: E402
from vision3d_tpu.core import boxes as box_ops  # noqa: E402
from vision3d_tpu.core.voxelize import mean_vfe, voxelize_batch  # noqa: E402
from vision3d_tpu.models.head import decode_proposals  # noqa: E402
from vision3d_tpu.models.second import (  # noqa: E402
    Second,
    build_middle_input,
)
from vision3d_tpu.models.sparse_cnn import CNN_FACTORY  # noqa: E402


def parity_cfg(backend):
    cfg = Config()
    return cfg.replace(
        max_voxels=512,
        voxel_size=(0.4, 0.4, 0.1),
        grid_bounds=(0.0, -12.8, -3.0, 25.6, 12.8, 1.0),
        num_classes=1,
        anchors=cfg.anchors[:1],
        sparse_backend=backend,
        # generous stage capacities so no truncation can occur (stage-2
        # grid has only 11*16*16 = 2816 cells < 3072)
        capacity=CapacityConfig(
            max_points=2048,
            max_gt_boxes=8,
            max_detections=32,
            stage_capacity=(1.0, 4.0, 6.0, 6.0, 6.0),
        ),
        proposal=cfg.proposal.__class__(c_in=128, topk=32),
    )


# Reference SpMiddleFHD layer plan (sparse_cnn.py:151-175): per block,
# (subm channel list, down-conv (cout, kernel, stride, pad)).
CNN_PLAN = [
    (4, [16, 16], (32, (3, 3, 3), (2, 2, 2), (1, 1, 1))),
    (32, [32, 32], (64, (3, 3, 3), (2, 2, 2), (1, 1, 1))),
    (64, [64, 64, 64], (64, (3, 3, 3), (2, 2, 2), (0, 1, 1))),
    (64, [64, 64, 64], (64, (3, 1, 1), (2, 1, 1), (0, 0, 0))),
]


def make_torch_state_dict(rng, cfg):
    """Random weights under the reference's state_dict key names."""

    def conv_bn(sd, conv_key, bn_key, shape, bn_c=None):
        if shape is not None:
            sd[f"{conv_key}.weight"] = torch.tensor(
                rng.normal(0, 0.1, shape).astype(np.float32)
            )
        c = bn_c if bn_c is not None else (
            shape[-1] if len(shape) == 5 else shape[0]
        )
        sd[f"{bn_key}.weight"] = torch.tensor(
            rng.uniform(0.5, 1.5, c).astype(np.float32)
        )
        sd[f"{bn_key}.bias"] = torch.tensor(
            rng.normal(0, 0.1, c).astype(np.float32)
        )
        sd[f"{bn_key}.running_mean"] = torch.tensor(
            rng.normal(0, 0.1, c).astype(np.float32)
        )
        sd[f"{bn_key}.running_var"] = torch.tensor(
            rng.uniform(0.5, 2.0, c).astype(np.float32)
        )

    sd = {}
    for b, (cin, subm, (cdown, k, _, _)) in enumerate(CNN_PLAN):
        c = cin
        for l, ch in enumerate(subm):
            # spconv weight layout (kz, ky, kx, Cin, Cout)
            conv_bn(sd, f"cnn.blocks.{b}.{l}.0", f"cnn.blocks.{b}.{l}.1",
                    (3, 3, 3, c, ch))
            c = ch
        conv_bn(sd, f"cnn.blocks.{b}.{len(subm)}.0",
                f"cnn.blocks.{b}.{len(subm)}.1", (*k, c, cdown))

    # RPN (detector/second.py:58-80): down_block indices
    # [0 pad, 1 conv, 2 bn, 3 relu, (4+3j conv, 5+3j bn, 6+3j relu) x5]
    sd["rpn.down_block.1.weight"] = torch.tensor(
        rng.normal(0, 0.05, (128, 128, 3, 3)).astype(np.float32)
    )
    conv_bn(sd, None, "rpn.down_block.2", None, bn_c=128)
    for j in range(5):
        sd[f"rpn.down_block.{3*j+4}.weight"] = torch.tensor(
            rng.normal(0, 0.05, (128, 128, 3, 3)).astype(np.float32)
        )
        conv_bn(sd, None, f"rpn.down_block.{3*j+5}", None, bn_c=128)
    sd["rpn.up_block.0.weight"] = torch.tensor(
        rng.normal(0, 0.05, (128, 128, 1, 1)).astype(np.float32)
    )
    conv_bn(sd, None, "rpn.up_block.1", None, bn_c=128)

    n_out = cfg.num_classes * cfg.num_yaw
    sd["head.conv_cls.weight"] = torch.tensor(
        rng.normal(0, 0.01, (n_out, 128, 1, 1)).astype(np.float32)
    )
    sd["head.conv_cls.bias"] = torch.tensor(
        rng.normal(0, 0.01, n_out).astype(np.float32)
    )
    sd["head.conv_reg.weight"] = torch.tensor(
        rng.normal(0, 0.01, (n_out * 7, 128, 1, 1)).astype(np.float32)
    )
    sd["head.conv_reg.bias"] = torch.tensor(
        rng.normal(0, 0.01, n_out * 7).astype(np.float32)
    )
    return sd


def torch_bn(x, sd, key):
    return F.batch_norm(
        x, sd[f"{key}.running_mean"], sd[f"{key}.running_var"],
        sd[f"{key}.weight"], sd[f"{key}.bias"], training=False, eps=1e-3,
    )


def torch_cnn_forward(sd, dense_in, mask0):
    """Reference SpMiddleFHD semantics on a dense grid: submanifold convs
    compute at active input sites; strided convs activate any output site
    with >= 1 active input in its receptive field; z-collapse to BEV."""
    x = dense_in  # (1, C, D, H, W)
    m = mask0[None, None].float()  # (1, 1, D, H, W)
    counts = []
    for b, (cin, subm, (cdown, k, s, p)) in enumerate(CNN_PLAN):
        for l in range(len(subm)):
            w = sd[f"cnn.blocks.{b}.{l}.0.weight"].permute(4, 3, 0, 1, 2)
            x = F.conv3d(x, w, stride=1, padding=1)
            x = torch_bn(x, sd, f"cnn.blocks.{b}.{l}.1")
            x = F.relu(x) * m
        l = len(subm)
        w = sd[f"cnn.blocks.{b}.{l}.0.weight"].permute(4, 3, 0, 1, 2)
        x = F.conv3d(x, w, stride=s, padding=p)
        ones = torch.ones((1, 1) + k)
        m = (F.conv3d(m, ones, stride=s, padding=p) > 0).float()
        x = torch_bn(x, sd, f"cnn.blocks.{b}.{l}.1")
        x = F.relu(x) * m
        counts.append(int(m.sum().item()))
    n, c, d, h, w_ = x.shape
    bev = x.reshape(n, c * d, h, w_)  # (C, D) c-major like reference to_bev
    return bev, counts


def torch_rpn_head(sd, bev, cfg):
    x = F.pad(bev, (1, 1, 1, 1))
    x = F.conv2d(x, sd["rpn.down_block.1.weight"])
    x = F.relu(torch_bn(x, sd, "rpn.down_block.2"))
    for j in range(5):
        x = F.conv2d(x, sd[f"rpn.down_block.{3*j+4}.weight"], padding=1)
        x = F.relu(torch_bn(x, sd, f"rpn.down_block.{3*j+5}"))
    x = F.conv2d(x, sd["rpn.up_block.0.weight"])
    x = F.relu(torch_bn(x, sd, "rpn.up_block.1"))

    cls = F.conv2d(x, sd["head.conv_cls.weight"], sd["head.conv_cls.bias"])
    reg = F.conv2d(x, sd["head.conv_reg.weight"], sd["head.conv_reg.bias"])
    b, _, ny, nx = cls.shape
    cls = cls.view(b, cfg.num_classes, cfg.num_yaw, ny, nx)
    reg = reg.view(b, cfg.num_classes, cfg.box_dof, -1, ny, nx)
    reg = reg.permute(0, 1, 3, 4, 5, 2)  # reference reshape_reg
    return x, cls, reg


def sample_cloud(rng, cfg, n=110):
    """Clustered points so strided dilation dedups well below capacity."""
    centers = rng.uniform(
        [2.0, -10.0, -2.0], [22.0, 10.0, 0.5], size=(8, 3)
    )
    pts = (
        centers[rng.integers(0, 8, n)]
        + rng.normal(0, 0.8, (n, 3))
    )
    refl = rng.uniform(0, 1, (n, 1))
    return np.concatenate([pts, refl], -1).astype(np.float32)


@pytest.mark.parametrize("backend", ["voxel", "column"])
def test_full_stack_matches_torch_reference(rng, backend):
    cfg = parity_cfg(backend)
    sd = make_torch_state_dict(rng, cfg)
    variables = jax.tree_util.tree_map(
        jnp.asarray, convert_state_dict({k: v.numpy() for k, v in sd.items()}, cfg)
    )

    cloud = sample_cloud(rng, cfg)
    points = jnp.asarray(cloud)[None]
    num = jnp.asarray([len(cloud)], jnp.int32)

    # shared voxelization (bit-parity of the voxelizer itself is covered by
    # test_voxelize.py) -> dense torch input
    vox = voxelize_batch(points, num, cfg)
    feats = np.asarray(mean_vfe(vox["features"], vox["occupancy"]))[0]
    coords = np.asarray(vox["coords"])[0]
    vmask = np.asarray(vox["voxel_mask"])[0]
    d, h, w = cfg.grid_shape_zyx
    dense = np.zeros((4, d, h, w), np.float32)
    mask0 = np.zeros((d, h, w), bool)
    for i in np.flatnonzero(vmask):
        z, y, x = coords[i]
        dense[:, z, y, x] = feats[i]
        mask0[z, y, x] = True

    bev_t, counts = torch_cnn_forward(
        sd, torch.tensor(dense)[None], torch.tensor(mask0)
    )
    for si, c in enumerate(counts):
        assert c < cfg.stage_voxel_capacity(si + 1), (si, c)

    # ---- CNN BEV parity ----
    cnn = CNN_FACTORY[cfg.cnn](cfg)
    cnn_vars = {
        "params": variables["params"]["cnn"],
        "batch_stats": variables["batch_stats"]["cnn"],
    }
    st = build_middle_input(cfg, vox)
    _, bev_j = cnn.apply(cnn_vars, st, False, need_scales=False)
    bev_t_nhwc = bev_t[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(
        np.asarray(bev_j[0]), bev_t_nhwc, rtol=1e-3, atol=2e-4
    )

    # ---- full forward maps parity ----
    model = Second(cfg)
    cls_j, reg_j = model.apply(variables, points, num, train=False)
    _, cls_t, reg_t = torch_rpn_head(sd, bev_t, cfg)
    np.testing.assert_allclose(
        np.asarray(cls_j), cls_t.numpy(), rtol=1e-3, atol=3e-4
    )
    np.testing.assert_allclose(
        np.asarray(reg_j), reg_t.numpy(), rtol=1e-3, atol=3e-4
    )

    # ---- topk + anchor gather + decode parity (reference proposal.py:61-80)
    anchors = jnp.asarray(make_anchors(cfg))
    boxes_j, scores_j = decode_proposals(cls_j, reg_j, anchors, cfg)

    k = cfg.proposal.topk
    score_t = torch.sigmoid(cls_t).view(1, cfg.num_classes, -1)
    scores_t, idx_t = score_t.topk(k, -1)
    deltas_t = (
        reg_t.reshape(1, cfg.num_classes, -1, 7)
        .gather(2, idx_t[..., None].expand(-1, -1, -1, 7))
        .numpy()
    )
    anchors_t = np.broadcast_to(
        np.asarray(anchors).reshape(1, cfg.num_classes, -1, 7),
        (1, cfg.num_classes, anchors.size // (cfg.num_classes * 7), 7),
    )
    sel = np.take_along_axis(anchors_t, idx_t.numpy()[..., None], axis=2)
    boxes_t = box_ops.decode(deltas_t, sel, xp=np)
    np.testing.assert_allclose(
        np.asarray(scores_j), scores_t.numpy(), rtol=1e-3, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(boxes_j), boxes_t, rtol=1e-3, atol=1e-3
    )
