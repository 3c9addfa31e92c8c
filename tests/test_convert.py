"""Checkpoint converter plumbing test: a synthetic torch-layout state_dict
with the reference's exact key schema and tensor shapes must convert into
a tree that matches our initialized model leaf-for-leaf and run inference."""

import pathlib
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "tools"))

from convert_checkpoint import convert_state_dict, verify_against_model


def fake_reference_state_dict(cfg, rng):
    """Reference SECOND state_dict schema (sparse_cnn.py:151-175,
    second.py:49-94, proposal.py:19-24) with random values."""
    sd = {}

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = rng.normal(1, 0.02, (c,)).astype(np.float32)
        sd[f"{prefix}.bias"] = rng.normal(0, 0.02, (c,)).astype(np.float32)
        sd[f"{prefix}.running_mean"] = rng.normal(0, 0.1, (c,)).astype(np.float32)
        sd[f"{prefix}.running_var"] = rng.uniform(0.5, 1.5, (c,)).astype(np.float32)

    # sparse CNN
    spec = [
        (4, [16, 16], 32, (3, 3, 3)),
        (32, [32, 32], 64, (3, 3, 3)),
        (64, [64, 64, 64], 64, (3, 3, 3)),
        (64, [64, 64, 64], 64, (3, 1, 1)),
    ]
    for b, (cin, subs, cdown, kdown) in enumerate(spec):
        c_prev = cin
        for l, c in enumerate(subs):
            sd[f"cnn.blocks.{b}.{l}.0.weight"] = rng.normal(
                0, 0.05, (3, 3, 3, c_prev, c)
            ).astype(np.float32)
            bn(f"cnn.blocks.{b}.{l}.1", c)
            c_prev = c
        l = len(subs)
        sd[f"cnn.blocks.{b}.{l}.0.weight"] = rng.normal(
            0, 0.05, (*kdown, c_prev, cdown)
        ).astype(np.float32)
        bn(f"cnn.blocks.{b}.{l}.1", cdown)

    # RPN
    torch_layers = [(1, 2)] + [(3 * i + 4, 3 * i + 5) for i in range(5)]
    for ci, bi in torch_layers:
        sd[f"rpn.down_block.{ci}.weight"] = rng.normal(
            0, 0.05, (128, 128, 3, 3)
        ).astype(np.float32)
        bn(f"rpn.down_block.{bi}", 128)
    sd["rpn.up_block.0.weight"] = rng.normal(0, 0.05, (128, 128, 1, 1)).astype(
        np.float32
    )
    bn("rpn.up_block.1", 128)

    # head
    n = cfg.num_classes * cfg.num_yaw
    sd["head.conv_cls.weight"] = rng.normal(0, 0.01, (n, 128, 1, 1)).astype(np.float32)
    sd["head.conv_cls.bias"] = rng.normal(0, 0.01, (n,)).astype(np.float32)
    sd["head.conv_reg.weight"] = rng.normal(
        0, 0.01, (n * cfg.box_dof, 128, 1, 1)
    ).astype(np.float32)
    sd["head.conv_reg.bias"] = rng.normal(0, 0.01, (n * cfg.box_dof,)).astype(
        np.float32
    )
    return sd


def test_convert_roundtrip(tiny_cfg, rng):
    # first RPN conv takes cnn output channels (128) in both impls
    cfg = tiny_cfg
    sd = fake_reference_state_dict(cfg, rng)
    variables = convert_state_dict(sd, cfg)
    missing, extra, bad = verify_against_model(variables, cfg)
    assert not missing, missing[:5]
    assert not extra, extra[:5]
    assert not bad, bad[:5]

    # converted variables must run end-to-end
    from vision3d_tpu.models.second import Second

    model = Second(cfg)
    variables = jax.tree_util.tree_map(jnp.asarray, variables)
    pts = jnp.asarray(rng.uniform(0, 10, (1, 128, 4)).astype(np.float32))
    cls_map, reg_map = model.apply(variables, pts, jnp.asarray([128], jnp.int32))
    assert np.isfinite(np.asarray(cls_map)).all()


def test_reg_head_channel_permutation():
    from convert_checkpoint import reg_head_permute

    n_cls, n_yaw, dof = 2, 2, 7
    # value encodes (cls, dof, yaw) torch ordering
    w = np.arange(n_cls * dof * n_yaw).reshape(-1, 1, 1, 1).astype(np.float32)
    b = np.arange(n_cls * dof * n_yaw).astype(np.float32)
    w2, b2 = reg_head_permute(w, b, n_cls, n_yaw, dof)
    # ours ordering (cls, yaw, dof): entry (c, y, d) = torch (c*dof+d)*n_yaw+y
    expect = [
        (c * dof + d) * n_yaw + y
        for c in range(n_cls)
        for y in range(n_yaw)
        for d in range(dof)
    ]
    np.testing.assert_array_equal(b2, expect)
