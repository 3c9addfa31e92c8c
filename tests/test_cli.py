"""End-to-end CLI smoke tests on the synthetic mini-KITTI tree."""

import os
import os.path as osp

import numpy as np
import pytest

from test_data import write_fake_kitti
from vision3d_tpu.config import Config


@pytest.fixture
def mini_cfg_tree(tmp_path):
    cfg = Config()
    cfg = cfg.replace(
        max_voxels=512,
        voxel_size=(0.4, 0.4, 0.1),
        grid_bounds=(0.0, -12.8, -3.0, 25.6, 12.8, 1.0),
        num_classes=1,
        anchors=cfg.anchors[:1],
        data=cfg.data.__class__(
            cachedir=str(tmp_path / "cache"),
            splitdir=str(tmp_path / "splits"),
            rootdir=str(tmp_path / "kitti"),
        ),
        train=cfg.train.__class__(
            epochs=1, batch_size=2, ckpt_dir=str(tmp_path / "ckpts"),
            lr=1e-3, max_lr=1e-3,
        ),
        aug=cfg.aug.__class__(num_sample_objects=(2, 0, 0), min_num_sample_pts=8),
        capacity=cfg.capacity.__class__(max_points=1024, max_gt_boxes=16),
        proposal=cfg.proposal.__class__(c_in=128, topk=8),
    )
    write_fake_kitti(str(tmp_path / "kitti"), cfg, n_frames=4)
    os.makedirs(tmp_path / "splits")
    with open(tmp_path / "splits" / "val.txt", "w") as f:
        f.write("0\n1\n")
    with open(tmp_path / "splits" / "train.txt", "w") as f:
        f.write("2\n3\n")
    return cfg, tmp_path


def test_train_loop_and_eval(mini_cfg_tree):
    """One tiny epoch of the real training loop, checkpoint, then eval."""
    import jax
    import jax.numpy as jnp

    from vision3d_tpu.data.kitti import KittiDataset, KittiDatasetTrain
    from vision3d_tpu.data.loader import DataLoader
    from vision3d_tpu.eval_cli import run_eval
    from vision3d_tpu.training.checkpoint import maybe_resume, save_checkpoint
    from vision3d_tpu.training.train import create_train_state, make_train_step

    cfg, root = mini_cfg_tree
    ds = KittiDatasetTrain(cfg, verbose=False, rng=np.random.default_rng(0))
    loader = DataLoader(ds, cfg, batch_size=2, seed=0)
    model, tx, state = create_train_state(cfg, jax.random.PRNGKey(0), len(loader))
    step_fn = jax.jit(make_train_step(model, tx, cfg))
    n_steps = 0
    for batch in loader:
        batch.pop("frame_idx")
        state, losses = step_fn(state, {k: jnp.asarray(v) for k, v in batch.items()})
        assert np.isfinite(float(losses["loss"]))
        n_steps += 1
    assert n_steps == len(loader) >= 1
    save_checkpoint(cfg.train.ckpt_dir, state, epoch=0)

    restored, next_epoch = maybe_resume(cfg.train.ckpt_dir, state)
    assert next_epoch == 1

    val = KittiDataset(cfg, split="val", verbose=False)
    variables = {"params": restored.params, "batch_stats": restored.batch_stats}
    table = run_eval(cfg, model, variables, val, batch_size=2, verbose=False)
    assert 0 in table and set(table[0]) == {"easy", "moderate", "hard"}
    for v in table[0].values():
        assert 0.0 <= v <= 100.0


def test_inference_cli(mini_cfg_tree, tmp_path, capsys):
    from vision3d_tpu import inference_cli

    cfg, root = mini_cfg_tree
    # inference_cli builds its own Config; give it a YAML with our dims
    yml = root / "cfg.yaml"
    yml.write_text(
        """
MAX_VOXELS: 512
VOXEL_SIZE: [0.4, 0.4, 0.1]
GRID_BOUNDS: [0.0, -12.8, -3.0, 25.6, 12.8, 1.0]
NUM_CLASSES: 1
ANCHORS: [{names: ['Car'], wlh: [1.6, 3.9, 1.56], yaw: [0, 1.501],
           iou_thresh: [0.45, 0.6], score_thresh: 0.0, center_z: -1.0}]
CAPACITY:
  MAX_POINTS: 1024
  MAX_GT_BOXES: 16
PROPOSAL:
  C_IN: 128
  TOPK: 8
"""
    )
    velo = root / "kitti" / "velodyne" / "000000.bin"
    out_png = tmp_path / "dets.png"
    inference_cli.main(
        ["--config", str(yml), "--velo", str(velo), "--out", str(out_png)]
    )
    assert out_png.exists()


def test_train_cli_main(mini_cfg_tree, tmp_path, monkeypatch):
    """The real train_cli.main: 1 epoch on the mini tree with overrides."""
    import yaml

    cfg, root = mini_cfg_tree
    yml = root / "train_cfg.yaml"
    yml.write_text(
        yaml.safe_dump(
            {
                "MAX_VOXELS": 512,
                "VOXEL_SIZE": [0.4, 0.4, 0.1],
                "GRID_BOUNDS": [0.0, -12.8, -3.0, 25.6, 12.8, 1.0],
                "NUM_CLASSES": 1,
                "ANCHORS": [
                    dict(names=["Car"], wlh=[1.6, 3.9, 1.56], yaw=[0, 1.501],
                         iou_thresh=[0.45, 0.6], score_thresh=0.3, center_z=-1.0)
                ],
                "DATA": {
                    "CACHEDIR": str(root / "cache"),
                    "SPLITDIR": str(root / "splits"),
                    "ROOTDIR": str(root / "kitti"),
                },
                "AUG": {"NUM_SAMPLE_OBJECTS": [2, 0, 0]},
                "CAPACITY": {"MAX_POINTS": 1024, "MAX_GT_BOXES": 16},
                "PROPOSAL": {"C_IN": 128, "TOPK": 8},
            }
        )
    )
    from vision3d_tpu import train_cli

    metrics = tmp_path / "m.jsonl"
    train_cli.main(
        [
            "--config", str(yml),
            "--epochs", "1",
            "--batch-size", "2",
            "--ckpt-dir", str(tmp_path / "cli_ckpts"),
            "--metrics-jsonl", str(metrics),
        ]
    )
    import glob

    assert glob.glob(str(tmp_path / "cli_ckpts" / "epoch_*")), "no checkpoint saved"
    assert metrics.exists()
