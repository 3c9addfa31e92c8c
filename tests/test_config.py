import math

import pytest

from vision3d_tpu.config import Config


def test_defaults_match_reference():
    """Defaults mirror reference core/config.py:1-110."""
    cfg = Config()
    assert cfg.c_in == 4
    assert cfg.num_keypoints == 2048
    assert cfg.strides == (1, 2, 4, 8)
    assert cfg.max_voxels == 20000
    assert cfg.max_occupancy == 5
    assert cfg.voxel_size == (0.05, 0.05, 0.1)
    assert cfg.grid_bounds == (0.0, -40.0, -3.0, 70.4, 40.0, 1.0)
    assert cfg.num_classes == 3
    assert cfg.num_yaw == 2
    assert cfg.box_dof == 7
    assert cfg.anchors[0].wlh == (1.6, 3.9, 1.56)
    assert cfg.anchors[0].iou_thresh == (0.45, 0.60)
    assert cfg.anchors[1].center_z == -0.6
    assert cfg.anchors[2].names == ("Cyclist",)
    assert cfg.proposal.topk == 100
    assert cfg.train.lam == 1.0
    assert cfg.aug.num_sample_objects == (15, 10, 10)
    assert cfg.aug.global_rotation == (-math.pi / 4, math.pi / 4)


def test_derived_geometry():
    """Grid 41x1600x1408 ZYX and BEV 200x176 (reference sparse_cnn.py:40-45)."""
    cfg = Config()
    assert cfg.grid_shape_zyx == (41, 1600, 1408)
    assert cfg.bev_shape == (200, 176)
    assert cfg.anchors_per_class == 70400


def test_yaml_merge_reference_car_config(tmp_path):
    """Parses the reference's configs/second/car.yaml schema verbatim."""
    yml = tmp_path / "car.yaml"
    yml.write_text(
        """
MAX_OCCUPANCY: 5
MAX_VOXELS: 20000
GRID_BOUNDS: [0, -40.0, -3, 70.4, 40.0, 1]
ANCHORS: [{
  names: ['Car', 'Van'],
  wlh: [1.6, 3.9, 1.56],
  yaw: [0, 1.501],
  iou_thresh: [0.45, 0.60],
  score_thresh: 0.3,
  center_z: -1.0,
}]
NUM_CLASSES: 1
TRAIN:
  BATCH_SIZE: 4
  LAMBDA: 1.0
  EPOCHS: 60
AUG:
  NUM_SAMPLE_OBJECTS: [15, 0, 0]
"""
    )
    cfg = Config.from_yaml(str(yml))
    assert cfg.num_classes == 1
    assert len(cfg.anchors) == 1
    assert cfg.anchors[0].yaw == (0, 1.501)
    assert cfg.train.batch_size == 4
    assert cfg.train.epochs == 60
    assert cfg.aug.num_sample_objects == (15, 0, 0)
    # untouched defaults survive the merge
    assert cfg.proposal.topk == 100


def test_shipped_configs_load_from_disk():
    """The repo ships configs/second/{car,all_classes}.yaml (VERDICT r1 #4);
    README/CLI commands reference them, so they must load as written."""
    import pathlib

    root = pathlib.Path(__file__).resolve().parents[1]
    car = Config.from_yaml(str(root / "configs/second/car.yaml"))
    assert car.num_classes == 1
    assert len(car.anchors) == 1
    assert car.anchors[0].yaw == (0, 1.501)
    assert car.train.batch_size == 4
    assert car.aug.num_sample_objects == (15, 0, 0)

    all3 = Config.from_yaml(str(root / "configs/second/all_classes.yaml"))
    assert all3.num_classes == 3
    assert len(all3.anchors) == 3
    assert all3.anchors[1].names == ("Pedestrian", "Person_sitting")
    assert all3.anchors[2].wlh == (0.6, 1.76, 1.73)
    assert all3.aug.num_sample_objects == (15, 10, 10)


def test_config_is_hashable_and_frozen():
    cfg = Config()
    hash(cfg)  # closable over by jit without retracing hazards
    with pytest.raises(Exception):
        cfg.max_voxels = 1


def test_unknown_key_rejected():
    with pytest.raises(KeyError):
        Config().merge({"BOGUS_KEY": 1})
