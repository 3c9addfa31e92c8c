"""KITTI pipeline tests on a synthetic mini-dataset (no real KITTI needed)."""

import os
import os.path as osp

import numpy as np
import pytest

from vision3d_tpu.config import Config
from vision3d_tpu.data.augment import (
    ChainedAugmentation,
    DatabaseBuilder,
    FlipAugmentation,
    RotateAugmentation,
    SampleAugmentation,
    ScaleAugmentation,
)
from vision3d_tpu.data.kitti import (
    Calib,
    KittiDataset,
    KittiDatasetTrain,
    Object3d,
    camera_box_to_velo,
    filter_camera_fov,
)
from vision3d_tpu.data.loader import DataLoader, collate, pad_points

# Velo (x fwd, y left, z up) -> cam (x right, y down, z fwd)
V2C = np.array([[0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0]], np.float32)
R0 = np.eye(3, dtype=np.float32)
P2 = np.array([[700, 0, 612, 0], [0, 700, 185, 0], [0, 0, 1, 0]], np.float32)


def velo_box_to_label_line(box, cls="Car"):
    """Inverse of camera_box_to_velo for test fixtures."""
    x, y, z, w, l, h, yaw = box
    cam = V2C[:, :3] @ np.array([x, y, z])
    tx, ty, tz = cam  # ty is box CENTER y; label stores bottom (center + h/2)
    ry = -yaw
    return (
        f"{cls} 0.00 0 0.0 300.0 150.0 400.0 250.0 "
        f"{h:.2f} {w:.2f} {l:.2f} {tx:.2f} {ty + h / 2:.2f} {tz:.2f} {ry:.2f}"
    )


def write_fake_kitti(root, cfg, n_frames=4, rng=None):
    rng = rng or np.random.default_rng(0)
    for sub in ["velodyne", "label_2", "calib"]:
        os.makedirs(osp.join(root, sub), exist_ok=True)
    calib_text = (
        "P0: " + " ".join(["0"] * 12) + "\n"
        "P1: " + " ".join(["0"] * 12) + "\n"
        "P2: " + " ".join(f"{v}" for v in P2.reshape(-1)) + "\n"
        "P3: " + " ".join(["0"] * 12) + "\n"
        "R0_rect: " + " ".join(f"{v}" for v in R0.reshape(-1)) + "\n"
        "Tr_velo_to_cam: " + " ".join(f"{v}" for v in V2C.reshape(-1)) + "\n"
        "Tr_imu_to_velo: " + " ".join(["0"] * 12) + "\n"
    )
    frames = []
    for idx in range(n_frames):
        boxes = []
        lines = []
        for _ in range(3):
            box = np.array(
                [
                    rng.uniform(8, 20),
                    rng.uniform(-6, 6),
                    rng.uniform(-1.5, -0.5),
                    1.6, 3.9, 1.56,
                    rng.uniform(-np.pi / 2, np.pi / 2),
                ],
                np.float32,
            )
            boxes.append(box)
            lines.append(velo_box_to_label_line(box))
        # clutter + in-box points (enough for the database threshold)
        pts = [rng.uniform([1, -10, -2, 0], [30, 10, 0.5, 1], (600, 4))]
        for b in boxes:
            local = rng.uniform(-0.4, 0.4, (30, 3)) * b[3:6] + b[:3]
            pts.append(np.concatenate([local, rng.uniform(0, 1, (30, 1))], 1))
        pts = np.concatenate(pts).astype(np.float32)
        pts.tofile(osp.join(root, "velodyne", f"{idx:06d}.bin"))
        with open(osp.join(root, "label_2", f"{idx:06d}.txt"), "w") as f:
            f.write("\n".join(lines) + "\n")
        with open(osp.join(root, "calib", f"{idx:06d}.txt"), "w") as f:
            f.write(calib_text)
        frames.append(np.stack(boxes))
    return frames


@pytest.fixture
def kitti_tree(tmp_path):
    cfg = Config().replace(
        num_classes=1,
        anchors=Config().anchors[:1],
        data=Config().data.__class__(
            cachedir=str(tmp_path / "cache"),
            splitdir=str(tmp_path / "splits"),
            rootdir=str(tmp_path / "kitti"),
        ),
        aug=Config().aug.__class__(num_sample_objects=(4, 0, 0), min_num_sample_pts=8),
        capacity=Config().capacity.__class__(max_points=2048, max_gt_boxes=16),
    )
    boxes = write_fake_kitti(str(tmp_path / "kitti"), cfg)
    os.makedirs(tmp_path / "splits")
    with open(tmp_path / "splits" / "val.txt", "w") as f:
        f.write("0\n1\n")
    with open(tmp_path / "splits" / "train.txt", "w") as f:
        f.write("2\n3\n")
    return cfg, boxes


def test_label_roundtrip():
    box = np.array([12.0, -3.0, -1.0, 1.6, 3.9, 1.56, 0.7], np.float32)
    line = velo_box_to_label_line(box)
    obj = Object3d.parse(line)
    assert obj.class_idx == 0
    calib = Calib(P2=P2, R0=R0, V2C=V2C)
    back = camera_box_to_velo(obj, calib)
    np.testing.assert_allclose(back, box, atol=1e-2)


def test_fov_filter():
    calib = Calib(P2=P2, R0=R0, V2C=V2C)
    pts = np.array(
        [
            [10, 0, 0, 1],     # straight ahead -> visible
            [-5, 0, 0, 1],     # behind -> dropped
            [5, 30, 0, 1],     # far left, out of image -> dropped
        ],
        np.float32,
    )
    out = filter_camera_fov(calib, pts)
    assert len(out) == 1 and out[0, 0] == 10


def test_val_dataset(kitti_tree):
    cfg, boxes = kitti_tree
    ds = KittiDataset(cfg, split="val", verbose=False)
    assert len(ds) == 2
    item = ds[0]
    assert item["points"].shape[1] == 4
    assert len(item["boxes"]) == 3
    np.testing.assert_allclose(item["boxes"], boxes[0], atol=1e-2)
    # annotation cache round-trips
    ds2 = KittiDataset(cfg, split="val", verbose=False)
    np.testing.assert_allclose(ds2[0]["boxes"], item["boxes"])


def test_train_dataset_and_loader(kitti_tree):
    cfg, _ = kitti_tree
    ds = KittiDatasetTrain(cfg, verbose=False, rng=np.random.default_rng(0))
    item = ds[0]
    assert item["boxes"].shape[1] == 7
    assert (item["class_idx"] == 0).all()
    loader = DataLoader(ds, cfg, batch_size=2, seed=1)
    batches = list(loader)
    assert len(batches) == 1
    b = batches[0]
    assert b["points"].shape == (2, 2048, 4)
    assert b["boxes"].shape == (2, 16, 7)
    assert b["gt_mask"].sum() >= 2
    assert (b["num_points"] > 0).all()


def test_loader_host_sharding(kitti_tree):
    """Multi-host input sharding: same-seeded shard loaders partition the
    epoch — disjoint frames, full coverage, equal batch counts."""
    cfg, _ = kitti_tree
    ds = KittiDatasetTrain(cfg, verbose=False, rng=np.random.default_rng(0))
    shards = [
        DataLoader(ds, cfg, batch_size=1, seed=7, num_shards=2, shard_id=i)
        for i in range(2)
    ]
    assert len(shards[0]) == len(shards[1]) == 1
    seen = []
    for ld in shards:
        for b in ld:
            seen.extend(int(i) for i in b["frame_idx"])
    assert len(seen) == len(set(seen)) == 2  # disjoint, 2 of 2 frames


def test_pad_points_semantics(rng):
    pts = rng.normal(size=(10, 4)).astype(np.float32)
    padded, n = pad_points(pts, 16, rng)
    assert n == 10 and padded.shape == (16, 4)
    np.testing.assert_array_equal(padded[:10], pts)
    # padding rows are resampled real points
    assert all(any((row == p).all() for p in pts) for row in padded[10:])
    sub, n2 = pad_points(pts, 4, rng)
    assert n2 == 4 and len(np.unique(sub, axis=0)) == 4


def test_geometric_augmentations(rng):
    cfg = Config()
    pts = rng.uniform(-10, 10, (100, 4)).astype(np.float32)
    boxes = np.array([[1, 2, -1, 1.6, 3.9, 1.5, 0.3]], np.float32)

    p2, b2 = ScaleAugmentation(cfg)(pts, boxes, np.random.default_rng(1))
    f = b2[0, 0] / boxes[0, 0]
    assert 0.95 <= f <= 1.05
    np.testing.assert_allclose(p2[:, :3], pts[:, :3] * f, rtol=1e-5)
    np.testing.assert_allclose(p2[:, 3], pts[:, 3])  # intensity untouched

    p3, b3 = RotateAugmentation(cfg)(pts, boxes, np.random.default_rng(2))
    np.testing.assert_allclose(
        np.linalg.norm(p3[:, :2], axis=1), np.linalg.norm(pts[:, :2], axis=1),
        rtol=1e-4,
    )
    np.testing.assert_allclose(b3[0, 2:6], boxes[0, 2:6])

    # flip flips y and yaw sign (force the p=0.5 branch via seed search)
    for seed in range(20):
        p4, b4 = FlipAugmentation(cfg)(pts, boxes, np.random.default_rng(seed))
        if b4[0, 1] != boxes[0, 1]:
            np.testing.assert_allclose(p4[:, 1], -pts[:, 1])
            np.testing.assert_allclose(b4[0, 6], -boxes[0, 6])
            break
    else:
        pytest.fail("flip never triggered in 20 seeds")


def test_sample_augmentation_paste(kitti_tree):
    cfg, _ = kitti_tree
    # build database from train annotations
    ds = KittiDatasetTrain(cfg, verbose=False)
    aug = SampleAugmentation(cfg)
    rng = np.random.default_rng(3)
    pts = rng.uniform([1, -10, -2, 0], [30, 10, 0.5, 1], (500, 4)).astype(np.float32)
    boxes = np.zeros((0, 7), np.float32)
    cls = np.zeros((0,), np.int64)
    p, b, c = aug(pts, boxes, cls, rng)
    assert len(b) > 0 and len(c) == len(b)
    assert len(p) > 0
    # pasted boxes do not collide pairwise
    from vision3d_tpu.core.iou import np_pairwise_rotated_iou

    if len(b) > 1:
        iou = np_pairwise_rotated_iou(b[:, [0, 1, 3, 4, 6]], b[:, [0, 1, 3, 4, 6]])
        off_diag = iou - np.diag(np.diag(iou))
        assert (off_diag <= 1e-2).all()


def test_preprocessor_facade(rng):
    from vision3d_tpu.core.preprocess import Preprocessor, TrainPreprocessor

    cfg = Config().replace(
        capacity=Config().capacity.__class__(max_points=256, max_gt_boxes=8)
    )
    pre = Preprocessor(cfg, seed=0)
    pts = [rng.normal(size=(100, 4)).astype(np.float32),
           rng.normal(size=(50, 4)).astype(np.float32)]
    out = pre(dict(points=pts, anchors="passthrough"))
    assert out["points"].shape == (2, 256, 4)
    assert list(out["num_points"]) == [100, 50]
    assert out["batch_size"] == 2
    assert out["anchors"] == "passthrough"

    # host voxelization path (native or numpy)
    lo = np.asarray(cfg.grid_bounds[:3]); hi = np.asarray(cfg.grid_bounds[3:])
    cloud = np.concatenate(
        [rng.uniform(lo, hi, (500, 3)), rng.uniform(0, 1, (500, 1))], 1
    ).astype(np.float32)
    f, c, o = pre.voxelize_host(cloud)
    assert f.shape[1:] == (cfg.max_occupancy, 4)
    assert (o >= 1).all()

    tp = TrainPreprocessor(cfg, seed=0)
    items = [
        dict(points=pts[0], boxes=np.zeros((2, 7), np.float32),
             class_idx=np.zeros(2, np.int64), idx=7),
        dict(points=pts[1], boxes=np.zeros((1, 7), np.float32),
             class_idx=np.zeros(1, np.int64), idx=8),
    ]
    batch = tp.collate(items)
    assert batch["points"].shape == (2, 256, 4)
    assert batch["gt_mask"].sum() == 3
