"""Generate golden test vectors from the reference implementation.

Loads the reference's pure-Python modules (box_encode, anchor_generator,
matcher, focal_loss) directly by file path and compiles the torch-free
rotated-IoU header into a tiny evaluator binary. The resulting .npz files
are checked into tests/goldens/ so the test suite never needs the reference
tree or torch at run time.

Usage: python tools/make_goldens.py  (requires /root/reference + torch cpu)
"""

import importlib.util
import os
import pathlib
import subprocess
import sys

import numpy as np

REF = pathlib.Path("/root/reference/vision3d")
OUT = pathlib.Path(__file__).resolve().parent.parent / "tests" / "goldens"
OUT.mkdir(parents=True, exist_ok=True)


def load_module(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def golden_box_encode():
    import torch

    be = load_module("ref_box_encode", REF / "core" / "box_encode.py")
    rng = np.random.default_rng(7)
    n = 256
    anchors = np.stack(
        [
            rng.uniform(-40, 40, n),
            rng.uniform(-40, 40, n),
            rng.uniform(-3, 1, n),
            rng.uniform(0.5, 4.0, n),
            rng.uniform(0.5, 4.0, n),
            rng.uniform(0.5, 3.0, n),
            rng.uniform(-np.pi, np.pi, n),
        ],
        axis=-1,
    ).astype(np.float32)
    deltas = rng.normal(0, 0.4, (n, 7)).astype(np.float32)
    boxes = np.stack(
        [
            anchors[:, 0] + rng.normal(0, 1, n),
            anchors[:, 1] + rng.normal(0, 1, n),
            anchors[:, 2] + rng.normal(0, 0.3, n),
            anchors[:, 3] * np.exp(rng.normal(0, 0.2, n)),
            anchors[:, 4] * np.exp(rng.normal(0, 0.2, n)),
            anchors[:, 5] * np.exp(rng.normal(0, 0.2, n)),
            rng.uniform(-np.pi, np.pi, n),
        ],
        axis=-1,
    ).astype(np.float32)
    enc = be.encode(torch.from_numpy(boxes), torch.from_numpy(anchors)).numpy()
    dec = be.decode(torch.from_numpy(deltas), torch.from_numpy(anchors)).numpy()
    np.savez(
        OUT / "box_encode.npz",
        anchors=anchors, boxes=boxes, deltas=deltas, encoded=enc, decoded=dec,
    )
    print("box_encode.npz", enc.shape, dec.shape)


def golden_anchors():
    sys.path.insert(0, str(REF.parent))
    try:
        from yacs.config import CfgNode  # noqa: F401

        have_yacs = True
    except ImportError:
        have_yacs = False

    ag = load_module("ref_anchor_generator", REF / "core" / "anchor_generator.py")

    class FakeCfg:
        VOXEL_SIZE = [0.05, 0.05, 0.1]
        STRIDES = [1, 2, 4, 8]
        GRID_BOUNDS = [0, -40, -3, 70.4, 40, 1]
        NUM_CLASSES = 3
        ANCHORS = [
            dict(wlh=[1.6, 3.9, 1.56], yaw=[0, np.pi / 2], center_z=-1.0),
            dict(wlh=[0.6, 0.8, 1.73], yaw=[0, np.pi / 2], center_z=-0.6),
            dict(wlh=[0.6, 1.76, 1.73], yaw=[0, np.pi / 2], center_z=-0.6),
        ]

    anchors = ag.AnchorGenerator(FakeCfg()).anchors.numpy()
    # Full grid is 3*2*200*176*7 ~ 5.9M floats; store a strided sample + stats.
    np.savez(
        OUT / "anchors.npz",
        shape=np.asarray(anchors.shape),
        sample=anchors[:, :, ::17, ::13],
        mean=anchors.mean((0, 1, 2, 3)),
        corner000=anchors[:, :, 0, 0],
        corner_end=anchors[:, :, -1, -1],
    )
    print("anchors.npz", anchors.shape)


def golden_matcher():
    import torch

    m = load_module("ref_matcher", REF / "ops" / "matcher.py")
    rng = np.random.default_rng(3)
    iou = rng.uniform(0, 1, (6, 500)).astype(np.float32)
    # sprinkle exact threshold values to pin boundary semantics
    iou[0, :10] = [0.45, 0.6, 0.2, 0.35, 0.0, 0.449999, 0.599999, 1.0, 0.45, 0.6]
    for allow in (False, True):
        matcher = m.Matcher([0.45, 0.6], [0, -1, 1], allow)
        matches, labels = matcher(torch.from_numpy(iou))
        np.savez(
            OUT / f"matcher_allow{int(allow)}.npz",
            iou=iou, matches=matches.numpy(), labels=labels.numpy(),
        )
    # empty gt case
    matcher = m.Matcher([0.45, 0.6], [0, -1, 1], False)
    matches, labels = matcher(torch.zeros((0, 50)))
    np.savez(OUT / "matcher_empty.npz", matches=matches.numpy(), labels=labels.numpy())
    print("matcher goldens done")


def golden_focal_loss():
    import torch

    fl = load_module("ref_focal_loss", REF / "ops" / "focal_loss.py")
    rng = np.random.default_rng(11)
    logits = rng.normal(0, 3, (64, 8)).astype(np.float32)
    targets = (rng.uniform(size=(64, 8)) > 0.7).astype(np.float32)
    out = fl.sigmoid_focal_loss(
        torch.from_numpy(logits), torch.from_numpy(targets), reduction="none"
    ).numpy()
    np.savez(OUT / "focal_loss.npz", logits=logits, targets=targets, loss=out)
    print("focal_loss.npz")


def golden_rotated_iou():
    """Compile the torch-free reference header and evaluate random pairs."""
    tool_dir = pathlib.Path(__file__).resolve().parent
    binary = tool_dir / "iou_golden"
    subprocess.run(
        [
            "g++", "-O2", "-std=c++14",
            "-I", str(REF / "ops" / "csrc"),
            str(tool_dir / "iou_golden.cpp"), "-o", str(binary),
        ],
        check=True,
    )
    rng = np.random.default_rng(5)
    cases = []
    # random near-overlapping pairs (both radian-scale and degree-scale angles)
    for scale in (np.pi, 180.0):
        c = rng.uniform(-5, 5, (200, 2))
        wh1 = rng.uniform(0.5, 6, (200, 2))
        wh2 = rng.uniform(0.5, 6, (200, 2))
        a1 = rng.uniform(-scale, scale, (200, 1))
        a2 = rng.uniform(-scale, scale, (200, 1))
        off = rng.uniform(-3, 3, (200, 2))
        cases.append(
            np.concatenate([c, wh1, a1, c + off, wh2, a2], axis=1)
        )
    # degenerate / identical / touching
    special = np.array(
        [
            [0, 0, 2, 2, 0, 0, 0, 2, 2, 0],
            [0, 0, 2, 2, 0, 2, 0, 2, 2, 0],
            [0, 0, 2, 2, 0, 1, 0, 2, 2, 0],
            [0, 0, 2, 2, 0, 0, 0, 2, 2, 45],
            [0, 0, 2, 2, 0, 0, 0, 2, 2, 90],
            [0, 0, 1, 4, 30, 0, 0, 4, 1, 30],
            [0, 0, 2, 2, 0, 10, 10, 2, 2, 0],
            [5, 3, 4, 2, -90, 5, 3, 4, 2, 90],
        ],
        dtype=np.float64,
    )
    pairs = np.concatenate(cases + [special], axis=0)
    inp = f"{len(pairs)}\n" + "\n".join(
        " ".join(f"{v:.9f}" for v in row) for row in pairs
    )
    res = subprocess.run(
        [str(binary)], input=inp, capture_output=True, text=True, check=True
    )
    ious = np.array([float(x) for x in res.stdout.split()], dtype=np.float64)
    np.savez(OUT / "rotated_iou.npz", pairs=pairs, ious=ious)
    binary.unlink()
    print("rotated_iou.npz", len(pairs))


if __name__ == "__main__":
    golden_box_encode()
    golden_anchors()
    golden_matcher()
    golden_focal_loss()
    golden_rotated_iou()
    print("all goldens written to", OUT)
