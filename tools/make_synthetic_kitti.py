"""Synthetic-KITTI dataset writer: KITTI-format frames with planted objects.

Emits ``velodyne/*.bin``, ``label_2/*.txt``, ``calib/*.txt`` and
splitfiles (``train.txt``/``val.txt``) in the exact on-disk layout the
real dataset uses, so the ENTIRE data pipeline — label/calib parsing
(data/kitti.py), camera->velo box conversion, FOV crop into
velodyne_reduced/, annotation cache, GT-database build, paste
augmentation — runs unchanged. Purpose (VERDICT r2 item 2): close the
train -> checkpoint -> eval -> AP loop end-to-end when real KITTI data
cannot be mounted, producing official-protocol 3D AP@R40 numbers.

Scenes are LiDAR-like (surface returns, radial density falloff): a
ground plane, planted objects sampled near the per-class anchor priors
(AnchorConfig wlh/center_z) with yaw uniform in (-pi, pi], vertical
clutter (poles/walls), all inside the camera FOV of a fixed KITTI-like
calibration. Labels are written in the CAMERA frame (dims hwl,
bottom-center t, ry = -yaw) with box2d projected through P2 so
difficulty levels behave like the real parser's (data/kitti.py:62-74).

Round-5 hardening (VERDICT r4 items 4+5):
  * ``--classes all`` plants Pedestrians and Cyclists alongside Cars so
    the per-class thresholds / per-class NMS grouping / anchor stacking
    run at system level (reference detector/proposal.py:41-59).
  * The benchmark is DE-SATURATED: up to 20 cars per frame, partial
    occlusion (an azimuthal sector of an occluded object's returns is
    removed and the label's occlusion field set accordingly), and edge
    truncation (objects may straddle the camera-FOV / range boundary;
    truncation is written as the clipped-box2d area fraction) — so AP
    sits measurably below ceiling and regressions are visible.

Usage:
    python tools/make_synthetic_kitti.py --out /tmp/synth_kitti \
        [--train 400] [--val 100] [--points 18000] [--seed 0] \
        [--classes car|all]
"""

import argparse
import os
import os.path as osp
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

# KITTI-like fixed calibration: velo (x fwd, y left, z up) -> cam
# (x right, y down, z fwd); P2 focal/center near real KITTI image2.
V2C = np.array([[0.0, -1.0, 0.0, 0.0],
                [0.0, 0.0, -1.0, -0.08],
                [1.0, 0.0, 0.0, -0.27]], np.float64)
R0 = np.eye(3)
P2 = np.array([[721.5377, 0.0, 609.5593, 44.857],
               [0.0, 721.5377, 172.854, 0.2163],
               [0.0, 0.0, 1.0, 0.002746]], np.float64)
IMG_W, IMG_H = 1224, 370
GROUND_Z = -1.73


def velo_to_cam(xyz):
    """(N, 3) velodyne -> rectified camera frame."""
    xyz1 = np.concatenate([xyz, np.ones_like(xyz[:, :1])], axis=1)
    return (R0 @ (V2C @ xyz1.T)).T


def project(xyz_cam):
    """(N, 3) camera -> (N, 2) image pixels."""
    uvw = P2 @ np.concatenate(
        [xyz_cam, np.ones_like(xyz_cam[:, :1])], axis=1
    ).T
    return (uvw[:2] / uvw[2:3]).T


def in_fov(xyz_velo, margin=0.0):
    """Camera-FOV mask identical to data/kitti.py:filter_camera_fov."""
    ok = xyz_velo[:, 0] > 0.1
    cam = velo_to_cam(xyz_velo)
    uv = project(cam)
    ok &= (uv[:, 0] >= margin) & (uv[:, 0] <= IMG_W - margin)
    ok &= (uv[:, 1] >= margin) & (uv[:, 1] <= IMG_H - margin)
    return ok


def box_corners_velo(box):
    """7-dof velo box -> (8, 3) corners. box = [x y z w l h yaw],
    l along the heading direction."""
    x, y, z, w, l, h, yaw = box
    dx = np.array([1, 1, -1, -1, 1, 1, -1, -1]) * (l / 2)
    dy = np.array([1, -1, -1, 1, 1, -1, -1, 1]) * (w / 2)
    dz = np.array([-1, -1, -1, -1, 1, 1, 1, 1]) * (h / 2)
    c, s = np.cos(yaw), np.sin(yaw)
    cx = x + c * dx - s * dy
    cy = y + s * dx + c * dy
    return np.stack([cx, cy, z + dz], axis=1)


def sample_car_surface(rng, box, n):
    """n LiDAR-like returns on the car's visible surfaces, slightly inset
    so GT-database cropping (points_in_cuboids) keeps them."""
    x, y, z, w, l, h, yaw = box
    # weight faces by rough visibility from origin: two sides + roof
    n_roof = max(2, int(n * 0.2))
    n_side = n - n_roof
    u = rng.uniform(-0.5, 0.5, n_side)
    pick = rng.random(n_side)
    # local frame: x' along l, y' along w
    lx = np.where(pick < 0.5, u * l, np.sign(rng.standard_normal(n_side)) * 0.48 * l)
    ly = np.where(pick < 0.5, np.sign(rng.standard_normal(n_side)) * 0.48 * w, u * w)
    lz = rng.uniform(-0.48, 0.45, n_side) * h
    rx = rng.uniform(-0.45, 0.45, n_roof) * l
    ry_ = rng.uniform(-0.45, 0.45, n_roof) * w
    rz = np.full(n_roof, 0.47 * h) + 0.01 * rng.standard_normal(n_roof)
    lx = np.concatenate([lx, rx])
    ly = np.concatenate([ly, ry_])
    lz = np.concatenate([lz, rz])
    c, s = np.cos(yaw), np.sin(yaw)
    px = x + c * lx - s * ly
    py = y + s * lx + c * ly
    return np.stack([px, py, z + lz], axis=1)


def sample_pedestrian_surface(rng, box, n):
    """n returns on a pedestrian-like vertical capsule surface."""
    x, y, z, w, l, h, yaw = box
    th = rng.uniform(-np.pi, np.pi, n)
    v = rng.uniform(-0.48, 0.48, n)
    # torso narrows toward head/feet
    rscale = 0.48 * (1.0 - 0.5 * np.abs(v) * 2)
    lx = np.cos(th) * rscale * l
    ly = np.sin(th) * rscale * w
    lz = v * h
    c, s = np.cos(yaw), np.sin(yaw)
    px = x + c * lx - s * ly
    py = y + s * lx + c * ly
    return np.stack([px, py, z + lz], axis=1)


# Per-class plant priors: mean wlh from the AnchorConfig priors
# (vision3d_tpu/config.py AnchorConfig; reference core/config.py:22-47),
# count range per frame, bottom z, sampler, and max range (small objects
# beyond ~48m return too few points to be plantable).
CLASS_PRIORS = {
    "Car": dict(wlh=(1.63, 3.9, 1.55), sd=(0.08, 0.22, 0.07),
                count=(6, 21), xmax=64.0, sampler=sample_car_surface),
    "Pedestrian": dict(wlh=(0.6, 0.8, 1.73), sd=(0.05, 0.08, 0.09),
                       count=(2, 9), xmax=44.0,
                       sampler=sample_pedestrian_surface),
    "Cyclist": dict(wlh=(0.6, 1.76, 1.73), sd=(0.05, 0.12, 0.08),
                    count=(1, 7), xmax=48.0, sampler=sample_car_surface),
}


def occlude(rng, pts, center, occ_level):
    """Remove an azimuthal sector of an object's returns (about its own
    center) to mimic partial occlusion; sector width grows with level."""
    if occ_level == 0 or len(pts) == 0:
        return pts
    width = rng.uniform(0.3, 0.5) if occ_level == 1 else rng.uniform(0.5, 0.72)
    a0 = rng.uniform(-np.pi, np.pi)
    ang = np.arctan2(pts[:, 1] - center[1], pts[:, 0] - center[0])
    rel = (ang - a0) % (2 * np.pi)
    keep = rel > width * 2 * np.pi
    if keep.sum() < 6:  # never fully erase an object
        return pts[:6]
    return pts[keep]


def make_scene(rng, n_points, classes=("Car",)):
    """One frame: (points (N, 4) f32, objs list of (name, box7, occ))."""
    # --- plant objects (rejecting BEV-center collisions) ---
    objs = []
    for name in classes:
        pri = CLASS_PRIORS[name]
        n_want = rng.integers(*pri["count"])
        placed = 0
        for _ in range(int(n_want) * 4):
            if placed >= n_want:
                break
            cx = rng.uniform(4.0 if name != "Car" else 6.0, pri["xmax"])
            # allow FOV-edge placement so some objects are truncated
            half = min(0.8 * cx, 38.0)
            cy = rng.uniform(-half, half)
            w, l, h = (rng.normal(m, s) for m, s in
                       zip(pri["wlh"], pri["sd"]))
            yaw = rng.uniform(-np.pi, np.pi)
            rad = 0.5 * max(w, l)
            if any((cx - b[0]) ** 2 + (cy - b[1]) ** 2
                   < (rad + 0.5 * max(b[3], b[4]) + 0.6) ** 2
                   for _, b, _ in objs):
                continue
            box = np.array([cx, cy, GROUND_Z + h / 2, w, l, h, yaw])
            # partial occlusion: ~1/3 of objects lose a sector of returns
            u = rng.random()
            occ = 0 if u < 0.65 else (1 if u < 0.85 else 2)
            objs.append((name, box, occ))
            placed += 1
    # --- object surface returns with radial density falloff ---
    obj_pts = []
    for name, b, occ in objs:
        r = np.hypot(b[0], b[1])
        area = b[3] * b[4] + (b[3] + b[4]) * b[5]  # rough surface area
        m = int(np.clip(4200.0 * area / max(r, 5.0) ** 1.5, 12, 600))
        p = CLASS_PRIORS[name]["sampler"](rng, b, m)
        obj_pts.append(occlude(rng, p, b, occ))
    obj = (np.concatenate(obj_pts) if obj_pts else np.zeros((0, 3)))

    n_rest = max(n_points - len(obj), 1000)
    n_ground = int(n_rest * 0.72)
    n_clut = n_rest - n_ground

    def radial(m):
        r = 4.0 + 66.0 * rng.beta(1.15, 2.1, m)
        th = rng.uniform(-0.72, 0.72, m)
        return r * np.cos(th), r * np.sin(th)

    gx, gy = radial(n_ground)
    gz = GROUND_Z + 0.04 * rng.standard_normal(n_ground) + 0.006 * gx
    ground = np.stack([gx, gy, gz], axis=1)

    # clutter: poles and short wall segments (vertical structure)
    n_struct = 14
    sx, sy = radial(n_struct)
    si = rng.integers(0, n_struct, n_clut)
    sh = rng.uniform(0.8, 2.6, n_struct)
    sw = rng.uniform(0.05, 1.6, n_struct)
    ang = rng.uniform(0, np.pi, n_struct)
    t = rng.uniform(-0.5, 0.5, n_clut)
    cxp = sx[si] + np.cos(ang[si]) * t * sw[si]
    cyp = sy[si] + np.sin(ang[si]) * t * sw[si]
    czp = GROUND_Z + rng.uniform(0.02, 1.0, n_clut) * sh[si]
    clut = np.stack([cxp, cyp, czp], axis=1)

    pts = np.concatenate([ground, obj, clut])
    keep = in_fov(pts)
    keep &= (pts[:, 0] < 70.2) & (np.abs(pts[:, 1]) < 39.8)
    keep &= (pts[:, 2] > -2.95) & (pts[:, 2] < 0.95)
    pts = pts[keep]
    refl = rng.uniform(0.05, 0.95, (len(pts), 1))
    pts = np.concatenate([pts, refl], axis=1).astype(np.float32)
    return pts[rng.permutation(len(pts))], objs


def label_line(name, box, occ=0):
    """Velo 7-dof box -> KITTI camera-frame label line. Truncation is
    the clipped-box2d area fraction (KITTI convention: fraction of the
    object outside image bounds)."""
    x, y, z, w, l, h, yaw = box
    cam = velo_to_cam(np.array([[x, y, z]]))[0]
    ry = -yaw
    # wrap ry into [-pi, pi] for tidy labels
    ry = (ry + np.pi) % (2 * np.pi) - np.pi
    t_bottom = (cam[0], cam[1] + h / 2, cam[2])
    uv = project(velo_to_cam(box_corners_velo(box)))
    x1, y1 = uv.min(axis=0)
    x2, y2 = uv.max(axis=0)
    full = max((x2 - x1) * (y2 - y1), 1e-6)
    x1c, x2c = np.clip([x1, x2], 0, IMG_W)
    y1c, y2c = np.clip([y1, y2], 0, IMG_H)
    trunc = max(0.0, 1.0 - max(x2c - x1c, 0) * max(y2c - y1c, 0) / full)
    alpha = ry - np.arctan2(cam[0], cam[2])
    return (
        f"{name} {trunc:.2f} {occ} {alpha:.2f} "
        f"{x1c:.2f} {y1c:.2f} {x2c:.2f} {y2c:.2f} "
        f"{h:.2f} {w:.2f} {l:.2f} "
        f"{t_bottom[0]:.2f} {t_bottom[1]:.2f} {t_bottom[2]:.2f} {ry:.2f}"
    )


def calib_text():
    def fmt(name, mat):
        return name + ": " + " ".join(f"{v:.12e}" for v in mat.reshape(-1))

    zeros34 = np.zeros((3, 4))
    return "\n".join([
        fmt("P0", zeros34), fmt("P1", zeros34), fmt("P2", P2),
        fmt("P3", zeros34), fmt("R0_rect", R0),
        fmt("Tr_velo_to_cam", V2C), fmt("Tr_imu_to_velo", zeros34),
    ]) + "\n"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--train", type=int, default=400)
    ap.add_argument("--val", type=int, default=100)
    ap.add_argument("--points", type=int, default=19000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--classes", default="car", choices=["car", "all"],
                    help="car: Car only; all: Car + Pedestrian + Cyclist")
    args = ap.parse_args()

    root = osp.join(args.out, "training")
    for sub in ("velodyne", "label_2", "calib"):
        os.makedirs(osp.join(root, sub), exist_ok=True)
    os.makedirs(osp.join(args.out, "splitfiles"), exist_ok=True)

    classes = ("Car",) if args.classes == "car" else (
        "Car", "Pedestrian", "Cyclist")
    rng = np.random.default_rng(args.seed)
    n_total = args.train + args.val
    ctext = calib_text()
    for idx in range(n_total):
        pts, objs = make_scene(rng, args.points, classes)
        pts.tofile(osp.join(root, "velodyne", f"{idx:06d}.bin"))
        with open(osp.join(root, "label_2", f"{idx:06d}.txt"), "w") as f:
            for name, b, occ in objs:
                f.write(label_line(name, b, occ) + "\n")
        with open(osp.join(root, "calib", f"{idx:06d}.txt"), "w") as f:
            f.write(ctext)
        if (idx + 1) % 100 == 0:
            print(f"{idx + 1}/{n_total} frames", flush=True)

    inds = np.arange(n_total)
    np.savetxt(osp.join(args.out, "splitfiles", "train.txt"),
               inds[: args.train], fmt="%06d")
    np.savetxt(osp.join(args.out, "splitfiles", "val.txt"),
               inds[args.train:], fmt="%06d")
    print(f"wrote {args.train} train + {args.val} val frames to {args.out}")


if __name__ == "__main__":
    main()
