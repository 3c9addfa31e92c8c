"""Single-frame inference + BEV visualization (reference vision3d/inference.py).

    python -m vision3d_tpu.inference_cli --config configs/second/car.yaml \
        --ckpt ./ckpts/epoch_12 --velo data/.../000032.bin --out dets.png

Loads a checkpoint, runs the single-graph SECOND inference (voxelize ->
sparse CNN -> RPN -> decode -> NMS on device), prints detections, and
writes a BEV image of points + boxes.
"""

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

# see train_cli: make JAX_PLATFORMS effective despite early jax imports
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None)
    ap.add_argument("--ckpt", default=None, help="orbax checkpoint dir")
    ap.add_argument("--velo", required=True, help="velodyne .bin file")
    ap.add_argument("--out", default=None, help="output BEV image path")
    args = ap.parse_args(argv)

    from vision3d_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from vision3d_tpu.config import Config
    from vision3d_tpu.core.anchors import make_anchors
    from vision3d_tpu.data.kitti import read_velo
    from vision3d_tpu.data.loader import pad_points
    from vision3d_tpu.models.head import extract_detections
    from vision3d_tpu.models.second import Second
    from vision3d_tpu.training.checkpoint import load_checkpoint
    from vision3d_tpu.training.train import create_train_state

    cfg = Config.from_yaml(args.config) if args.config else Config()
    points_np = read_velo(args.velo)
    rng = np.random.default_rng(0)
    padded, n = pad_points(points_np, cfg.capacity.max_points, rng)
    points = jnp.asarray(padded)[None]
    num = jnp.asarray([n], jnp.int32)

    model, tx, state = create_train_state(
        cfg, jax.random.PRNGKey(0), example_batch=(points, num)
    )
    if args.ckpt:
        state = load_checkpoint(args.ckpt, state)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    anchors = jnp.asarray(make_anchors(cfg))

    det = jax.jit(
        lambda p, n: model.apply(variables, p, n, anchors, method=Second.inference)
    )(points, num)
    dets = extract_detections(det)[0]
    order = np.argsort(-dets["scores"])
    for i in order:
        b = dets["boxes"][i]
        print(
            f"class={int(dets['class_idx'][i])} score={dets['scores'][i]:.3f} "
            f"xyz=({b[0]:.2f},{b[1]:.2f},{b[2]:.2f}) wlh=({b[3]:.2f},{b[4]:.2f},"
            f"{b[5]:.2f}) yaw={b[6]:.2f}"
        )

    if args.out:
        from vision3d_tpu.utils.bev_drawer import Drawer

        img = Drawer(points_np, [dets["boxes"]]).image
        try:
            import cv2

            cv2.imwrite(args.out, img[..., ::-1])
        except ImportError:
            from PIL import Image

            Image.fromarray(img).save(args.out)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
