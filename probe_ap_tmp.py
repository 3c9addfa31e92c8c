import json
import dataclasses
import numpy as np, jax, jax.numpy as jnp
from vision3d_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()
from vision3d_tpu.config import Config
from vision3d_tpu.data.kitti import KittiDataset
from vision3d_tpu.data.loader import DataLoader
from vision3d_tpu.training.checkpoint import load_checkpoint
from vision3d_tpu.training.train import create_train_state
from vision3d_tpu.core.anchors import make_anchors
from vision3d_tpu.models.second import Second
from vision3d_tpu.models.head import extract_detections

cfg = Config.from_yaml("configs/second/car.yaml")
cfg = cfg.replace(data=dataclasses.replace(cfg.data,
    rootdir="data/synth_kitti/training/", splitdir="data/synth_kitti/splitfiles/",
    cachedir="data/synth_kitti/cache/"))
dataset = KittiDataset(cfg, split="val")
model, tx, state = create_train_state(cfg, jax.random.PRNGKey(0))
h0 = float(sum(jnp.abs(x).sum() for x in jax.tree_util.tree_leaves(state.params)))
state = load_checkpoint("ckpts_synth/epoch_2", state)
h1 = float(sum(jnp.abs(x).sum() for x in jax.tree_util.tree_leaves(state.params)))
print("param L1 before/after load:", h0, h1)
variables = {"params": state.params, "batch_stats": state.batch_stats}
anchors = jnp.asarray(make_anchors(cfg))
loader = DataLoader(dataset, cfg, batch_size=8, shuffle=False, drop_last=False)
batch = next(iter(loader))
det = model.apply(variables, jnp.asarray(batch["points"]), jnp.asarray(batch["num_points"]), anchors, method=Second.inference)
per = extract_detections(det)
for b in range(3):
    fi = int(batch["frame_idx"][b]); anno = dataset.annotations[fi]
    d = per[b]
    print("frame", fi, "ngt", len(anno["boxes"]), "ndet", len(d["boxes"]),
          "top scores", np.round(np.sort(np.asarray(d["scores"]))[::-1][:5], 3))
    if len(d["boxes"]): print("  det0", np.round(np.asarray(d["boxes"][0]), 2))
    if len(anno["boxes"]): print("  gt0 ", np.round(np.asarray(anno["boxes"][0]), 2))
