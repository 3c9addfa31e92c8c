"""Checkpoint save/restore via orbax (reference vision3d/train.py:23-42).

The reference torch.saves {state_dict, optimizer, epoch, meta} to
./ckpts/epoch_{E}.pth every 3 epochs and resumes model+optimizer+epoch,
fast-forwarding the LR schedule by step count. Here the whole TrainState
(params, batch_stats, opt_state, step) round-trips through orbax; the
optax schedule replays automatically from ``state.step``.
"""

import os.path as osp

import jax
import orbax.checkpoint as ocp

from vision3d_tpu.training.train import TrainState


def save_checkpoint(ckpt_dir: str, state: TrainState, epoch: int):
    path = osp.abspath(osp.join(ckpt_dir, f"epoch_{epoch}"))
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(state), force=True)
    return path


def load_checkpoint(path: str, target: TrainState) -> TrainState:
    """Restore into the structure of ``target`` (an initialized state)."""
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(osp.abspath(path), target=jax.device_get(target))


def maybe_resume(ckpt_dir: str, target: TrainState):
    """Reference load_ckpt semantics (train.py:35-42): missing file ->
    epoch 0 and untouched state. Scans for the newest epoch_* directory."""
    import glob

    candidates = sorted(
        glob.glob(osp.join(ckpt_dir, "epoch_*")),
        key=lambda p: int(p.rsplit("_", 1)[-1]),
    )
    if not candidates:
        return target, 0
    newest = candidates[-1]
    epoch = int(newest.rsplit("_", 1)[-1])
    return load_checkpoint(newest, target), epoch + 1
