"""Training step and loop for SECOND (reference vision3d/train.py).

Behavioral spec: Adam with OneCycle LR stepped per iteration at max_lr
0.01 (reference train.py:68,75-80,90 — note the reference hardcodes 0.01
and ignores cfg.TRAIN.LR), global-norm gradient clipping at 35
(train.py:66), checkpoint every 3 epochs (train.py:71-72).

TPU design: one pure jit-compiled ``train_step`` containing target
assignment, the forward pass, loss, gradients and the optimizer update —
donated state, batch-sharded inputs over the mesh's data axis, XLA-inserted
gradient psum (no explicit collectives needed).
"""

from typing import Any, Dict

import flax.struct
import jax
import jax.numpy as jnp
import optax

from vision3d_tpu.config import Config
from vision3d_tpu.core.anchors import make_anchors
from vision3d_tpu.core.targets import assign_targets_batch
from vision3d_tpu.models.losses import proposal_loss
from vision3d_tpu.models.second import Second


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array


def make_lr_schedule(cfg: Config, steps_per_epoch: int):
    """OneCycle with torch defaults (pct_start .3, div 25, final_div 1e4,
    cosine anneal) matching reference train.py:75-80."""
    total = max(cfg.train.epochs * steps_per_epoch, 1)
    return optax.cosine_onecycle_schedule(
        transition_steps=total,
        peak_value=cfg.train.max_lr,
        pct_start=0.3,
        div_factor=25.0,
        final_div_factor=1e4,
    )


def make_optimizer(cfg: Config, steps_per_epoch: int):
    return optax.chain(
        optax.clip_by_global_norm(cfg.train.grad_clip_norm),
        optax.adam(make_lr_schedule(cfg, steps_per_epoch)),
    )


def create_train_state(cfg: Config, rng, steps_per_epoch: int = 1000,
                       example_batch=None):
    from vision3d_tpu.models.second import create_second

    model, variables = create_second(cfg, rng, example_batch)
    tx = make_optimizer(cfg, steps_per_epoch)
    state = TrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )
    return model, tx, state


def make_train_step(model: Second, tx, cfg: Config, anchors=None):
    """Build the jit-able train step closure.

    Batch dict fields (all fixed capacity, see data pipeline):
      points (B, P, C) f32 | num_points (B,) i32
      boxes (B, G, 7) f32 | class_idx (B, G) i32
      gt_mask (B, G) bool | box_ignore (B, G) bool
    """
    if anchors is None:
        anchors = jnp.asarray(make_anchors(cfg))

    def loss_fn(params, batch_stats, batch, targets):
        (cls_map, reg_map), mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["points"], batch["num_points"], train=True,
            mutable=["batch_stats"],
        )
        losses = proposal_loss(cls_map, reg_map, targets, cfg)
        return losses["loss"], (losses, mutated["batch_stats"])

    def train_step(state: TrainState, batch: Dict[str, jax.Array]):
        targets = assign_targets_batch(
            batch["boxes"], batch["class_idx"], batch["gt_mask"],
            batch["box_ignore"], anchors, cfg,
        )
        targets = jax.lax.stop_gradient(targets)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (losses, new_stats)), grads = grad_fn(
            state.params, state.batch_stats, batch, targets
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=params,
            batch_stats=new_stats,
            opt_state=opt_state,
            step=state.step + 1,
        )
        return new_state, losses

    return train_step


def make_pvrcnn_train_step(model, tx, cfg: Config, anchors=None,
                           train_stage2: bool = True, seed: int = 0):
    """Two-stage PV-RCNN train step: stage-1 proposal loss (identical to
    SECOND's) plus the completed refinement loss (models/refinement.py) on
    RoI-pooled proposals. The reference can only train its proposal stage
    (SURVEY: training.md:4, model.py:84-85); stage-2 training is part of
    this framework's completion of PV-RCNN.
    """
    from vision3d_tpu.core.targets import assign_refinement_targets_keypoints
    from vision3d_tpu.models.pvrcnn import PV_RCNN
    from vision3d_tpu.models.refinement import refinement_loss

    if anchors is None:
        anchors = jnp.asarray(make_anchors(cfg))

    def keypoint_seg_loss(seg_logits, keypoints, batch, rng):
        """Auxiliary keypoint-segmentation (PKW) loss: softmax CE between
        the seg head's (n_cls + 1) logits and the keypoint-radius targets'
        class/background channels, ignoring ignore-channel keypoints."""
        keys = jax.random.split(rng, keypoints.shape[0])
        cls_t, _ = jax.vmap(
            assign_refinement_targets_keypoints,
            in_axes=(0, 0, 0, 0, 0, None),
        )(keys, keypoints, batch["boxes"], batch["class_idx"],
          batch["gt_mask"], cfg)          # (B, K, n_cls + 2)
        valid = cls_t[..., -1] == 0.0     # not ignore
        labels = cls_t[..., :-1]          # classes + background
        ce = optax.softmax_cross_entropy(seg_logits, labels)
        n = jnp.maximum(valid.sum(), 1.0)
        return jnp.where(valid, ce, 0.0).sum() / n

    def loss_fn(params, batch_stats, batch, targets, rng):
        variables = {"params": params, "batch_stats": batch_stats}
        if train_stage2:
            out, mutated = model.apply(
                variables, batch["points"], batch["num_points"], anchors, rng,
                train=True, mutable=["batch_stats"], method=PV_RCNN.two_stage,
            )
            losses = proposal_loss(out["cls_map"], out["reg_map"], targets, cfg)
            rl = refinement_loss(
                out["box_deltas"], out["conf_logits"], out["proposals"],
                jnp.ones(out["proposals"].shape[:2], bool),
                batch["boxes"], batch["gt_mask"], cfg,
            )
            losses.update(rl)
            seg = keypoint_seg_loss(
                out["seg_logits"], out["keypoints"], batch, rng
            )
            losses["seg_loss"] = seg
            losses["loss"] = losses["loss"] + rl["refine_loss"] + seg
        else:
            (cls_map, reg_map), mutated = model.apply(
                variables, batch["points"], batch["num_points"], train=True,
                mutable=["batch_stats"],
            )
            losses = proposal_loss(cls_map, reg_map, targets, cfg)
        return losses["loss"], (losses, mutated["batch_stats"])

    def train_step(state: TrainState, batch):
        targets = assign_targets_batch(
            batch["boxes"], batch["class_idx"], batch["gt_mask"],
            batch["box_ignore"], anchors, cfg,
        )
        targets = jax.lax.stop_gradient(targets)
        rng = jax.random.fold_in(jax.random.PRNGKey(seed), state.step)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (losses, new_stats)), grads = grad_fn(
            state.params, state.batch_stats, batch, targets, rng
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(
            params=params, batch_stats=new_stats, opt_state=opt_state,
            step=state.step + 1,
        ), losses

    return train_step


def create_pvrcnn_train_state(cfg: Config, rng, steps_per_epoch: int = 1000,
                              example_batch=None, two_stage: bool = True):
    from vision3d_tpu.models.pvrcnn import create_pvrcnn

    model, variables = create_pvrcnn(cfg, rng, example_batch, two_stage)
    tx = make_optimizer(cfg, steps_per_epoch)
    state = TrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )
    return model, tx, state
