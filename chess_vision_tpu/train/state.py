"""Train state and optimizer construction.

AdamW (torch-default hyperparameters) + global-norm gradient clipping +
per-step warmup/cosine schedule, with optional backbone freezing implemented
as an optimizer partition (the JAX equivalent of requires_grad=False at
reference models/vit.py:66-68 / train.py:325-329).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from chess_vision_tpu.fen import NUM_CLASSES, fen_to_labels
from chess_vision_tpu.train.schedule import build_schedule


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    batch_stats: Any  # pinned BN stats (square model); empty dict otherwise
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1, params=new_params, opt_state=new_opt_state
        )


def _freeze_labels(params, freeze_backbone: bool):
    """Label each parameter 'train' or 'freeze' (backbone subtree)."""

    def label(path, _):
        if freeze_backbone and path and path[0].key == "backbone":
            return "freeze"
        return "train"

    return jax.tree_util.tree_map_with_path(label, params)


def build_optimizer(cfg: dict, steps_per_epoch: int, params):
    schedule = build_schedule(cfg, steps_per_epoch)
    tcfg = cfg["training"]
    inner = optax.chain(
        optax.clip_by_global_norm(tcfg.get("grad_clip_norm", 1.0)),
        optax.adamw(
            learning_rate=schedule,
            b1=0.9,
            b2=0.999,
            eps=1e-8,
            weight_decay=tcfg.get("weight_decay", 0.0),
        ),
    )
    freeze = cfg["model"].get("freeze_backbone", False)
    if freeze:
        tx = optax.multi_transform(
            {"train": inner, "freeze": optax.set_to_zero()},
            _freeze_labels(params, True),
        )
    else:
        tx = inner
    return tx, schedule


def create_train_state(cfg: dict, variables: dict, steps_per_epoch: int):
    params = variables["params"]
    tx, schedule = build_optimizer(cfg, steps_per_epoch, params)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        batch_stats=variables.get("batch_stats", {}),
        tx=tx,
    )
    return state, schedule


def compute_class_weights(samples: list[dict]) -> jnp.ndarray | None:
    """Inverse-sqrt-frequency class weights from manifest FENs, normalized to
    mean 1 (reference train.py:63-76)."""
    import numpy as np

    counts = np.zeros(NUM_CLASSES, dtype=np.float64)
    for sample in samples:
        fen = sample.get("fen")
        if fen:
            labels = fen_to_labels(fen.split()[0])
            counts += np.bincount(labels, minlength=NUM_CLASSES)
    if counts.sum() == 0:
        return None
    freq = counts / counts.sum()
    weights = 1.0 / np.sqrt(np.clip(freq, 1e-6, None))
    weights /= weights.mean()
    return jnp.asarray(weights, jnp.float32)
