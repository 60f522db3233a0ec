"""Self-describing checkpoints (msgpack, single file).

Parity with the reference's checkpoint semantics (train.py:457-471):
  - checkpoint carries {epoch, step, params, opt_state, batch_stats,
    best_val_acc, config} — the FULL config, so evaluate/predict rebuild the
    model from the checkpoint alone (reference evaluate.py:302-306)
  - latest.ckpt rewritten every epoch; best.ckpt on val board_acc improvement
  - plain resume restores params+opt_state+epoch+best; --reset-schedule keeps
    weights only (warm restart, reference train.py:336-348)
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np
from flax import serialization


def _to_numpy_tree(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    path: str,
    params,
    opt_state,
    batch_stats,
    step: int,
    epoch: int,
    best_val_acc: float,
    config: dict,
) -> None:
    payload = {
        "step": int(step),
        "epoch": int(epoch),
        "best_val_acc": float(best_val_acc),
        "config_json": json.dumps(config),
        "params": serialization.to_state_dict(_to_numpy_tree(params)),
        "opt_state": serialization.to_state_dict(_to_numpy_tree(opt_state)),
        "batch_stats": serialization.to_state_dict(_to_numpy_tree(batch_stats)),
    }
    blob = serialization.msgpack_serialize(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)  # atomic: a crash mid-write never corrupts latest.ckpt


def load_checkpoint(path: str) -> dict:
    """Raw checkpoint dict; 'config' is parsed back to a dict."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    payload["config"] = json.loads(payload.pop("config_json"))
    return payload


def restore_tree(template, state_dict):
    """Restore a pytree (params/opt_state) from its serialized state dict."""
    return serialization.from_state_dict(template, state_dict)
