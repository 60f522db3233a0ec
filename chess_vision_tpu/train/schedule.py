"""LR schedule: linear warmup then cosine decay to 0, stepped per optimizer
step (reference train.py:79-94 semantics: lr(0) = 0 during warmup)."""

from __future__ import annotations

import math

import jax.numpy as jnp


def warmup_cosine_schedule(
    base_lr: float, warmup_steps: int, total_steps: int
):
    """Returns an optax-compatible schedule fn step -> lr.

    Host ints/floats are computed with plain math (a device program dispatched
    from the step loop for log output would block on the remote backend every
    step); traced values use jnp so optax can fold the schedule into the
    jitted update.
    """

    def schedule(step):
        if isinstance(step, (int, float)):
            warm = step / max(warmup_steps, 1)
            progress = (step - warmup_steps) / max(total_steps - warmup_steps, 1)
            cos = 0.5 * (1.0 + math.cos(math.pi * progress))
            return base_lr * (warm if step < warmup_steps else cos)
        step = jnp.asarray(step, jnp.float32)
        warm = step / max(warmup_steps, 1)
        progress = (step - warmup_steps) / max(total_steps - warmup_steps, 1)
        cos = 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
        return base_lr * jnp.where(step < warmup_steps, warm, cos)

    return schedule


def build_schedule(cfg: dict, steps_per_epoch: int):
    warmup_epochs = cfg["scheduler"]["warmup_epochs"]
    total_epochs = cfg["training"]["epochs"]
    return warmup_cosine_schedule(
        base_lr=cfg["training"]["lr"],
        warmup_steps=warmup_epochs * steps_per_epoch,
        total_steps=total_epochs * steps_per_epoch,
    )
