"""Shared head math: additive type+color logit combination.

joint[..., c] = type_logits[..., CLASS_TO_TYPE[c]] + color_logits[..., CLASS_TO_COLOR[c]]

Parity with reference models/common.py:10-24. On TPU the gather over the last
(13-wide) axis is a trivial broadcast-select XLA fuses into the head matmuls.
"""

from __future__ import annotations

import jax.numpy as jnp

from chess_vision_tpu.fen import CLASS_TO_COLOR, CLASS_TO_TYPE


def combine_type_color(
    type_logits: jnp.ndarray, color_logits: jnp.ndarray
) -> jnp.ndarray:
    """(..., 7) type logits + (..., 3) color logits -> (..., 13) joint logits."""
    t = jnp.take(type_logits, jnp.asarray(CLASS_TO_TYPE), axis=-1)
    c = jnp.take(color_logits, jnp.asarray(CLASS_TO_COLOR), axis=-1)
    return t + c
