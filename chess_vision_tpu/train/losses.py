"""Loss functions with exact torch-semantics parity.

The reference trains with nn.CrossEntropyLoss(weight, label_smoothing) on the
square logits plus BCEWithLogitsLoss on turn/castling (reference
train.py:114-152). Torch's weighted+smoothed CE has non-obvious semantics that
change the loss surface, so they are replicated exactly:

  - NLL term: per-sample weight w[y_i]; mean reduction divides by sum_i w[y_i]
  - smoothing term: -(sum_c w_c * logp_ic), same weighted-sum denominator,
    scaled by label_smoothing / num_classes
  - total = (1 - s) * nll_term + (s / K) * smooth_term
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def weighted_smoothed_cross_entropy(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    class_weights: jnp.ndarray | None = None,
    label_smoothing: float = 0.0,
    sample_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Mean cross entropy over (N, K) logits and (N,) int labels.

    sample_mask (N,) zeroes out padded rows (static-shape batches); with an
    all-ones mask this is bit-identical to the unmasked torch semantics.
    """
    num_classes = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

    if class_weights is None:
        w_per_sample = jnp.ones(labels.shape, jnp.float32)
        w_vec = jnp.ones((num_classes,), jnp.float32)
    else:
        w_vec = class_weights.astype(jnp.float32)
        w_per_sample = jnp.take(w_vec, labels)

    if sample_mask is not None:
        w_per_sample = w_per_sample * sample_mask

    denom = jnp.sum(w_per_sample)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    nll_term = jnp.sum(nll * w_per_sample) / denom

    if label_smoothing == 0.0:
        return nll_term

    # Masked rows contribute -0*inf-free zeros: w_per_sample already zero.
    smooth = -jnp.sum(logp * w_vec, axis=-1)
    if sample_mask is not None:
        smooth = smooth * sample_mask
    smooth_term = jnp.sum(smooth) / denom
    return (1.0 - label_smoothing) * nll_term + (
        label_smoothing / num_classes
    ) * smooth_term


def bce_with_logits(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    sample_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Mean binary cross entropy on logits (torch BCEWithLogitsLoss parity).

    sample_mask (N,) excludes padded rows from the mean.
    """
    x = logits.astype(jnp.float32)
    z = targets.astype(jnp.float32)
    loss = jnp.maximum(x, 0.0) - x * z + jnp.log1p(jnp.exp(-jnp.abs(x)))
    if sample_mask is None:
        return jnp.mean(loss)
    m = sample_mask[:, None]
    return jnp.sum(loss * m) / jnp.maximum(jnp.sum(m) * loss.shape[-1], 1.0)


def total_loss(
    outputs: dict,
    batch: dict,
    class_weights: jnp.ndarray | None,
    label_smoothing: float,
    turn_weight: float,
    castling_weight: float,
):
    """The reference's 3-part loss (train.py:146-152).

    Returns (loss, aux dict with the components).
    """
    num_classes = 13
    mask = batch.get("mask")
    sq_logits = outputs["squares"].reshape(-1, num_classes)
    sq_labels = batch["squares"].reshape(-1)
    sq_mask = None if mask is None else jnp.repeat(mask, 64)
    piece_loss = weighted_smoothed_cross_entropy(
        sq_logits, sq_labels, class_weights, label_smoothing, sq_mask
    )
    turn_loss = bce_with_logits(outputs["turn"], batch["turn"], mask)
    castling_loss = bce_with_logits(outputs["castling"], batch["castling"], mask)
    loss = piece_loss + turn_weight * turn_loss + castling_weight * castling_loss
    return loss, {
        "piece_loss": piece_loss,
        "turn_loss": turn_loss,
        "castling_loss": castling_loss,
    }
