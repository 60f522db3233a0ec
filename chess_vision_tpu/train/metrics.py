"""Device-side metric accumulation.

The reference calls .item() on every metric every step, forcing a
device->host sync per batch (reference train.py:172-198) — on TPU that would
stall the pipeline. Here each step returns a small dict of *summed counts* as
device scalars; sums stay on device (or in async-dispatch flight) and are only
materialized once per epoch. Metric names and definitions match the
reference's seven metrics (train.py:204-212).
"""

from __future__ import annotations

import jax.numpy as jnp


def batch_metric_sums(outputs: dict, batch: dict, loss: jnp.ndarray) -> dict:
    """Per-batch summed counts (all jnp scalars, float32).

    batch["mask"] (if present) excludes padded rows from every count.
    """
    sq_logits = outputs["squares"].reshape(-1, 64, 13)
    sq_labels = batch["squares"]
    mask = batch.get("mask")
    if mask is None:
        mask = jnp.ones((sq_labels.shape[0],), jnp.float32)
    n_real = jnp.sum(mask)

    preds = jnp.argmax(sq_logits, axis=-1)
    sq_correct = preds == sq_labels
    board_correct = jnp.all(sq_correct, axis=1)

    turn_pred = (outputs["turn"] > 0).astype(jnp.float32)
    turn_correct = (turn_pred == batch["turn"])[:, 0]

    castling_pred = (outputs["castling"] > 0).astype(jnp.float32)
    castling_right_correct = castling_pred == batch["castling"]
    castling_all_correct = jnp.all(castling_right_correct, axis=1)

    full_correct = board_correct & turn_correct & castling_all_correct

    msum = lambda x, m: jnp.sum(x.astype(jnp.float32) * m)  # noqa: E731
    return {
        "loss_sum": loss.astype(jnp.float32) * n_real,
        "squares_correct": msum(sq_correct, mask[:, None]),
        "boards_correct": msum(board_correct, mask),
        "turn_correct": msum(turn_correct, mask),
        "castling_rights_correct": msum(castling_right_correct, mask[:, None]),
        "castling_all_correct": msum(castling_all_correct, mask),
        "full_fen_correct": msum(full_correct, mask),
        "n": n_real,
    }


METRIC_SUM_KEYS = (
    "loss_sum", "squares_correct", "boards_correct", "turn_correct",
    "castling_rights_correct", "castling_all_correct", "full_fen_correct",
    "n",
)


def zero_metric_sums():
    """Device-friendly zero totals (same keys as batch_metric_sums minus
    the step_* extras) — lets carried-totals programs trace once instead
    of once for None and once for dict."""
    return {k: jnp.zeros((), jnp.float32) for k in METRIC_SUM_KEYS}


def accumulate(total: dict | None, sums: dict) -> dict:
    if total is None:
        return dict(sums)
    return {k: total[k] + v for k, v in sums.items()}


def finalize(total: dict) -> dict:
    """Materialize accumulated device sums into the reference's metric dict."""
    t = {k: float(v) for k, v in total.items()}
    n = max(t["n"], 1.0)
    return {
        "loss": t["loss_sum"] / n,
        "square_acc": t["squares_correct"] / (n * 64),
        "board_acc": t["boards_correct"] / n,
        "turn_acc": t["turn_correct"] / n,
        "castling_right_acc": t["castling_rights_correct"] / (n * 4),
        "castling_acc": t["castling_all_correct"] / n,
        "full_fen_acc": t["full_fen_correct"] / n,
    }
