"""Loss parity tests against torch (the reference's exact loss functions)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from chess_vision_tpu.train.losses import (
    bce_with_logits,
    weighted_smoothed_cross_entropy,
)


@pytest.mark.parametrize("smoothing", [0.0, 0.1])
@pytest.mark.parametrize("weighted", [False, True])
def test_ce_matches_torch(smoothing, weighted, rng):
    logits = rng.normal(size=(64, 13)).astype(np.float32)
    labels = rng.integers(0, 13, size=64).astype(np.int64)
    weights = (
        rng.uniform(0.5, 2.0, size=13).astype(np.float32) if weighted else None
    )

    ours = weighted_smoothed_cross_entropy(
        jnp.asarray(logits),
        jnp.asarray(labels.astype(np.int32)),
        None if weights is None else jnp.asarray(weights),
        smoothing,
    )

    crit = nn.CrossEntropyLoss(
        weight=None if weights is None else torch.from_numpy(weights),
        label_smoothing=smoothing,
    )
    ref = crit(torch.from_numpy(logits), torch.from_numpy(labels))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_ce_mask_equals_subset(rng):
    """Masked CE over padded rows == unmasked CE over the real subset."""
    logits = rng.normal(size=(16, 13)).astype(np.float32)
    labels = rng.integers(0, 13, size=16).astype(np.int32)
    weights = rng.uniform(0.5, 2.0, size=13).astype(np.float32)
    mask = np.ones(16, np.float32)
    mask[10:] = 0.0

    masked = weighted_smoothed_cross_entropy(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(weights), 0.1,
        jnp.asarray(mask),
    )
    subset = weighted_smoothed_cross_entropy(
        jnp.asarray(logits[:10]), jnp.asarray(labels[:10]),
        jnp.asarray(weights), 0.1,
    )
    np.testing.assert_allclose(float(masked), float(subset), rtol=1e-6)


def test_bce_matches_torch(rng):
    logits = rng.normal(size=(32, 4)).astype(np.float32)
    targets = rng.integers(0, 2, size=(32, 4)).astype(np.float32)
    ours = bce_with_logits(jnp.asarray(logits), jnp.asarray(targets))
    ref = nn.BCEWithLogitsLoss()(
        torch.from_numpy(logits), torch.from_numpy(targets)
    )
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_bce_mask_equals_subset(rng):
    logits = rng.normal(size=(8, 4)).astype(np.float32)
    targets = rng.integers(0, 2, size=(8, 4)).astype(np.float32)
    mask = np.array([1, 1, 1, 1, 1, 0, 0, 0], np.float32)
    masked = bce_with_logits(
        jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(mask)
    )
    subset = bce_with_logits(jnp.asarray(logits[:5]), jnp.asarray(targets[:5]))
    np.testing.assert_allclose(float(masked), float(subset), rtol=1e-6)


def test_class_weights_match_reference_formula(rng):
    """Inverse-sqrt-frequency, mean-normalized (reference train.py:63-76)."""
    from chess_vision_tpu.fen import labels_to_fen
    from chess_vision_tpu.train.state import compute_class_weights

    samples = []
    for _ in range(50):
        board = rng.integers(0, 13, size=64).astype(np.int32)
        samples.append({"fen": labels_to_fen(board) + " w - -"})

    w = np.asarray(compute_class_weights(samples))
    assert w.shape == (13,)
    np.testing.assert_allclose(w.mean(), 1.0, rtol=1e-5)

    # torch-equivalent computation
    counts = torch.zeros(13)
    for s in samples:
        import chess_vision_tpu.fen as F

        labels = torch.from_numpy(
            np.asarray(F.fen_to_labels(s["fen"].split()[0]), np.int64)
        )
        counts += torch.bincount(labels, minlength=13).float()
    freq = counts / counts.sum()
    ref = 1.0 / freq.clamp(min=1e-6).sqrt()
    ref /= ref.mean()
    np.testing.assert_allclose(w, ref.numpy(), rtol=1e-4)

    assert compute_class_weights([{"filename": "x.jpg"}]) is None


def test_schedule_matches_reference_lambda():
    """Warmup/cosine parity with reference train.py:85-90."""
    import math

    from chess_vision_tpu.train.schedule import warmup_cosine_schedule

    base, warmup, total = 3e-4, 10, 100
    sched = warmup_cosine_schedule(base, warmup, total)

    def ref_lambda(step):
        if step < warmup:
            return step / max(warmup, 1)
        progress = (step - warmup) / max(total - warmup, 1)
        return 0.5 * (1 + math.cos(math.pi * progress))

    for step in [0, 1, 5, 9, 10, 11, 50, 99, 100]:
        np.testing.assert_allclose(
            float(sched(step)), base * ref_lambda(step), rtol=1e-6, atol=1e-9,
            err_msg=f"step {step}",
        )
