#!/usr/bin/env python
"""Per-op device trace of the ViT-B train step (the backward-pass account
VERDICT r3 #2 asked for).

The bisect sweep (microbench.py train_bisect) shows: eval forward 127
ms/step at B=256 but the full train step 610-680 ms — the 2x-forward ideal
(fwd + ~2x-cost bwd + opt ~ 380 ms) is missed by ~230-300 ms. This captures
jax.profiler traces of the exact jitted train step and prints the same
per-HLO self-time table as profile_serving.py so the residual splits into
remat recompute, bwd matmul efficiency, and elementwise/optimizer passes.

Usage: python experiments/profile_train.py [batch] [iters] [remat]
  remat: full (default) | attn_out | none
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from profile_serving import TRACE_DIR, report  # noqa: E402


def _sync(x):
    np.asarray(x)


def capture(batch: int, iters: int, remat: str) -> None:
    from chess_vision_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    import jax
    import jax.numpy as jnp

    from chess_vision_tpu.models import build_model, init_variables
    from chess_vision_tpu.train.loop import make_steps
    from chess_vision_tpu.train.state import create_train_state

    cfg = {
        "model": {"arch": "vit", "input_size": 256, "head_dropout": 0.1,
                  "drop_path_rate": 0.1,
                  "remat": {"full": True, "none": False}.get(remat, remat)},
        "training": {
            "mixed_precision": True, "epochs": 10, "batch_size": batch,
            "lr": 2e-4, "weight_decay": 0.05, "grad_clip_norm": 1.0,
            "label_smoothing": 0.1, "turn_loss_weight": 1.0,
            "castling_loss_weight": 1.0,
        },
        "scheduler": {"warmup_epochs": 1},
    }
    model = build_model(cfg)
    variables = init_variables(model, 256)
    state, _ = create_train_state(cfg, variables, steps_per_epoch=351)
    train_step, _ = make_steps(
        model, cfg, class_weights=None, mean=(0.5,) * 3, std=(0.5,) * 3)

    rng = np.random.default_rng(0)
    batch_d = {
        "image": jnp.asarray(
            rng.integers(0, 256, (batch, 256, 256, 3)), jnp.uint8),
        "squares": jnp.asarray(rng.integers(0, 13, (batch, 64)), jnp.int32),
        "turn": jnp.asarray(rng.integers(0, 2, (batch, 1)), jnp.float32),
        "castling": jnp.asarray(
            rng.integers(0, 2, (batch, 4)), jnp.float32),
        "legal": jnp.ones((batch, 1), jnp.float32),
        "mask": jnp.ones(batch, jnp.float32),
    }
    key = jax.random.key(0)

    # non-donated wrapper: the traced loop reuses `state` across iterations
    step = jax.jit(lambda st, b, k: train_step(st, b, k)[0])

    t0 = time.time()
    state2 = step(state, batch_d, key)
    _sync(jax.tree.leaves(state2.params)[0])
    print(f"compile+warmup {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    st = state
    for i in range(iters):
        st = step(st, batch_d, jax.random.fold_in(key, i))
    _sync(jax.tree.leaves(st.params)[0])
    dt = time.time() - t0
    print(f"untraced: {batch * iters / dt:.1f} img/s "
          f"({dt / iters * 1e3:.1f} ms/step, remat={remat})", flush=True)

    with jax.profiler.trace(TRACE_DIR):
        st = state
        for i in range(iters):
            st = step(st, batch_d, jax.random.fold_in(key, i))
        _sync(jax.tree.leaves(st.params)[0])
    print("trace captured", flush=True)


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    it = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    rm = sys.argv[3] if len(sys.argv) > 3 else "full"
    os.system(f"rm -rf {TRACE_DIR}")
    capture(b, it, rm)
    report(it)
