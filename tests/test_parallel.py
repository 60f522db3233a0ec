"""Sharding correctness: the jitted train step must produce identical results
on a 1-device mesh and an 8-device mesh (DP and FSDP), since XLA's inserted
collectives shouldn't change the math.
"""

import jax
import jax.numpy as jnp
import numpy as np

from chess_vision_tpu.models import build_model
from chess_vision_tpu.parallel.mesh import make_mesh, param_sharding, replicated, shard_batch
from chess_vision_tpu.train.loop import jit_steps, make_steps
from chess_vision_tpu.train.state import create_train_state

CFG = {
    "model": {"arch": "cnn", "input_size": 64, "head_dropout": 0.0,
              "drop_path_rate": 0.0},
    "training": {
        "mixed_precision": False, "epochs": 1, "batch_size": 8, "lr": 1e-3,
        "weight_decay": 0.01, "grad_clip_norm": 1.0, "label_smoothing": 0.1,
        "turn_loss_weight": 1.0, "castling_loss_weight": 1.0,
    },
    "scheduler": {"warmup_epochs": 0},
}


def _run(n_devices, batch, mode="replicated", steps=2):
    model = build_model(CFG)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.zeros((1, 64, 64, 3)), train=False,
    )
    state, _ = create_train_state(CFG, variables, steps_per_epoch=4)
    mesh = make_mesh(jax.devices()[:n_devices])
    rep = replicated(mesh)
    state = jax.device_put(state, state.replace(
        params=param_sharding(mesh, state.params, mode=mode),
        opt_state=jax.tree.map(lambda _: rep, state.opt_state),
        batch_stats=jax.tree.map(lambda _: rep, state.batch_stats),
        step=rep,
    ))
    train_step, eval_step = jit_steps(*make_steps(
        model, CFG, class_weights=None, mean=(0.5,) * 3, std=(0.5,) * 3
    ))
    losses = []
    for _ in range(steps):
        db = shard_batch(batch, mesh)
        state, sums = train_step(state, db, jax.random.key(7))
        losses.append(float(sums["step_loss"]))
    params = jax.tree.map(np.asarray, state.params)
    return losses, params


def test_1dev_vs_8dev_dp_identical(rng):
    batch = {
        "image": rng.integers(0, 256, (8, 64, 64, 3)).astype(np.uint8),
        "squares": rng.integers(0, 13, (8, 64)).astype(np.int32),
        "turn": rng.integers(0, 2, (8, 1)).astype(np.float32),
        "castling": rng.integers(0, 2, (8, 4)).astype(np.float32),
        "legal": np.ones((8, 1), np.float32),
        "mask": np.ones(8, np.float32),
    }
    losses1, params1 = _run(1, batch)
    losses8, params8 = _run(8, batch)
    np.testing.assert_allclose(losses1, losses8, rtol=1e-5)
    # reduction-order noise in the psum'd grads gets amplified by Adam's
    # rsqrt on near-zero second moments; 5e-4 still catches real bugs
    for a, b in zip(jax.tree.leaves(params1), jax.tree.leaves(params8)):
        np.testing.assert_allclose(a, b, atol=5e-4)


def test_8dev_fsdp_matches_dp(rng):
    batch = {
        "image": rng.integers(0, 256, (8, 64, 64, 3)).astype(np.uint8),
        "squares": rng.integers(0, 13, (8, 64)).astype(np.int32),
        "turn": rng.integers(0, 2, (8, 1)).astype(np.float32),
        "castling": rng.integers(0, 2, (8, 4)).astype(np.float32),
        "legal": np.ones((8, 1), np.float32),
        "mask": np.ones(8, np.float32),
    }
    losses_dp, params_dp = _run(8, batch, mode="replicated")
    losses_fsdp, params_fsdp = _run(8, batch, mode="fsdp")
    np.testing.assert_allclose(losses_dp, losses_fsdp, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(params_dp), jax.tree.leaves(params_fsdp)):
        np.testing.assert_allclose(a, b, atol=5e-4)
