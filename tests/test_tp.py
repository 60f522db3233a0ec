"""Tensor-parallel sharding correctness.

The TP story is annotation-only (parallel/mesh.py tp_tree_sharding):
Megatron-style column/row-parallel PartitionSpecs on the transformer-block
weights of a ("data", "model") mesh, with XLA's GSPMD partitioner inserting
the per-block collectives. Since partitioning is semantics-preserving, the
jitted train step must produce the same losses and parameters on a 1-device
mesh and on dp x tp meshes — same oracle as tests/test_parallel.py.

Runs the FULL ViT-B architecture (the only transformer family) at 64px so
the real qkv/proj/fc1/fc2 shapes (2304/768/3072) exercise the dim-
divisibility rules.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chess_vision_tpu.models import build_model
from chess_vision_tpu.parallel.mesh import (
    _TP_RULES,
    make_mesh,
    make_mesh_2d,
    replicated,
    shard_batch,
    tp_tree_sharding,
)
from chess_vision_tpu.train.loop import jit_steps, make_steps
from chess_vision_tpu.train.state import create_train_state

CFG = {
    "model": {"arch": "vit", "input_size": 64, "head_dropout": 0.0,
              "drop_path_rate": 0.0},
    "training": {
        "mixed_precision": False, "epochs": 1, "batch_size": 8, "lr": 1e-3,
        "weight_decay": 0.01, "grad_clip_norm": 1.0, "label_smoothing": 0.1,
        "turn_loss_weight": 1.0, "castling_loss_weight": 1.0,
    },
    "scheduler": {"warmup_epochs": 0},
}


@pytest.fixture(scope="module")
def vit_and_batch():
    model = build_model(CFG)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.zeros((1, 64, 64, 3)), train=False,
    )
    # host copies: the donated train step deletes whatever device arrays the
    # state aliases, and the fixture is shared across three runs
    variables = jax.tree.map(np.asarray, variables)
    rng = np.random.default_rng(11)
    batch = {
        "image": rng.integers(0, 256, (8, 64, 64, 3)).astype(np.uint8),
        "squares": rng.integers(0, 13, (8, 64)).astype(np.int32),
        "turn": rng.integers(0, 2, (8, 1)).astype(np.float32),
        "castling": rng.integers(0, 2, (8, 4)).astype(np.float32),
        "legal": np.ones((8, 1), np.float32),
        "mask": np.ones(8, np.float32),
    }
    return model, variables, batch


def _run(model, variables, batch, mesh, shardings_fn, steps=2):
    state, _ = create_train_state(CFG, variables, steps_per_epoch=4)
    rep = replicated(mesh)
    # the same suffix rules apply to the AdamW moment trees (mu/nu mirror
    # the param tree), keeping the optimizer update fully sharded
    state = jax.device_put(state, state.replace(
        params=shardings_fn(state.params),
        opt_state=shardings_fn(state.opt_state),
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
    ev = eval_step(state.params, state.batch_stats, db)
    losses.append(float(ev["loss_sum"]))
    return losses, jax.tree.map(np.asarray, state.params)


def test_tp_rules_cover_vit_blocks(vit_and_batch):
    """Every transformer block's four matmuls get a TP spec on a 2x4 mesh,
    and the sharded dims divide tp=4 (ViT-B: 2304/768/3072)."""
    _, variables, _ = vit_and_batch
    mesh = make_mesh_2d(4, jax.devices()[:8])
    sh = tp_tree_sharding(mesh, variables["params"])
    flat = jax.tree_util.tree_flatten_with_path(sh)[0]
    n_tp = sum(
        1 for path, s in flat
        if s.spec != jax.sharding.PartitionSpec()
    )
    # 12 blocks x (qkv kernel+bias, proj kernel, fc1 kernel+bias, fc2 kernel)
    assert n_tp == 12 * len(_TP_RULES), n_tp


def test_1dev_vs_dp2_tp4_identical(vit_and_batch):
    model, variables, batch = vit_and_batch
    mesh1 = make_mesh(jax.devices()[:1])
    losses1, params1 = _run(
        model, variables, batch, mesh1,
        lambda t: jax.tree.map(lambda _: replicated(mesh1), t))
    mesh8 = make_mesh_2d(4, jax.devices()[:8])
    losses8, params8 = _run(
        model, variables, batch, mesh8, lambda t: tp_tree_sharding(mesh8, t))
    np.testing.assert_allclose(losses1, losses8, rtol=1e-5)
    # same tolerance rationale as tests/test_parallel.py: reduction-order
    # noise amplified by Adam's rsqrt on near-zero second moments
    for a, b in zip(jax.tree.leaves(params1), jax.tree.leaves(params8)):
        np.testing.assert_allclose(a, b, atol=5e-4)


def test_tp4_with_fsdp_matches_pure_tp(vit_and_batch):
    """fsdp=True shards the non-TP leaves over "data" without changing math."""
    model, variables, batch = vit_and_batch
    mesh8 = make_mesh_2d(4, jax.devices()[:8])
    losses_tp, params_tp = _run(
        model, variables, batch, mesh8, lambda t: tp_tree_sharding(mesh8, t))
    losses_f, params_f = _run(
        model, variables, batch, mesh8,
        lambda t: tp_tree_sharding(mesh8, t, fsdp=True))
    np.testing.assert_allclose(losses_tp, losses_f, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(params_tp), jax.tree.leaves(params_f)):
        np.testing.assert_allclose(a, b, atol=5e-4)
