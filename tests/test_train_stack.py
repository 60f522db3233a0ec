"""Training-stack integration tests on the virtual 8-device CPU mesh:
jitted train step over a sharded batch, metrics, checkpoint round-trip,
freeze-backbone masking.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chess_vision_tpu.models import build_model
from chess_vision_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_sharding,
    shard_batch,
)
from chess_vision_tpu.train.loop import jit_steps, make_steps
from chess_vision_tpu.train.metrics import accumulate, batch_metric_sums, finalize
from chess_vision_tpu.train.state import create_train_state


def _small_cfg(arch="square", freeze=False):
    return {
        "model": {
            "arch": arch, "input_size": 64, "square_overlap": 1.5,
            "square_input_size": 32, "head_dropout": 0.0,
            "drop_path_rate": 0.0, "freeze_backbone": freeze,
        },
        "training": {
            "mixed_precision": False, "epochs": 2, "batch_size": 16,
            "lr": 1e-3, "weight_decay": 0.01, "grad_clip_norm": 1.0,
            "label_smoothing": 0.1, "turn_loss_weight": 1.0,
            "castling_loss_weight": 1.0,
        },
        "scheduler": {"warmup_epochs": 1},
    }


def _fake_batch(rng, n=16, size=64):
    return {
        "image": rng.integers(0, 256, size=(n, size, size, 3)).astype(np.uint8),
        "squares": rng.integers(0, 13, size=(n, 64)).astype(np.int32),
        "turn": rng.integers(0, 2, size=(n, 1)).astype(np.float32),
        "castling": rng.integers(0, 2, size=(n, 4)).astype(np.float32),
        "legal": np.ones((n, 1), np.float32),
        "mask": np.ones(n, np.float32),
    }


def _setup(cfg, seed=0):
    model = build_model(cfg)
    size = cfg["model"]["input_size"]
    variables = model.init(
        {"params": jax.random.key(seed), "dropout": jax.random.key(1)},
        jnp.zeros((1, size, size, 3)), train=False,
    )
    state, schedule = create_train_state(cfg, variables, steps_per_epoch=4)
    mean = std = (0.5, 0.5, 0.5)
    train_step, eval_step = make_steps(model, cfg, None, mean, std)
    return model, state, schedule, jit_steps(train_step, eval_step)


def test_train_step_runs_on_8device_mesh(rng):
    cfg = _small_cfg()
    model, state, schedule, (train_step, eval_step) = _setup(cfg)
    mesh = make_mesh()
    assert mesh.devices.size == 8

    state = jax.device_put(state, state.replace(
        params=param_sharding(mesh, state.params),
        opt_state=jax.tree.map(
            lambda _: param_sharding(mesh, {"x": jnp.zeros(())})["x"],
            state.opt_state),
        batch_stats=jax.tree.map(
            lambda _: param_sharding(mesh, {"x": jnp.zeros(())})["x"],
            state.batch_stats),
        step=param_sharding(mesh, {"x": jnp.zeros(())})["x"],
    ))

    losses = []
    batch = _fake_batch(rng)
    for i in range(3):
        db = shard_batch(batch, mesh)
        assert db["image"].sharding.spec == batch_sharding(mesh).spec
        state, sums = train_step(state, db, jax.random.key(0))
        losses.append(float(sums["step_loss"]))
    assert int(state.step) == 3
    # same batch repeatedly -> loss must decrease
    assert losses[-1] < losses[0]

    ev = eval_step(state.params, state.batch_stats, shard_batch(batch, mesh))
    m = finalize(accumulate(None, ev))
    assert 0.0 <= m["square_acc"] <= 1.0
    assert m["loss"] > 0


def test_metrics_mask_excludes_padding(rng):
    outputs = {
        "squares": jnp.asarray(rng.normal(size=(4, 832)).astype(np.float32)),
        "turn": jnp.asarray(rng.normal(size=(4, 1)).astype(np.float32)),
        "castling": jnp.asarray(rng.normal(size=(4, 4)).astype(np.float32)),
    }
    batch = {
        "squares": jnp.asarray(rng.integers(0, 13, (4, 64)).astype(np.int32)),
        "turn": jnp.ones((4, 1), jnp.float32),
        "castling": jnp.ones((4, 4), jnp.float32),
        "mask": jnp.asarray([1, 1, 0, 0], jnp.float32),
    }
    sums = batch_metric_sums(outputs, batch, jnp.asarray(1.0))
    assert float(sums["n"]) == 2.0
    # subset equivalence
    sub_out = {k: v[:2] for k, v in outputs.items()}
    sub_batch = {k: v[:2] for k, v in batch.items() if k != "mask"}
    sub = batch_metric_sums(sub_out, sub_batch, jnp.asarray(1.0))
    for k in ("squares_correct", "boards_correct", "turn_correct"):
        assert float(sums[k]) == float(sub[k])


def test_checkpoint_roundtrip(tmp_path, rng):
    from chess_vision_tpu.utils.checkpoint import (
        load_checkpoint,
        restore_tree,
        save_checkpoint,
    )

    cfg = _small_cfg()
    model, state, schedule, (train_step, eval_step) = _setup(cfg)
    mesh = make_mesh()
    batch = _fake_batch(rng)
    state, _ = train_step(state, shard_batch(batch, mesh), jax.random.key(0))

    path = str(tmp_path / "latest.ckpt")
    save_checkpoint(path, state.params, state.opt_state, state.batch_stats,
                    step=int(state.step), epoch=0, best_val_acc=0.5, config=cfg)

    ckpt = load_checkpoint(path)
    assert ckpt["config"] == cfg
    assert ckpt["epoch"] == 0 and ckpt["step"] == 1
    assert ckpt["best_val_acc"] == 0.5

    # restore into a freshly initialized state -> identical params
    model2, state2, _, _ = _setup(cfg, seed=123)
    restored = restore_tree(state2.params, ckpt["params"])
    for a, b in zip(jax.tree.leaves(restored), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    restored_opt = restore_tree(state2.opt_state, ckpt["opt_state"])
    for a, b in zip(jax.tree.leaves(restored_opt), jax.tree.leaves(state.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_freeze_backbone_keeps_backbone_fixed(rng):
    cfg = _small_cfg(freeze=True)
    model, state, schedule, (train_step, eval_step) = _setup(cfg)
    mesh = make_mesh()
    before = jax.tree.map(np.asarray, state.params)
    batch = _fake_batch(rng)
    for _ in range(2):
        state, _ = train_step(state, shard_batch(batch, mesh), jax.random.key(0))
    after = jax.tree.map(np.asarray, state.params)

    # backbone unchanged
    for a, b in zip(jax.tree.leaves(before["backbone"]),
                    jax.tree.leaves(after["backbone"])):
        np.testing.assert_array_equal(a, b)
    # heads did move
    moved = any(
        not np.array_equal(a, b)
        for a, b in zip(jax.tree.leaves(before["type_head"]),
                        jax.tree.leaves(after["type_head"]))
    )
    assert moved


def test_fsdp_param_sharding_shapes():
    mesh = make_mesh()
    params = {
        "big": jnp.zeros((1024, 768)),
        "small": jnp.zeros((13,)),
        "odd": jnp.zeros((999, 7)),
    }
    sh = param_sharding(mesh, params, mode="fsdp")
    placed = jax.device_put(params, sh)
    assert placed["big"].sharding.spec == ("data", None) or tuple(
        placed["big"].sharding.spec
    ) == ("data", None)
    # small/odd stay replicated
    assert placed["small"].sharding.is_fully_replicated
    assert placed["odd"].sharding.is_fully_replicated


def test_ycbcr_transport_trains_equivalently(rng, tmp_path):
    """A loader batch using the plane transport must produce (nearly) the
    same eval metrics as the RGB transport on the same images."""
    from chess_vision_tpu.data import BatchLoader, ChessDataset
    from chess_vision_tpu.datagen.generate import generate_split

    d = str(tmp_path / "imgs")
    generate_split(d, [("random", 8)], size=64, seed=11, workers=1)
    ds = ChessDataset(d, input_size=64)
    cfg = _small_cfg()
    model, state, schedule, (train_step, eval_step) = _setup(cfg)
    mesh = make_mesh(jax.devices()[:1])

    def metrics_for(transport):
        loader = BatchLoader(ds, np.arange(8), 8, num_workers=1,
                             transport=transport)
        batch = next(iter(loader))
        keys = {"image"} if transport == "rgb" else {"y", "cb", "cr"}
        assert keys <= set(batch)
        out = eval_step(state.params, state.batch_stats,
                        shard_batch(batch, mesh))
        return finalize(accumulate(None, out))

    m_rgb = metrics_for("rgb")
    m_planes = metrics_for("ycbcr420")
    # same images, same model; chroma subsampling may flip a rare near-tie
    assert abs(m_rgb["square_acc"] - m_planes["square_acc"]) < 0.05
    assert abs(m_rgb["loss"] - m_planes["loss"]) < 0.05


def test_trainable_bn_updates_stats(rng):
    """pin_backbone_bn=false must update BN running stats during training;
    the default (reference semantics) must not."""
    for pin, should_move in ((True, False), (False, True)):
        cfg = _small_cfg()
        cfg["model"]["pin_backbone_bn"] = pin
        model, state, schedule, (train_step, eval_step) = _setup(cfg)
        mesh = make_mesh(jax.devices()[:1])
        before = jax.tree.map(np.asarray, state.batch_stats)
        batch = _fake_batch(rng)
        state, _ = train_step(state, shard_batch(batch, mesh), jax.random.key(0))
        after = jax.tree.map(np.asarray, state.batch_stats)
        moved = any(
            not np.array_equal(a, b)
            for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after))
        )
        assert moved == should_move, (pin, moved)


def test_packed_transport_equivalent(rng, tmp_path):
    """Packed single-buffer transport == RGB transport metrics (same data)."""
    from chess_vision_tpu.data import BatchLoader, ChessDataset
    from chess_vision_tpu.datagen.generate import generate_split

    d = str(tmp_path / "imgs")
    generate_split(d, [("random", 8)], size=64, seed=12, workers=1)
    ds = ChessDataset(d, input_size=64)
    cfg = _small_cfg()
    model, state, schedule, (train_step, eval_step) = _setup(cfg)
    mesh = make_mesh(jax.devices()[:1])

    def metrics_for(transport):
        loader = BatchLoader(ds, np.arange(8), 8, num_workers=1,
                             transport=transport)
        batch = next(iter(loader))
        if transport == "packed":
            assert set(batch) >= {"pixels", "labels"}
            assert batch["pixels"].dtype == np.uint8
        out = eval_step(state.params, state.batch_stats,
                        shard_batch(batch, mesh))
        return finalize(accumulate(None, out))

    m_rgb = metrics_for("rgb")
    m_packed = metrics_for("packed")
    assert abs(m_rgb["square_acc"] - m_packed["square_acc"]) < 0.05
    assert abs(m_rgb["loss"] - m_packed["loss"]) < 0.05
    # packed ycbcr matches the ycbcr transport exactly
    m_planes = metrics_for("ycbcr420")
    assert m_planes["loss"] == pytest.approx(m_packed["loss"], rel=1e-5)
