"""Shape/dtype tests for the three model families + head-math parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chess_vision_tpu.fen import CLASS_TO_COLOR, CLASS_TO_TYPE, NUM_CLASSES
from chess_vision_tpu.models import build_model, param_count
from chess_vision_tpu.models.common import combine_type_color


def _cfg(arch, input_size=256, mixed=False):
    return {
        "model": {
            "arch": arch,
            "input_size": input_size,
            "head_dropout": 0.1,
            "drop_path_rate": 0.1,
            "square_overlap": 1.5,
            "square_input_size": 64,
        },
        "training": {"mixed_precision": mixed},
    }


def _init_and_apply(model, batch=2, size=256, train=False):
    x = jnp.zeros((batch, size, size, 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, x, train=False
    )
    rngs = {"dropout": jax.random.key(2)} if train else None
    out = model.apply(variables, x, train=train, rngs=rngs)
    return variables, out


def _check_outputs(out, batch=2):
    assert set(out) == {"squares", "turn", "castling"}
    assert out["squares"].shape == (batch, 832)
    assert out["turn"].shape == (batch, 1)
    assert out["castling"].shape == (batch, 4)
    for v in out.values():
        assert v.dtype == jnp.float32
        assert np.all(np.isfinite(v))


def test_combine_type_color_matches_naive():
    rng = np.random.default_rng(0)
    t = rng.normal(size=(5, 8, 8, 7)).astype(np.float32)
    c = rng.normal(size=(5, 8, 8, 3)).astype(np.float32)
    joint = np.asarray(combine_type_color(jnp.asarray(t), jnp.asarray(c)))
    for cls in range(NUM_CLASSES):
        np.testing.assert_allclose(
            joint[..., cls],
            t[..., CLASS_TO_TYPE[cls]] + c[..., CLASS_TO_COLOR[cls]],
            rtol=1e-6,
        )


@pytest.mark.parametrize("arch", ["square", "cnn", "vit"])
def test_model_shapes(arch):
    model = build_model(_cfg(arch))
    _, out = _init_and_apply(model, batch=2)
    _check_outputs(out)


def test_model_train_mode_runs_dropout():
    model = build_model(_cfg("vit"))
    variables, _ = _init_and_apply(model, batch=1)
    x = jnp.ones((1, 256, 256, 3), jnp.float32)
    a = model.apply(variables, x, train=True, rngs={"dropout": jax.random.key(1)})
    b = model.apply(variables, x, train=True, rngs={"dropout": jax.random.key(9)})
    # different dropout keys -> different outputs
    assert not np.allclose(np.asarray(a["squares"]), np.asarray(b["squares"]))
    # eval mode is deterministic
    c = model.apply(variables, x, train=False)
    d = model.apply(variables, x, train=False)
    np.testing.assert_array_equal(np.asarray(c["squares"]), np.asarray(d["squares"]))


def test_vit_param_count_matches_reference():
    """Reference ChessViT has 85,856,271 params (BASELINE.md)."""
    model = build_model(_cfg("vit"))
    variables, _ = _init_and_apply(model, batch=1)
    n = param_count(variables["params"])
    assert n == 85_856_271, f"got {n:,}"


def test_square_param_count_reasonable():
    """Reference ChessSquareCNN is ~2.9M params (README.md:9-11)."""
    model = build_model(_cfg("square"))
    variables, _ = _init_and_apply(model, batch=1)
    n = param_count(variables["params"])
    assert 2.0e6 < n < 4.0e6, f"got {n:,}"


def test_square_turn_color_stats_pathway():
    """model.turn_color_stats feeds 64x3 per-square mean colors to the
    global heads: default-off is parameter-identical to the reference; on,
    only global_fc grows (by 192 input rows) and the turn logits become
    sensitive to a background tint the pooled-feature path may discard."""
    base = _cfg("square")
    variables, _ = _init_and_apply(build_model(base), batch=1)
    n_base = param_count(variables["params"])

    cfg = _cfg("square")
    cfg["model"]["turn_color_stats"] = "true"  # --set delivers a string
    model = build_model(cfg)
    assert model.turn_color_stats is True
    variables2, out = _init_and_apply(model, batch=1)
    _check_outputs(out, batch=1)
    assert param_count(variables2["params"]) == n_base + 192 * 64


def test_cnn_param_count_reasonable():
    """Reference ChessCNN (ConvNeXtV2-Tiny) is ~28M params."""
    model = build_model(_cfg("cnn"))
    variables, _ = _init_and_apply(model, batch=1)
    n = param_count(variables["params"])
    assert 27e6 < n < 30e6, f"got {n:,}"


def test_bf16_compute_fp32_params():
    model = build_model(_cfg("square", mixed=True))
    variables, out = _init_and_apply(model, batch=1)
    _check_outputs(out, batch=1)
    for leaf in jax.tree.leaves(variables["params"]):
        assert leaf.dtype == jnp.float32


def test_unknown_arch_raises():
    with pytest.raises(ValueError):
        build_model(_cfg("transformer"))
