"""Golden-output regression tests: fixed-seed model forwards hashed against
recorded values, so cross-round refactors can't silently change numerics.

To regenerate after an INTENTIONAL numerics change:
    python -m pytest tests/test_golden.py --regen-golden
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chess_vision_tpu.models import build_model

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden_outputs.json")


def _forward(arch: str):
    cfg = {
        "model": {"arch": arch, "input_size": 64, "head_dropout": 0.0,
                  "drop_path_rate": 0.0, "square_input_size": 32,
                  "square_overlap": 1.5},
        "training": {"mixed_precision": False},
    }
    model = build_model(cfg)
    x = jnp.asarray(
        np.linspace(0, 1, 2 * 64 * 64 * 3, dtype=np.float32).reshape(
            2, 64, 64, 3
        )
    )
    variables = model.init(
        {"params": jax.random.key(42), "dropout": jax.random.key(1)},
        x, train=False,
    )
    out = model.apply(variables, x, train=False)
    return {
        "squares_sum": float(jnp.sum(out["squares"])),
        "squares_absmax": float(jnp.max(jnp.abs(out["squares"]))),
        "turn": [float(v) for v in out["turn"][:, 0]],
        "castling_sum": float(jnp.sum(out["castling"])),
    }


@pytest.mark.parametrize("arch", ["vit", "cnn", "square"])
def test_golden_forward(arch, request):
    got = _forward(arch)
    regen = request.config.getoption("--regen-golden", default=False)
    golden = {}
    if os.path.exists(GOLDEN_PATH):
        with open(GOLDEN_PATH) as f:
            golden = json.load(f)
    if regen or arch not in golden:
        golden[arch] = got
        with open(GOLDEN_PATH, "w") as f:
            json.dump(golden, f, indent=2)
        pytest.skip(f"recorded golden outputs for {arch}")
    want = golden[arch]
    for key, val in want.items():
        np.testing.assert_allclose(
            np.asarray(got[key]), np.asarray(val), rtol=2e-4,
            err_msg=f"{arch}.{key} drifted — intentional? regen with "
                    f"--regen-golden",
        )
