"""End-to-end CLI smoke tests on the virtual 8-device CPU mesh.

Runs the *actual* `train.py` entry point as a subprocess — once pure
data-parallel (dp8) and once dp2 x tp4 — on a tiny generated corpus with a
small ViT variant (model.embed_dim/depth/num_heads overrides), so the CLI
mesh paths exercised manually in experiments/logs/cli_*.log cannot regress
silently. Mirrors the reference's train entry semantics (reference
train.py:239-320) at smoke scale.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _mesh_env():
    env = dict(os.environ)
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONUNBUFFERED"] = "1"
    return env


@pytest.fixture(scope="session")
def tiny_corpus(tmp_path_factory):
    out = tmp_path_factory.mktemp("cli_corpus")
    r = subprocess.run(
        [sys.executable, "-m", "chess_vision_tpu.datagen.generate",
         "--out", str(out), "--count", "24", "--size", "256", "--seed", "7"],
        cwd=REPO, env=_mesh_env(), capture_output=True, text=True,
        timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    return out


def _run_train(tiny_corpus, tmp_path, extra):
    cmd = [
        sys.executable, "train.py", "--config", "configs/vit.yaml", "--set",
        "training.epochs=1", "training.batch_size=8", "data.num_workers=0",
        "data.max_samples=24", f"data.train_dir={tiny_corpus}",
        "model.pretrained=false", "model.embed_dim=128", "model.depth=2",
        "model.num_heads=4", "model.remat=false",
        f"checkpointing.save_dir={tmp_path / 'ckpt'}",
        f"logging.tensorboard_dir={tmp_path / 'runs'}",
    ] + extra
    r = subprocess.run(cmd, cwd=REPO, env=_mesh_env(), capture_output=True,
                       text=True, timeout=1800)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    assert "Training complete" in r.stdout
    assert "Devices: 8" in r.stdout
    assert os.path.exists(tmp_path / "ckpt" / "latest.ckpt")
    return r.stdout


def test_cli_train_dp8(tiny_corpus, tmp_path):
    _run_train(tiny_corpus, tmp_path, [])


def test_cli_train_dp2_tp4(tiny_corpus, tmp_path):
    out = _run_train(tiny_corpus, tmp_path,
                     ["training.tensor_parallel=4"])
    assert "Tensor parallel: model axis 4" in out
