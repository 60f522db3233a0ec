"""Tests for the YAML config loader + dot-override semantics (reference train.py:31-60)."""

import pytest
import yaml

from chess_vision_tpu.config import apply_overrides, get_data_config, load_config

BASE = {
    "data": {"max_samples": None, "val_split": 0.1, "train_dir": "data/train"},
    "model": {"pretrained": True, "input_size": 256},
    "training": {"epochs": 10, "lr": 1.0e-4, "mixed_precision": True},
}


def test_override_int():
    cfg = yaml.safe_load(yaml.dump(BASE))
    apply_overrides(cfg, ["training.epochs=3"])
    assert cfg["training"]["epochs"] == 3
    assert isinstance(cfg["training"]["epochs"], int)


def test_override_float():
    cfg = yaml.safe_load(yaml.dump(BASE))
    apply_overrides(cfg, ["training.lr=5e-5", "data.val_split=0.2"])
    assert cfg["training"]["lr"] == pytest.approx(5e-5)
    assert cfg["data"]["val_split"] == pytest.approx(0.2)


def test_override_bool():
    cfg = yaml.safe_load(yaml.dump(BASE))
    apply_overrides(cfg, ["model.pretrained=false", "training.mixed_precision=yes"])
    assert cfg["model"]["pretrained"] is False
    assert cfg["training"]["mixed_precision"] is True


def test_override_none_coercion():
    cfg = yaml.safe_load(yaml.dump(BASE))
    apply_overrides(cfg, ["data.max_samples=50"])
    assert cfg["data"]["max_samples"] == 50
    cfg = yaml.safe_load(yaml.dump(BASE))
    apply_overrides(cfg, ["data.max_samples=hello"])
    assert cfg["data"]["max_samples"] == "hello"


def test_override_string():
    cfg = yaml.safe_load(yaml.dump(BASE))
    apply_overrides(cfg, ["data.train_dir=/tmp/x"])
    assert cfg["data"]["train_dir"] == "/tmp/x"


def test_reference_configs_load():
    """Our shipped configs mirror the reference's schema and load cleanly."""
    import os

    cfg_dir = os.path.join(os.path.dirname(__file__), "..", "configs")
    names = os.listdir(cfg_dir)
    assert any("square" in n for n in names)
    for name in names:
        cfg = load_config(os.path.join(cfg_dir, name))
        for section in ("data", "model", "training", "scheduler",
                        "checkpointing", "logging"):
            assert section in cfg, f"{name} missing {section}"


def test_data_config():
    vit = get_data_config("vit_base_patch16_224.augreg_in21k")
    assert vit["mean"] == (0.5, 0.5, 0.5)
    cnn = get_data_config("convnextv2_tiny.fcmae_ft_in22k_in1k")
    assert cnn["mean"] == pytest.approx((0.485, 0.456, 0.406))
    assert get_data_config("unknown_model")["input_size"] == 224
