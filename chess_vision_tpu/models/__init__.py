"""Model zoo and dispatcher.

`build_model(cfg)` mirrors the reference dispatcher
(reference models/__init__.py:8-30): cfg["model"]["arch"] in
{"vit" (default), "cnn", "square"}.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from chess_vision_tpu.models.cnn import ChessCNN  # noqa: F401
from chess_vision_tpu.models.square import ChessSquareCNN  # noqa: F401
from chess_vision_tpu.models.vit import ChessViT  # noqa: F401

ARCHS = ("vit", "cnn", "square")


def normalize_remat(value):
    """Normalize model.remat config values.

    `remat` is outside the reference YAML schema, so `--set model.remat=...`
    reaches us as a raw string (config.apply_overrides only coerces keys
    whose YAML default types it can see). Map the string spellings onto the
    real values; unknown strings ("auto", "attn_out") pass through."""
    if isinstance(value, str):
        v = value.lower()
        if v in ("true", "1", "yes", "full"):
            return True
        if v in ("false", "0", "no", "none"):
            return False
        return v
    return value


def resolve_remat(per_device_batch: int, device_cache_bytes: float = 0.0,
                  hbm_bytes: float | None = None):
    """Auto remat policy for ViT-B training (VERDICT r4 #4).

    Rematerialization trades FLOPs for HBM: full remat measured 518.8 img/s,
    remat="attn_out" 557.4, remat=False 637.1 at b=256 on the v5e
    (experiments/EXPERIMENTS.md round 4) — so run with the least remat that
    fits. The budget model is calibrated against two measured fit points:
    noremat b=512 runs without a device cache (activations <= ~22 MB/img),
    and full remat is what survives next to a 10-12 GB device cache.

    Returns False | "attn_out" | True, picking the fastest variant whose
    activation estimate fits in HBM after the train state, the device-resident
    dataset cache, and runtime workspace headroom."""
    import os

    if hbm_bytes is None:
        hbm_bytes = float(os.environ.get("CHESS_VISION_HBM_GB", "16")) * 2**30
    state_bytes = 1.8 * 2**30   # fp32 params + AdamW moments + grad transient
    headroom = 1.2 * 2**30      # XLA workspace / fragmentation
    free = hbm_bytes - state_bytes - headroom - device_cache_bytes
    if 22e6 * per_device_batch <= free:      # noremat VJP residuals
        return False
    if 8e6 * per_device_batch <= free:       # + per-block attn_out saves
        return "attn_out"
    return True


def _compute_dtype(model_cfg: dict, cfg: dict) -> jnp.dtype:
    mixed = cfg.get("training", {}).get("mixed_precision", True)
    return jnp.bfloat16 if mixed else jnp.float32


def build_model(cfg: dict) -> nn.Module:
    """Build a chess recognition model from a full config dict."""
    model_cfg = cfg["model"]
    arch = model_cfg.get("arch", "vit")
    dtype = _compute_dtype(model_cfg, cfg)

    if arch == "vit":
        return ChessViT(
            img_size=model_cfg.get("input_size") or 224,
            head_dropout=model_cfg.get("head_dropout", 0.0),
            drop_path_rate=model_cfg.get("drop_path_rate", 0.0),
            # "auto" resolves in train.py (resolve_remat) where the batch
            # size and device-cache footprint are known; any entry point
            # that did not resolve gets the safe full-remat default.
            remat=(lambda r: True if r == "auto" else r)(
                normalize_remat(model_cfg.get("remat", "auto"))),
            dtype=dtype,
            embed_dim=model_cfg.get("embed_dim", 768),
            depth=model_cfg.get("depth", 12),
            num_heads=model_cfg.get("num_heads", 12),
            mlp_ratio=model_cfg.get("mlp_ratio", 4.0),
        )
    if arch == "cnn":
        return ChessCNN(
            head_dropout=model_cfg.get("head_dropout", 0.0),
            drop_path_rate=model_cfg.get("drop_path_rate", 0.0),
            dtype=dtype,
        )
    if arch == "square":
        as_bool = lambda v: (  # noqa: E731 — --set strings reach us raw
            v.lower() in ("true", "1", "yes") if isinstance(v, str) else
            bool(v))
        return ChessSquareCNN(
            square_overlap=model_cfg.get("square_overlap", 1.5),
            square_input_size=model_cfg.get("square_input_size", 64),
            head_dropout=model_cfg.get("head_dropout", 0.0),
            pin_backbone_bn=as_bool(model_cfg.get("pin_backbone_bn", True)),
            turn_color_stats=as_bool(
                model_cfg.get("turn_color_stats", False)),
            dtype=dtype,
        )
    raise ValueError(f"Unknown architecture: {arch!r} (expected one of {ARCHS})")


def param_count(params) -> int:
    import jax

    return sum(p.size for p in jax.tree.leaves(params))


def init_variables(model: nn.Module, input_size: int, seed: int = 0) -> dict:
    """Initialize model variables under jit (eager init dispatches hundreds of
    tiny ops — pathological over a remote-compile TPU tunnel)."""
    import functools

    import jax

    dummy = jnp.zeros((1, input_size, input_size, 3), jnp.float32)
    init = jax.jit(functools.partial(model.init, train=False))
    return init({"params": jax.random.key(seed), "dropout": jax.random.key(1)}, dummy)


def abstract_variables(model: nn.Module, input_size: int) -> dict:
    """Variable pytree of ShapeDtypeStructs (no compute) — the restore
    template for loading checkpoints in eval/predict/serving paths."""
    import jax

    dummy = jnp.zeros((1, input_size, input_size, 3), jnp.float32)
    return jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            dummy,
            train=False,
        )
    )
