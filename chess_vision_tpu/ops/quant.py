"""Int8 (W8A8 dynamic) quantized inference for the ChessViT serving path.

The v5e MXU delivers 2x its bf16 throughput on int8 x int8 -> int32 matmuls,
and ViT-B inference at the 5k boards/sec/chip target exceeds the chip's bf16
peak — so the serving fast path quantizes the four large matmuls per block
(qkv, proj, fc1, fc2 — >95% of the FLOPs):

  - weights: per-output-channel symmetric int8, quantized once at load
  - activations: per-token dynamic symmetric int8 (abs-max over features)
  - accumulation in int32, rescale by (s_x * s_w) in f32

Attention itself, LayerNorms, the patch embed, and all heads stay bf16/f32 —
they are a few percent of the compute and the accuracy-sensitive parts.

`quantize_chessvit` converts a trained ChessViT param tree into a quant pack;
`chessvit_int8_apply` is the functional forward (same outputs contract as
ChessViT.__call__).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from chess_vision_tpu.fen import NUM_PIECE_COLORS, NUM_PIECE_TYPES  # noqa: F401
from chess_vision_tpu.models.common import combine_type_color
from chess_vision_tpu.models.layers import adaptive_avg_pool_nhwc


def _quant_weight(w: np.ndarray):
    """(in, out) f32 -> int8 weights + (out,) f32 scales (per-out-channel)."""
    w = np.asarray(w, np.float32)
    scale = np.abs(w).max(axis=0) / 127.0
    scale = np.maximum(scale, 1e-8)
    wq = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return wq, scale.astype(np.float32)


def quant_dense(x, wq, w_scale, bias):
    """Per-token dynamic activation quant + int8 matmul + rescale.

    x: (..., in) f32/bf16; wq: (in, out) int8; w_scale: (out,) f32.
    """
    xf = x.astype(jnp.float32)
    x_scale = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    x_scale = jnp.maximum(x_scale, 1e-8)
    xq = jnp.clip(jnp.round(xf / x_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq,
        dimension_numbers=(((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * x_scale * w_scale
    return out + bias


def quantize_chessvit(params: dict) -> dict:
    """ChessViT param tree (models/vit.py) -> int8 inference pack."""
    bb = params["backbone"]
    pack = {
        "patch_embed": jax.tree.map(np.asarray, bb["patch_embed"]),
        "cls_token": np.asarray(bb["cls_token"]),
        "pos_embed": np.asarray(bb["pos_embed"]),
        "norm": jax.tree.map(np.asarray, bb["norm"]),
        "blocks": [],
        "heads": {
            name: jax.tree.map(np.asarray, params[name])
            for name in ("type_head", "color_head", "turn_head", "castling_head")
        },
    }
    i = 0
    while f"block{i}" in bb:
        blk = bb[f"block{i}"]
        q = {"norm1": jax.tree.map(np.asarray, blk["norm1"]),
             "norm2": jax.tree.map(np.asarray, blk["norm2"])}
        for name, sub in (("qkv", blk["attn"]["qkv"]),
                          ("proj", blk["attn"]["proj"]),
                          ("fc1", blk["mlp"]["fc1"]),
                          ("fc2", blk["mlp"]["fc2"])):
            wq, ws = _quant_weight(sub["kernel"])
            q[name] = {"wq": wq, "scale": ws,
                       "bias": np.asarray(sub["bias"], np.float32)}
        pack["blocks"].append(q)
        i += 1
    return pack


def _layernorm(x, p, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    return (xf - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _block(x, q, num_heads=12):
    B, N, D = x.shape
    h = _layernorm(x, q["norm1"])
    qkv = quant_dense(h, q["qkv"]["wq"], q["qkv"]["scale"], q["qkv"]["bias"])
    qkv = qkv.astype(jnp.bfloat16).reshape(B, N, 3, num_heads, D // num_heads)
    att = jax.nn.dot_product_attention(
        qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    ).reshape(B, N, D)
    x = x + quant_dense(att, q["proj"]["wq"], q["proj"]["scale"],
                        q["proj"]["bias"])
    h = _layernorm(x, q["norm2"])
    h = quant_dense(h, q["fc1"]["wq"], q["fc1"]["scale"], q["fc1"]["bias"])
    h = jax.nn.gelu(h, approximate=False)
    x = x + quant_dense(h, q["fc2"]["wq"], q["fc2"]["scale"], q["fc2"]["bias"])
    return x


def chessvit_int8_apply(pack: dict, images) -> dict:
    """images: (B, S, S, 3) normalized (model-dtype) -> ChessViT output dict."""
    pe = pack["patch_embed"]
    x = jax.lax.conv_general_dilated(
        images.astype(jnp.bfloat16),
        pe["kernel"].astype(jnp.bfloat16),
        window_strides=(16, 16), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + pe["bias"].astype(jnp.bfloat16)
    B = x.shape[0]
    G = x.shape[1]
    D = x.shape[-1]
    x = x.reshape(B, G * G, D)
    cls = jnp.broadcast_to(pack["cls_token"], (B, 1, D)).astype(x.dtype)
    x = jnp.concatenate([cls, x], axis=1) + pack["pos_embed"].astype(x.dtype)

    for q in pack["blocks"]:
        x = _block(x, q)

    x = _layernorm(x, pack["norm"])
    cls_token = x[:, 0]
    patches = x[:, 1:].reshape(B, G, G, D)
    pooled = adaptive_avg_pool_nhwc(patches, (8, 8))

    heads = pack["heads"]
    dense = lambda t, p: (  # noqa: E731
        jnp.dot(t, p["kernel"].astype(jnp.float32)) + p["bias"]
    )
    squares = combine_type_color(
        dense(pooled, heads["type_head"]), dense(pooled, heads["color_head"])
    )
    return {
        "squares": squares.reshape(B, -1).astype(jnp.float32),
        "turn": dense(cls_token, heads["turn_head"]).astype(jnp.float32),
        "castling": dense(cls_token, heads["castling_head"]).astype(jnp.float32),
    }
