"""Int8 (W8A8 dynamic) quantized inference for the ChessViT serving path.

The v5e MXU runs int8 x int8 -> int32 matmuls at 2.3-3x its bf16 rate at
ViT-B serving shapes (measured: qkv 281 / fc1 374 TOPS vs 114-126 TFLOP/s
bf16), and ViT-B inference at the 5k boards/sec/chip target exceeds the
chip's bf16 peak — so the serving fast path quantizes the four large matmuls
per block (qkv, proj, fc1, fc2 — >95% of the FLOPs):

  - weights: per-output-channel symmetric int8, quantized once at load
  - activations: per-token dynamic symmetric int8 (abs-max over features)
  - accumulation in int32, rescale by (s_x * s_w) in f32

Dynamic activation quant is HBM-bound, not FLOP-bound: done with plain XLA
ops it re-reads every activation tensor for the abs-max reduction and again
for the rounding pass, which measured as ~70% of the int8 path's runtime. On
TPU the LayerNorm (or GELU) + abs-max + quantize chain therefore runs as ONE
Pallas pass per tensor (`fused_rowquant`): read bf16 once, write int8 + a
per-token scale. The int32->f32 rescale rides XLA's matmul epilogue fusion.

Attention runs through the fused Pallas kernel (ops/attention.py) directly
on the packed qkv output. The residual stream stays bf16. Patch embed and
heads stay bf16/f32 — they are a few percent of the compute and the
accuracy-sensitive parts.

`quantize_chessvit` converts a trained ChessViT param tree into a quant pack;
`chessvit_int8_apply` is the functional forward (same outputs contract as
ChessViT.__call__).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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


def quantize_chessvit(params: dict, calib=None, num_heads: int = 12) -> dict:
    """ChessViT param tree (models/vit.py) -> int8 inference pack.

    calib: optional (B, S, S, 3) normalized calibration images; when given,
    per-layer fixed softmax shifts are measured (calibrate_attn_shifts) and
    stored in the pack — the fastest attention mode, checkpoint-safe."""
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
    if calib is not None:
        pack["attn_shifts"] = calibrate_attn_shifts(pack, calib, num_heads)
    return pack


def _layernorm(x, p, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    return (xf - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


# ---------------------------------------------------------------------------
# Fused pre-op + dynamic row quantization (one HBM pass per tensor)
# ---------------------------------------------------------------------------

def _erf(x):
    """Abramowitz-Stegun 7.1.26 rational erf (max abs err 1.5e-7): the
    Pallas TPU lowering has no erf primitive; this uses only exp."""
    a = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (a[0] + t * (a[1] + t * (a[2] + t * (a[3] + t * a[4]))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _rowquant_kernel(x_ref, g_ref, b_ref, xq_ref, s_ref, *, mode, eps):
    x = x_ref[...].astype(jnp.float32)                  # (bb, N, D)
    D = x.shape[-1]
    if mode == "ln":
        # two-pass statistics (mean, then mean of squared deviations): the
        # one-pass E[x^2]-mu^2 form cancels catastrophically for
        # large-mean rows; the block is VMEM-resident so the extra pass
        # is cheap
        mu = jnp.mean(x, axis=-1, keepdims=True)
        cen = x - mu
        var = jnp.mean(jnp.square(cen), axis=-1, keepdims=True)
        x = cen * jax.lax.rsqrt(var + eps) * g_ref[0] + b_ref[0]
    elif mode == "gelu":
        x = 0.5 * x * (1.0 + _erf(x * (1.0 / math.sqrt(2.0))))
    elif mode == "gelu_sigmoid":
        # serving-default approx (CHESS_VISION_GELU=sigmoid): one exp vs the
        # ~18-op erf rational — the fc1 stream is the largest tensor here
        x = x * (1.0 / (1.0 + jnp.exp(-1.702 * x)))
    elif mode == "gelu_hard":
        x = x * jnp.clip(0.4255 * x + 0.5, 0.0, 1.0)
    amax = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True), 1e-8)
    xq_ref[...] = jnp.clip(
        jnp.round(x * (127.0 / amax)), -127, 127
    ).astype(jnp.int8)
    s_ref[...] = amax * (1.0 / 127.0)


def fused_rowquant(x, mode: str = "none", ln_scale=None, ln_bias=None,
                   eps: float = 1e-6, interpret: bool = False):
    """(B, N, D) bf16/f32 -> (int8 (B, N, D), f32 scales (B, N, 1)).

    mode: "none" (plain abs-max quant), "ln" (LayerNorm first, params
    required), "gelu" (exact erf GELU first), "gelu_sigmoid" / "gelu_hard"
    (the serving GELU approximations). Several images per grid cell
    (amortizing per-cell overhead); each cell holds its whole (bb, N, D) row
    block in VMEM so the pre-op, both reductions (LN stats + abs-max), and
    the rounding happen in a single HBM read.

    Also accepts a flat (M, D) stream (the M-blocked serving layout) and
    returns ((M, D) int8, (M, 1) f32).
    """
    if x.ndim == 2:
        M, D = x.shape
        bm = next(b for b in (2048, 1024, 512, 256, 128, 64, 32, 16, 8, 4, 2, 1)
                  if M % b == 0 and b * D * 7 <= 40 * 2**20)
        if ln_scale is None:
            ln_scale = jnp.zeros((1, D), jnp.float32)
            ln_bias = jnp.zeros((1, D), jnp.float32)
        else:
            ln_scale = jnp.asarray(ln_scale, jnp.float32).reshape(1, D)
            ln_bias = jnp.asarray(ln_bias, jnp.float32).reshape(1, D)
        return pl.pallas_call(
            functools.partial(_rowquant_kernel, mode=mode, eps=eps),
            out_shape=(
                jax.ShapeDtypeStruct((M, D), jnp.int8),
                jax.ShapeDtypeStruct((M, 1), jnp.float32),
            ),
            grid=(M // bm,),
            in_specs=[
                pl.BlockSpec((bm, D), lambda b: (b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, D), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, D), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((bm, D), lambda b: (b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bm, 1), lambda b: (b, 0),
                             memory_space=pltpu.VMEM),
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=100 * 2**20,
            ),
            interpret=interpret,
        )(x, ln_scale, ln_bias)
    B, N, D = x.shape
    # block several images per cell (amortize per-cell overhead) within a
    # ~40MB VMEM budget (v5e has 128MB; ~7 bytes/elem incl. f32 temps and
    # double-buffered in/out)
    bb = next(b for b in (8, 4, 2, 1)
              if B % b == 0 and b * N * D * 7 <= 40 * 2**20)
    if ln_scale is None:
        ln_scale = jnp.zeros((1, D), jnp.float32)
        ln_bias = jnp.zeros((1, D), jnp.float32)
    else:
        ln_scale = jnp.asarray(ln_scale, jnp.float32).reshape(1, D)
        ln_bias = jnp.asarray(ln_bias, jnp.float32).reshape(1, D)
    xq, s = pl.pallas_call(
        functools.partial(_rowquant_kernel, mode=mode, eps=eps),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, D), jnp.int8),
            # trailing singleton keeps the block shape TPU-tileable
            jax.ShapeDtypeStruct((B, N, 1), jnp.float32),
        ),
        grid=(B // bb,),
        in_specs=[
            pl.BlockSpec((bb, N, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bb, N, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, N, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 2**20,
        ),
        interpret=interpret,
    )(x, ln_scale, ln_bias)
    return xq, s


def quant_dense_q(xq, x_scale, wq, w_scale, bias, out_dtype=jnp.bfloat16):
    """Pre-quantized activations: int8 matmul + f32 epilogue rescale.

    xq: (B, N, K) int8; x_scale: (B, N, 1) f32; wq: (K, O) int8;
    w_scale: (O,) f32; bias: (O,). The rescale + bias + downcast all fuse
    into the matmul epilogue, so the output is written once at out_dtype.
    """
    acc = jax.lax.dot_general(
        xq, wq,
        dimension_numbers=(((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) * x_scale * w_scale + bias).astype(out_dtype)


def _approx_gelu() -> str:
    """CHESS_VISION_GELU selects the int8 serving path's fc1 GELU:
    sigmoid (default) is x*sigmoid(1.702x) — one exp vs the ~18-op erf
    rational, worth +18% end-to-end (2,937 -> 3,466 boards/s, EXPERIMENTS.md
    round 3); hard is x*clip(0.4255x+0.5, 0, 1) — no transcendental; erf
    restores the reference-exact form. sigmoid and hard are validated on
    trained ViT checkpoints via experiments/int8_eval.py before becoming
    defaults. Read at trace time."""
    import os

    return os.environ.get("CHESS_VISION_GELU", "sigmoid")


def _block_tpu(x, xq, xs, q, next_ln, num_heads=12, interpret=False,
               softmax_shift=None):
    """One ViT block on the fused-kernel serving path.

    x: (B, N, D) bf16 residual stream; xq/xs: this block's LN1 output already
    quantized (produced by the PREVIOUS block's fc2 epilogue, or by
    fused_rowquant for block 0). Every activation is written to HBM exactly
    once: qkv rides XLA's int8-matmul epilogue into bf16, attention quantizes
    its own output in-kernel, and the proj/fc1/fc2 matmuls carry their full
    epilogue (rescale + bias + residual/GELU + next LayerNorm + requant)
    inside one Pallas kernel each (ops/int8_matmul.py). Returns
    (x_new, xq', xs') where xq'/xs' quantize next_ln(x_new) — None for the
    last block (the final LayerNorm runs in XLA).
    """
    from chess_vision_tpu.ops.attention import fused_qkv_attention_quant
    from chess_vision_tpu.ops.int8_matmul import (
        int8_matmul_gelu_quant,
        int8_matmul_res,
        int8_matmul_res_ln_quant,
    )

    qkv = quant_dense_q(xq, xs, q["qkv"]["wq"], q["qkv"]["scale"],
                        q["qkv"]["bias"])
    aq, as_ = fused_qkv_attention_quant(qkv, num_heads, interpret=interpret,
                                        softmax_shift=softmax_shift)
    x, hq, hs = int8_matmul_res_ln_quant(
        aq, as_, q["proj"]["wq"], q["proj"]["scale"], q["proj"]["bias"],
        x, q["norm2"]["scale"], q["norm2"]["bias"], interpret=interpret)
    gq, gs = int8_matmul_gelu_quant(
        hq, hs, q["fc1"]["wq"], q["fc1"]["scale"], q["fc1"]["bias"],
        interpret=interpret, approx_gelu=_approx_gelu())
    if next_ln is None:
        x = int8_matmul_res(
            gq, gs, q["fc2"]["wq"], q["fc2"]["scale"], q["fc2"]["bias"], x,
            interpret=interpret)
        return x, None, None
    x, xq, xs = int8_matmul_res_ln_quant(
        gq, gs, q["fc2"]["wq"], q["fc2"]["scale"], q["fc2"]["bias"],
        x, next_ln["scale"], next_ln["bias"], interpret=interpret)
    return x, xq, xs


def _block_tpu_flat(x, xq, xs, q, next_ln, images, n_real,
                    num_heads=12, interpret=False, softmax_shift=None):
    """One ViT block on the FLAT (M-blocked) serving path.

    Same fusion structure as _block_tpu but every tensor is a flat (M, D)
    stream (M = images * NP, token axis padded to the 32-row int8 tile), so
    the proj/fc1/fc2 kernels tile M into large MXU-friendly row blocks
    instead of one underfilled (257, K) dot per image. Attention is the only
    op that needs image structure (ops/attention.py flat kernel, padded keys
    masked)."""
    from chess_vision_tpu.ops.attention import fused_qkv_attention_quant_flat
    from chess_vision_tpu.ops.int8_matmul import (
        int8_matmul_gelu_quant_flat,
        int8_matmul_res_flat,
        int8_matmul_res_ln_quant_flat,
    )

    qkv = quant_dense_q(xq, xs, q["qkv"]["wq"], q["qkv"]["scale"],
                        q["qkv"]["bias"])
    aq, as_ = fused_qkv_attention_quant_flat(qkv, images, n_real, num_heads,
                                             interpret=interpret,
                                             softmax_shift=softmax_shift)
    x, hq, hs = int8_matmul_res_ln_quant_flat(
        aq, as_, q["proj"]["wq"], q["proj"]["scale"], q["proj"]["bias"],
        x, q["norm2"]["scale"], q["norm2"]["bias"], interpret=interpret)
    gq, gs = int8_matmul_gelu_quant_flat(
        hq, hs, q["fc1"]["wq"], q["fc1"]["scale"], q["fc1"]["bias"],
        interpret=interpret, approx_gelu=_approx_gelu())
    if next_ln is None:
        x = int8_matmul_res_flat(
            gq, gs, q["fc2"]["wq"], q["fc2"]["scale"], q["fc2"]["bias"], x,
            interpret=interpret)
        return x, None, None
    x, xq, xs = int8_matmul_res_ln_quant_flat(
        gq, gs, q["fc2"]["wq"], q["fc2"]["scale"], q["fc2"]["bias"],
        x, next_ln["scale"], next_ln["bias"], interpret=interpret)
    return x, xq, xs


def _block(x, q, num_heads=12):
    """Plain-XLA int8 block (CPU test meshes; identical math to the fused
    TPU path in _block_tpu up to f32/bf16 rounding order)."""
    from chess_vision_tpu.ops.attention import fused_qkv_attention

    h = _layernorm(x, q["norm1"])
    qkv = quant_dense(h, q["qkv"]["wq"], q["qkv"]["scale"], q["qkv"]["bias"])
    att = fused_qkv_attention(qkv.astype(jnp.bfloat16), num_heads)
    x = x + quant_dense(att, q["proj"]["wq"], q["proj"]["scale"],
                        q["proj"]["bias"]).astype(jnp.bfloat16)
    h = _layernorm(x, q["norm2"])
    h = quant_dense(h, q["fc1"]["wq"], q["fc1"]["scale"], q["fc1"]["bias"])
    mode = _approx_gelu()  # same CHESS_VISION_GELU semantics as TPU kernels
    if mode == "sigmoid":
        h = h * jax.nn.sigmoid(1.702 * h)
    elif mode == "hard":
        h = h * jnp.clip(0.4255 * h + 0.5, 0.0, 1.0)
    else:
        h = jax.nn.gelu(h, approximate=False)
    x = x + quant_dense(h, q["fc2"]["wq"], q["fc2"]["scale"],
                        q["fc2"]["bias"]).astype(jnp.bfloat16)
    return x


def _gelu_rowquant_mode() -> str:
    """CHESS_VISION_GELU -> the fused_rowquant mode for the fc1 epilogue."""
    return {"sigmoid": "gelu_sigmoid", "hard": "gelu_hard"}.get(
        _approx_gelu(), "gelu")


def _block_hybrid(x, q, num_heads=12, interpret=False):
    """One ViT block on the HYBRID serving layout.

    Sits between "xla" and "block": every matmul is a plain-XLA int8
    dot_general (epilogue rescale+bias+residual fused by XLA) and attention
    is the plain Pallas forward kernel (the same custom call the xla layout
    already carries on TPU) — but the dynamic-quant chain (LayerNorm /
    GELU + abs-max + round), which costs the pure-XLA layout several full
    f32 HBM passes per tensor per block, runs as the small fused_rowquant
    Pallas kernel: one HBM read per tensor. Motivation: round 5's remote
    compile helper 500s every int8_matmul/fused_block Pallas program while
    fused_rowquant and the plain attention kernel still compile — this
    layout uses only those two kernels (see EXPERIMENTS.md round 5).
    """
    from chess_vision_tpu.ops.attention import fused_qkv_attention

    xq, xs = fused_rowquant(x, "ln", q["norm1"]["scale"], q["norm1"]["bias"],
                            interpret=interpret)
    qkv = quant_dense_q(xq, xs, q["qkv"]["wq"], q["qkv"]["scale"],
                        q["qkv"]["bias"])
    att = fused_qkv_attention(qkv, num_heads)
    aq, as_ = fused_rowquant(att, "none", interpret=interpret)
    x = x + quant_dense_q(aq, as_, q["proj"]["wq"], q["proj"]["scale"],
                          q["proj"]["bias"])
    hq, hs = fused_rowquant(x, "ln", q["norm2"]["scale"], q["norm2"]["bias"],
                            interpret=interpret)
    h = quant_dense_q(hq, hs, q["fc1"]["wq"], q["fc1"]["scale"],
                      q["fc1"]["bias"])  # bf16: halves the fc1 stream's HBM
    gq, gs = fused_rowquant(h, _gelu_rowquant_mode(), interpret=interpret)
    x = x + quant_dense_q(gq, gs, q["fc2"]["wq"], q["fc2"]["scale"],
                          q["fc2"]["bias"])
    return x


def _hybrid_stack(x, blocks, num_heads=12, interpret=False):
    """lax.scan of _block_hybrid over layer-stacked weights: the whole
    12-block stack compiles as ONE block body (2 distinct small Pallas
    kernels), keeping the serving program far below the compile helper's
    resource ceiling (the round-5 failure is program-complexity-shaped)."""
    stacked = jax.tree.map(lambda *a: jnp.stack(a), *blocks)

    def body(x, q):
        return _block_hybrid(x, q, num_heads, interpret), None

    x, _ = jax.lax.scan(body, x, stacked)
    return x


def _embed(pack: dict, images):
    """Patch-embed + cls + pos: (B, S, S, 3) -> ((B, N, D) bf16, grid G)."""
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
    return x, G


def calibrate_attn_shifts(pack: dict, images, num_heads: int = 12,
                          margin: float = 40.0, guard: float = 80.0):
    """Per-layer fixed softmax shifts for the serving attention kernels.

    The fixed-shift softmax is the fastest mode (no per-row shift work at
    all) but is only safe inside a measured logit band — trained ViTs here
    range from <=16 to 126 across checkpoints (EXPERIMENTS.md round 3). This
    runs the int8 block math (the XLA form — the same quantized qkv the
    serving kernel sees) on calibration images and records, per layer, the
    max attention logit smax and the smallest per-row logit max rmin:

      shift = smax - margin   ->  exp(s - shift) <= e^margin at calibration;
                                  overflow needs a deployment logit to
                                  exceed calibration smax by 88 - margin.
      calibratable only when rmin >= shift - guard: every row keeps a
      normalizer at least e^-guard above the f32/bf16 flush line, so no row
      degrades to the rowsum-floor fallback.

    Returns a per-layer list: float shift, or None where the layer must
    keep the adaptive bound-shift mode (wide logit spread). Store as
    pack["attn_shifts"]; chessvit_int8_apply threads them into the kernels.
    """
    # One jitted dispatch for the whole sweep, scanning ONE compiled block
    # over the layer-stacked params. Eager per-layer float() pulls cost a
    # remote compile + D2H sync per op through tunneled backends (~4 min
    # measured), and inlining all 12 blocks in one program multiplies the
    # Pallas-attention compile 12x (420s+ remote) — scan compiles the block
    # once and the result is persistently cached.
    @jax.jit
    def _measure(pack, images):
        x, _ = _embed(pack, images)
        stacked = jax.tree.map(lambda *a: jnp.stack(a), *pack["blocks"])

        def step(x, q):
            h = _layernorm(x, q["norm1"])
            qkv = quant_dense(h, q["qkv"]["wq"], q["qkv"]["scale"],
                              q["qkv"]["bias"])
            B, N, C3 = qkv.shape
            D = C3 // 3
            parts = qkv.reshape(B, N, 3, num_heads, D // num_heads)
            qh, kh = parts[:, :, 0], parts[:, :, 1]
            sc = 1.0 / math.sqrt(qh.shape[-1])
            sco = jnp.einsum("bqhd,bkhd->bhqk", qh.astype(jnp.float32),
                             kh.astype(jnp.float32)) * sc
            stats = jnp.stack([jnp.max(sco),
                               jnp.min(jnp.max(sco, axis=-1))])
            return _block(x, q, num_heads), stats

        _, stats = jax.lax.scan(step, x, stacked)
        return stats  # (L, 2): [smax, rmin] per layer

    stats = np.asarray(_measure(pack, jnp.asarray(images)))
    shifts: list = []
    for smax, rmin in stats:
        shift = float(smax) - margin
        shifts.append(shift if float(rmin) >= shift - guard else None)
    return shifts


def chessvit_int8_apply(pack: dict, images, attn_shifts=None) -> dict:
    """images: (B, S, S, 3) normalized (model-dtype) -> ChessViT output dict.

    attn_shifts: calibrated per-layer softmax shifts (floats/None, STATIC —
    do not pass traced values; pop "attn_shifts" off a device_put pack)."""
    x, G = _embed(pack, images)
    B = x.shape[0]
    D = x.shape[-1]

    blocks = pack["blocks"]
    N = x.shape[1]
    if jax.default_backend() == "tpu":
        import os

        # default: per-image blocked grid — measured 2937 vs 2816 boards/s
        # for the flat M-blocked relayout (the +12% padded rows cost more
        # than the larger row tiles buy; see EXPERIMENTS.md round-3 profile).
        # "fused" runs each block as ONE Pallas call (ops/fused_block.py).
        layout = os.environ.get("CHESS_VISION_INT8_LAYOUT", "block")
        if layout == "xla":
            # Escape hatch: the plain-XLA int8 blocks. NOTE: not literally
            # custom-call-free on TPU — _block's fused_qkv_attention still
            # dispatches to the plain Pallas attention forward (and that
            # program compiled under round 5's degraded helper, which is
            # what the "hybrid" layout builds on). Slower than the Pallas
            # layouts: the dynamic-quant chain runs as multi-pass f32 XLA
            # ops. Survives helpers that reject the int8_matmul/fused_block
            # Mosaic programs — round 5 saw all of those 500.
            for q in blocks:
                x = _block(x, q)
        elif layout == "hybrid":
            # XLA int8 matmuls + fused_rowquant + plain Pallas attention
            # only — the two custom calls the round-5 compile helper still
            # accepts — scanned over stacked weights for a tiny program.
            if (len(blocks) > 2 and os.environ.get(
                    "CHESS_VISION_HYBRID_SCAN", "1") == "1"):
                x = _hybrid_stack(x, blocks)
            else:
                for q in blocks:
                    x = _block_hybrid(x, q)
        elif layout == "fused":
            from chess_vision_tpu.ops.attention import _LANES, _pow2
            from chess_vision_tpu.ops.fused_block import fused_vit_block

            nm = (N // _LANES) * _LANES
            ok = (_pow2(1.0 / math.sqrt(D // 12))
                  and nm >= _LANES and 0 < N - nm <= 2
                  and os.environ.get("CHESS_VISION_ATTN_QK", "bf16") == "bf16"
                  and os.environ.get("CHESS_VISION_ATTN_SOFTMAX", "bound")
                  in ("bound", "fixed"))
            if not ok:
                layout = "block"
        if layout == "fused":
            xq, xs = fused_rowquant(x, "ln", blocks[0]["norm1"]["scale"],
                                    blocks[0]["norm1"]["bias"])
            shifts = attn_shifts or [None] * len(blocks)
            gelu = _approx_gelu()
            head_shifts = shifts[:-1]
            uniform = all((s is None) == (head_shifts[0] is None)
                          for s in head_shifts)
            if (len(blocks) > 2 and uniform
                    and os.environ.get("CHESS_VISION_FUSED_SCAN", "1")
                    == "1"):
                # ONE compiled kernel scanned over stacked weights: ~11x
                # smaller program than the unrolled chain (the round-4
                # batch-512 compile-helper crash was program-size-shaped).
                # CHESS_VISION_FUSED_SCAN=0 restores the unrolled loop.
                from chess_vision_tpu.ops.fused_block import fused_vit_stack

                x, xq, xs = fused_vit_stack(
                    xq, xs, x, blocks[:-1],
                    [b["norm1"] for b in blocks[1:]], head_shifts,
                    num_heads=12, approx_gelu=gelu)
            else:
                for i, q in enumerate(blocks[:-1]):
                    x, xq, xs = fused_vit_block(
                        xq, xs, x, q, blocks[i + 1]["norm1"], num_heads=12,
                        softmax_shift=shifts[i], approx_gelu=gelu)
            # last block on the split kernels (no follow-on LN/quant output)
            x, _, _ = _block_tpu(x, xq, xs, blocks[-1], None,
                                 softmax_shift=shifts[-1])
        elif layout == "flat":
            # Flat M-blocked layout: pad the token axis to the 32-row int8
            # tile so (B, NP, D) <-> (B*NP, D) reshapes are layout-free, then
            # run the whole block stack on (M, D) streams (int8_matmul.py
            # flat kernels). +12% padded rows, but the matmuls tile M into
            # large MXU-friendly blocks instead of one (257, K) dot/image.
            NP = -(-N // 32) * 32
            x = jnp.pad(x, ((0, 0), (0, NP - N), (0, 0)))
            x = x.reshape(B * NP, D)
            xq, xs = fused_rowquant(x, "ln", blocks[0]["norm1"]["scale"],
                                    blocks[0]["norm1"]["bias"])
            shifts = attn_shifts or [None] * len(blocks)
            for i, q in enumerate(blocks):
                nxt = blocks[i + 1]["norm1"] if i + 1 < len(blocks) else None
                x, xq, xs = _block_tpu_flat(x, xq, xs, q, nxt,
                                            images=B, n_real=N,
                                            softmax_shift=shifts[i])
            x = x.reshape(B, NP, D)[:, :N]
        elif layout not in ("xla", "hybrid"):  # "block", the default
            # ("xla"/"hybrid" already ran above)
            xq, xs = fused_rowquant(x, "ln", blocks[0]["norm1"]["scale"],
                                    blocks[0]["norm1"]["bias"])
            shifts = attn_shifts or [None] * len(blocks)
            for i, q in enumerate(blocks):
                nxt = blocks[i + 1]["norm1"] if i + 1 < len(blocks) else None
                x, xq, xs = _block_tpu(x, xq, xs, q, nxt,
                                       softmax_shift=shifts[i])
    else:
        for q in blocks:
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
