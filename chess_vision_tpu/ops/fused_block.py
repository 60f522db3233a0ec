"""Whole-ViT-block fused int8 serving kernel (Pallas, TPU).

The round-4 per-op profile of the serving path (EXPERIMENTS.md) shows the
structural ceiling of the one-kernel-per-op design: the attention kernel is
~24 ms/batch of VPU passes whose MXU sits idle, while the qkv/proj/fc1/fc2
int8 matmuls are ~90 ms/batch of MXU work whose VPU mostly idles — and the
two can never overlap because consecutive `pallas_call`s serialize. This
kernel runs the ENTIRE transformer block (reference models/vit.py:28-49
forward, quantized) in one Pallas call:

    qkv = int8_dot(xq, Wqkv)                 MXU
    a   = attention(qkv)  [wide-exp softmax] VPU-heavy
    x'  = x + int8_dot(rowq(a), Wproj)       MXU + LN/quant epilogue
    h   = rowq(LN(x'))
    g   = rowq(gelu(int8_dot(h, Wfc1)))      MXU + GELU/quant epilogue
    x'' = x' + int8_dot(g, Wfc2)             MXU + LN/quant epilogue
    out = x'', rowq(LN_next(x''))

with every weight VMEM-resident across the grid (~7 MB int8) and several
images per grid cell, software-pipelined so image i+1's qkv matmul (MXU) is
issued before image i's attention passes (VPU) — the scheduler can overlap
them. On top of the overlap, all intra-block activations (the bf16 qkv, the
int8 attention output, the post-proj residual, and the (N, 4D) int8 fc1
output — ~0.7 GB/block round-tripped at B=512) stay in VMEM.

Math is kept operation-for-operation identical to the split kernels
(ops/int8_matmul.py + ops/attention.py fused_qkv_attention_quant), so the
interpret-mode parity test can compare against quant._block_tpu directly.
Supports the calibrated fixed-shift softmax (the headline bench path) and
the bound-shift default; other modes fall back to the split kernels.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from chess_vision_tpu.ops.attention import (
    _LANES,
    _bound_shift,
    _extra_key_scores,
    _pow2,
)
from chess_vision_tpu.ops.int8_matmul import _gelu, _int8_dot, _rowquant


def _ln(x_f32, g, b, eps):
    """Two-pass LayerNorm, identical to int8_matmul._res_ln_quant_kernel."""
    mu = jnp.mean(x_f32, axis=-1, keepdims=True)
    cen = x_f32 - mu
    var = jnp.mean(jnp.square(cen), axis=-1, keepdims=True)
    return cen * jax.lax.rsqrt(var + eps) * g + b


def _attention(q, k, v, s_all, o_scr, *, num_heads, head_dim, shift,
               per_head):
    """Wide-exp attention on one image's (N, D) q/k/v, writing f32 output to
    o_scr. shift: traced scalar (calibrated fixed) or (N, H) f32 (bound
    mode, per_head=True).

    Same math as attention._wide_exp_attention / _head_pv_split: key axis
    split at the last 128-multiple so the main score tile is lane-exact,
    per-head score tiles written side by side into one (N, H*nm) scratch,
    ONE wide exp pass, PV dots with a ones-column rowsum fused in, and the
    <=2 remainder keys folded back as broadcast FMAs."""
    n = q.shape[0]
    nm = (n // _LANES) * _LANES
    for i in range(num_heads):
        sl = slice(i * head_dim, (i + 1) * head_dim)
        s = jax.lax.dot_general(
            q[:, sl], k[:nm, sl],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # per-head (bound) shifts are subtracted in the dot epilogue so the
        # exp still runs as one wide pass with no per-lane-block shift
        s_all[:, i * nm:(i + 1) * nm] = s - shift[:, i:i + 1] if per_head \
            else s
    p_all = jnp.exp(s_all[...] - (0.0 if per_head else shift)
                    ).astype(v.dtype)  # shift: traced scalar broadcasts
    extra = _extra_key_scores(q, k, nm, num_heads)       # (N, H) f32 each
    for i in range(num_heads):
        sl = slice(i * head_dim, (i + 1) * head_dim)
        v_ext = jnp.concatenate(
            [v[:nm, sl], jnp.ones((nm, 1), v.dtype)], axis=1
        )
        o_ext = jax.lax.dot(p_all[:, i * nm:(i + 1) * nm], v_ext,
                            preferred_element_type=jnp.float32)
        for j, e in enumerate(extra):
            sh = shift[:, i:i + 1] if per_head else shift
            pe = jnp.exp(e[:, i:i + 1] - sh)             # (N, 1) f32
            row = jnp.concatenate(
                [v[nm + j:nm + j + 1, sl], jnp.ones((1, 1), v.dtype)], axis=1
            ).astype(jnp.float32)
            o_ext = o_ext + pe * row
        o_scr[:, sl] = o_ext[:, :head_dim] / jnp.maximum(
            o_ext[:, head_dim:], 1e-30)


def _fused_block_kernel(xq_ref, xs_ref, res_ref,
                        wqkv_ref, sqkv_ref, bqkv_ref,
                        wproj_ref, sproj_ref, bproj_ref,
                        g2_ref, b2_ref,
                        wfc1_ref, sfc1_ref, bfc1_ref,
                        wfc2_ref, sfc2_ref, bfc2_ref,
                        gn_ref, bn_ref, shift_ref,
                        xn_ref, yq_ref, ys_ref,
                        s_all, o_scr,
                        *, bb, num_heads, head_dim, scale, shift_mode,
                        approx, eps):
    D = num_heads * head_dim
    wqkv = wqkv_ref[...]

    def dot_qkv(j):
        return _int8_dot(xq_ref[j], wqkv) if j < bb else None

    acc = dot_qkv(0)
    for j in range(bb):
        qkv = (acc.astype(jnp.float32) * xs_ref[j] * sqkv_ref[0]
               + bqkv_ref[0]).astype(res_ref.dtype)
        # issue the NEXT image's qkv matmul before this image's VPU-heavy
        # attention passes — they are independent, so the MXU can run under
        # the exp/normalize work instead of idling
        acc = dot_qkv(j + 1)
        # fold the (power-of-two, lossless) softmax scale into q: one (N, D)
        # multiply instead of a per-head pass over the (N, N) score tile
        q = qkv[:, :D] * jnp.asarray(scale, qkv.dtype)
        k = qkv[:, D:2 * D]
        v = qkv[:, 2 * D:]
        # the calibrated shift arrives as a TRACED SMEM scalar (not a static
        # python float) so a lax.scan over stacked per-layer weights can vary
        # it per block while compiling the kernel exactly once
        shift = _bound_shift(q, k, num_heads, head_dim) \
            if shift_mode == "bound" else shift_ref[0, 0]
        _attention(q, k, v, s_all, o_scr, num_heads=num_heads,
                   head_dim=head_dim, shift=shift,
                   per_head=shift_mode == "bound")
        aq, as_ = _rowquant(o_scr[...].astype(jnp.float32))
        # proj + residual + norm2 + requant (int8_matmul._res_ln_quant_kernel)
        y = (_int8_dot(aq, wproj_ref[...]).astype(jnp.float32)
             * as_ * sproj_ref[0] + bproj_ref[0])
        xn_b = (res_ref[j].astype(jnp.float32) + y).astype(res_ref.dtype)
        h = _ln(xn_b.astype(jnp.float32), g2_ref[0], b2_ref[0], eps)
        hq, hs = _rowquant(h)
        # fc1 + GELU + requant
        g = _gelu(_int8_dot(hq, wfc1_ref[...]).astype(jnp.float32)
                  * hs * sfc1_ref[0] + bfc1_ref[0], approx)
        gq, gs = _rowquant(g)
        # fc2 + residual (+ next block's LayerNorm + requant)
        y2 = (_int8_dot(gq, wfc2_ref[...]).astype(jnp.float32)
              * gs * sfc2_ref[0] + bfc2_ref[0])
        x2 = (xn_b.astype(jnp.float32) + y2).astype(xn_ref.dtype)
        xn_ref[j] = x2
        h2 = _ln(x2.astype(jnp.float32), gn_ref[0], bn_ref[0], eps)
        yq_ref[j], ys_ref[j] = _rowquant(h2)


def _row2(v, O):
    return jnp.asarray(v, jnp.float32).reshape(1, O)


def fused_vit_block(xq, xs, res, q, next_ln, num_heads: int,
                    softmax_shift: float | None = None,
                    eps: float = 1e-6, approx_gelu=None,
                    interpret: bool = False):
    """One quantized ViT block in a single Pallas call.

    xq/xs: (B, N, D) int8 + (B, N, 1) f32 quantizing norm1(res);
    res: (B, N, D) bf16 residual stream; q: the block's quant pack
    (qkv/proj/fc1/fc2 wq+scale+bias, norm2 scale+bias); next_ln: the next
    block's norm1 {scale, bias} — required (the LAST block, which has no
    follow-on quant, runs on the split kernels instead).
    softmax_shift: calibrated per-layer scalar; None uses the bound shift.
    Returns (x_new, yq, ys) where yq/ys quantize next_ln(x_new).
    """
    B, N, D = xq.shape[0], xq.shape[1], xq.shape[2]
    head_dim = D // num_heads
    scale = 1.0 / math.sqrt(head_dim)
    assert _pow2(scale), "fused block requires a power-of-two softmax scale"
    nm = (N // _LANES) * _LANES
    assert nm >= _LANES and 0 < N - nm <= 2, \
        "fused block requires the 128-split token count (e.g. 257)"
    assert next_ln is not None, "last block must use the split kernels"
    if approx_gelu is None:
        # same CHESS_VISION_GELU default as the split path
        from chess_vision_tpu.ops.quant import _approx_gelu
        approx_gelu = _approx_gelu()
    shift_arr = jnp.full((1, 1), 0.0 if softmax_shift is None
                         else float(softmax_shift), jnp.float32)
    return _pallas_fused(
        xq, xs, res, q, next_ln, shift_arr,
        shift_mode="bound" if softmax_shift is None else "fixed",
        num_heads=num_heads, eps=eps, approx_gelu=approx_gelu,
        interpret=interpret)


def _pallas_fused(xq, xs, res, q, next_ln, shift_arr, *, shift_mode,
                  num_heads, eps, approx_gelu, interpret):
    """Build and invoke the fused-block pallas_call. shift_arr: (1, 1) f32
    TRACED calibrated shift (ignored under shift_mode="bound")."""
    B, N, D = xq.shape[0], xq.shape[1], xq.shape[2]
    head_dim = D // num_heads
    scale = 1.0 / math.sqrt(head_dim)
    nm = (N // _LANES) * _LANES
    O1 = q["fc1"]["wq"].shape[1]
    # VMEM per image: int8 in/out + bf16 qkv/residuals + f32 score scratch
    # + the fc1 int32/f32 tiles; ~16 MB at ViT-B shapes. Weights (~7 MB)
    # are grid-invariant and loaded once.
    per_img = N * (D * 14 + O1 * 10)
    import os

    bb_cap = int(os.environ.get("CHESS_VISION_FUSED_BB", "8"))
    bb = next((b for b in (8, 4, 2, 1)
               if b <= bb_cap and B % b == 0 and b * per_img <= 64 * 2**20),
              None)
    if bb is None:
        raise ValueError("fused block does not fit VMEM at these shapes")
    kern = functools.partial(
        _fused_block_kernel, bb=bb, num_heads=num_heads, head_dim=head_dim,
        scale=scale, shift_mode=shift_mode, approx=approx_gelu, eps=eps)
    img = lambda shape: pl.BlockSpec(  # noqa: E731
        (bb,) + shape, lambda b: (b,) + (0,) * len(shape),
        memory_space=pltpu.VMEM)
    w = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda b: (0,) * len(shape), memory_space=pltpu.VMEM)
    out_shape = (
        jax.ShapeDtypeStruct((B, N, D), res.dtype),
        jax.ShapeDtypeStruct((B, N, D), jnp.int8),
        jax.ShapeDtypeStruct((B, N, 1), jnp.float32),
    )
    out_specs = (img((N, D)), img((N, D)), img((N, 1)))
    x_new, yq, ys = pl.pallas_call(
        kern,
        out_shape=out_shape,
        grid=(B // bb,),
        in_specs=[
            img((N, D)), img((N, 1)), img((N, D)),
            w((D, 3 * D)), w((1, 3 * D)), w((1, 3 * D)),
            w((D, D)), w((1, D)), w((1, D)),
            w((1, D)), w((1, D)),
            w((D, O1)), w((1, O1)), w((1, O1)),
            w((O1, D)), w((1, D)), w((1, D)),
            w((1, D)), w((1, D)),
            pl.BlockSpec((1, 1), lambda b: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((N, num_heads * nm), jnp.float32),
            pltpu.VMEM((N, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=128 * 2**20,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * D * (3 * D + D + 2 * O1)
            + 2 * 2 * B * num_heads * N * N * head_dim,
            bytes_accessed=B * N * (3 * D + O1) + D * (4 * D + 2 * O1),
            transcendentals=B * num_heads * N * N + 2 * B * N * O1,
        ),
        interpret=interpret,
    )(xq, xs, res,
      q["qkv"]["wq"], _row2(q["qkv"]["scale"], 3 * D),
      _row2(q["qkv"]["bias"], 3 * D),
      q["proj"]["wq"], _row2(q["proj"]["scale"], D),
      _row2(q["proj"]["bias"], D),
      _row2(q["norm2"]["scale"], D), _row2(q["norm2"]["bias"], D),
      q["fc1"]["wq"], _row2(q["fc1"]["scale"], O1),
      _row2(q["fc1"]["bias"], O1),
      q["fc2"]["wq"], _row2(q["fc2"]["scale"], D),
      _row2(q["fc2"]["bias"], D),
      _row2(next_ln["scale"], D), _row2(next_ln["bias"], D),
      shift_arr)
    return x_new, yq, ys


def fused_vit_stack(xq, xs, res, blocks, next_norm1s, shifts,
                    num_heads: int, eps: float = 1e-6, approx_gelu=None,
                    interpret: bool = False):
    """Run a CHAIN of fused blocks as ONE lax.scan over stacked weights.

    The unrolled serving program compiles one whole-block Pallas kernel per
    transformer block (11 for ViT-B): at batch 512 that program
    deterministically crashed the remote compile helper (round 4,
    EXPERIMENTS.md). Scanning over a stacked weight tree compiles the fused
    kernel exactly ONCE — an ~11x smaller program — which is also the fix
    for multi-minute cold compiles through a remote-compile tunnel.

    blocks / next_norm1s / shifts: per-block quant packs, each block's
    FOLLOWING norm1 (so the scan emits the next block's quantized input),
    and per-layer calibrated shifts (all floats, or all None for the bound
    mode — a mixture must use the unrolled path).
    Returns (x, yq, ys) after the last scanned block.
    """
    assert len(blocks) == len(next_norm1s) == len(shifts) and blocks
    bound = shifts[0] is None
    assert all((s is None) == bound for s in shifts), \
        "fused_vit_stack needs uniform shift mode across layers"
    if approx_gelu is None:
        from chess_vision_tpu.ops.quant import _approx_gelu
        approx_gelu = _approx_gelu()

    stacked_q = jax.tree.map(lambda *a: jnp.stack(a), *blocks)
    stacked_ln = jax.tree.map(lambda *a: jnp.stack(a), *next_norm1s)
    shift_arr = jnp.zeros((len(blocks), 1, 1), jnp.float32) if bound else \
        jnp.asarray(shifts, jnp.float32).reshape(-1, 1, 1)

    def body(carry, layer):
        x, xq, xs = carry
        q, nln, sh = layer
        x, yq, ys = _pallas_fused(
            xq, xs, x, q, nln, sh,
            shift_mode="bound" if bound else "fixed",
            num_heads=num_heads, eps=eps, approx_gelu=approx_gelu,
            interpret=interpret)
        return (x, yq, ys), None

    (x, yq, ys), _ = jax.lax.scan(
        body, (res, xq, xs), (stacked_q, stacked_ln, shift_arr))
    return x, yq, ys
