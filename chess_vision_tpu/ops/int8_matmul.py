"""Fused int8 matmul + epilogue kernels for the ChessViT serving path.

Round-1 profile: with the matmuls on int8 MXU (XLA `dot_general`) and the
pre-op+quant chain in one Pallas pass (ops/quant.fused_rowquant), the
remaining HBM traffic is the bf16 *activation* tensors that XLA's matmul
epilogue writes out and the rowquant pass immediately re-reads (~40% of int8
runtime, VPU/HBM-bound). These kernels close that gap: the int8 MXU matmul
and the FULL epilogue — int32->f32 rescale, bias, then GELU / residual-add /
LayerNorm — plus the *next* operation's dynamic row quantization all run in
one Pallas kernel, so every activation is written to HBM exactly once, as
int8 (plus the bf16 residual stream, written once per block half).

Three variants cover the ViT block (reference models/vit_chess.py forward;
the quantization scheme itself is W8A8 per-token dynamic as in quant.py):

  int8_matmul_gelu_quant     y = rowquant(gelu(xq @ wq * s + b))       [fc1]
  int8_matmul_res_ln_quant   x' = res + (xq @ wq * s + b)              [proj,
                             y = rowquant(layernorm(x'))                fc2]
  int8_matmul_res            x' = res + (xq @ wq * s + b)         [last fc2]

Grid: one cell per `bb` images; the weight block's index map is constant so
Mosaic keeps it VMEM-resident across cells. Per image the matmul runs as a
(N, K) x (K, O) int8 dot on the MXU with int32 accumulation; the epilogue
(VPU) happens on the in-register/ VMEM tile before the single HBM write.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_bb(B: int, bytes_per_image: int, budget: int = 48 * 2**20) -> int:
    bb = next((b for b in (8, 4, 2, 1)
               if B % b == 0 and b * bytes_per_image <= budget), None)
    if bb is None:
        raise ValueError(
            f"int8 matmul block does not fit VMEM: {bytes_per_image} bytes "
            f"per image exceeds the {budget} byte budget even at block=1 "
            "(shape too large for the fused per-image kernel)"
        )
    return bb


def _matmul_f32(xq_i, xs_i, w, ws, bias):
    """(N, K) int8 x (K, O) int8 -> (N, O) f32 rescaled + biased."""
    acc = jax.lax.dot_general(
        xq_i, w,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * xs_i * ws + bias


def _rowquant(y):
    amax = jnp.maximum(jnp.max(jnp.abs(y), axis=-1, keepdims=True), 1e-8)
    yq = jnp.clip(jnp.round(y * (127.0 / amax)), -127, 127).astype(jnp.int8)
    return yq, amax * (1.0 / 127.0)


def _gelu_erf(x):
    """Exact-erf GELU via Abramowitz-Stegun 7.1.26 (no erf primitive in the
    Pallas TPU lowering; max abs err 1.5e-7 — same rational as quant._erf)."""
    a = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)
    z = x * 0.7071067811865476
    az = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * az)
    poly = t * (a[0] + t * (a[1] + t * (a[2] + t * (a[3] + t * a[4]))))
    erf = jnp.sign(z) * (1.0 - poly * jnp.exp(-az * az))
    return 0.5 * x * (1.0 + erf)


def _gelu_sigmoid(x):
    """Sigmoid-form GELU x*sigmoid(1.702x) (Hendrycks & Gimpel): one exp +
    one reciprocal vs the ~18-op erf rational above. Profiling showed the
    erf epilogue dominates the fc1 kernel (130 vs 322 T/s-eff for the
    otherwise-identical fc2 kernel); max |delta| vs erf-GELU is ~0.02, far
    below the per-row int8 quantization step that immediately follows.
    Serving opt-in via CHESS_VISION_GELU=sigmoid (ops/quant.py)."""
    return x / (1.0 + jnp.exp(-1.702 * x))


def _gelu_hard(x):
    """Hard-sigmoid GELU x*clip(0.4255x + 0.5, 0, 1): three cheap VPU ops,
    no transcendental at all. Max |delta| vs erf-GELU ~0.08 near |x|~2 —
    about one fc1 output rowquant step; gated on end-to-end accuracy
    validation (experiments/int8_eval.py) like the sigmoid form."""
    return x * jnp.clip(0.4255 * x + 0.5, 0.0, 1.0)


_GELUS = {"erf": _gelu_erf, "sigmoid": _gelu_sigmoid, "hard": _gelu_hard}


def _gelu(x, approx):
    # approx: legacy bool (True = sigmoid) or a mode string (_GELUS key)
    if isinstance(approx, bool):
        approx = "sigmoid" if approx else "erf"
    return _GELUS[approx](x)


def _epilogue_bf16() -> bool:
    """CHESS_VISION_EPILOGUE=bf16 runs the fc1 GELU+quant epilogue math in
    bfloat16 (the VPU packs two bf16 lanes per f32 lane, halving the
    elementwise pass cost over the (N, 4D) fc1 output — the per-op profile
    puts fc1 at 226 vs fc2's 299 T/s-eff purely from this epilogue).
    Numerics: bf16's ~0.4% relative error is below the ~0.8% per-row int8
    half-step that immediately follows; gated on end-to-end accuracy
    validation (experiments/int8_eval.py) before becoming default."""
    import os

    return os.environ.get("CHESS_VISION_EPILOGUE", "f32") == "bf16"


def _int8_dot(xq_i, w):
    """(N, K) int8 x (K, O) int8 -> (N, O) int32: the pure-MXU leg."""
    return jax.lax.dot_general(
        xq_i, w,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def _pipelined(bb, dot, epilogue):
    """Software-pipeline the per-image loop: issue the MXU dot for image i+1
    BEFORE the VPU epilogue of image i, so the scheduler can overlap matrix
    and vector work instead of serializing dot -> epilogue -> dot. The per-op
    profile (r4) put the fused kernels at 226-299 T/s-eff vs 374 for a bare
    XLA int8 matmul at the same shapes — the gap is epilogue serialization,
    not the matmul itself. Costs one extra live int32 accumulator tile."""
    acc = dot(0)
    for i in range(bb):
        nxt = dot(i + 1) if i + 1 < bb else None
        epilogue(i, acc)
        acc = nxt


def _gelu_quant_kernel(xq_ref, xs_ref, wq_ref, ws_ref, b_ref,
                       yq_ref, ys_ref, *, bb, approx, bf16_epi=False):
    w = wq_ref[...]

    def epilogue(i, acc):
        y = acc.astype(jnp.float32) * xs_ref[i] * ws_ref[0] + b_ref[0]
        if bf16_epi:
            g = _gelu(y.astype(jnp.bfloat16), approx)
            amax = jnp.maximum(
                jnp.max(jnp.abs(g), axis=-1, keepdims=True
                        ).astype(jnp.float32), 1e-8)
            yq_ref[i] = jnp.clip(
                jnp.round(g.astype(jnp.float32) * (127.0 / amax)),
                -127, 127).astype(jnp.int8)
            ys_ref[i] = amax * (1.0 / 127.0)
        else:
            yq_ref[i], ys_ref[i] = _rowquant(_gelu(y, approx))

    _pipelined(bb, lambda i: _int8_dot(xq_ref[i], w), epilogue)


def _res_ln_quant_kernel(xq_ref, xs_ref, wq_ref, ws_ref, b_ref, res_ref,
                         g_ref, b2_ref, xn_ref, yq_ref, ys_ref, *, bb, eps):
    w = wq_ref[...]

    def epilogue(i, acc):
        y = acc.astype(jnp.float32) * xs_ref[i] * ws_ref[0] + b_ref[0]
        xn = res_ref[i].astype(jnp.float32) + y
        xn_b = xn.astype(xn_ref.dtype)
        xn_ref[i] = xn_b
        # LayerNorm on the stored (rounded) residual so the math is identical
        # to re-reading it; two-pass stats (mean, then mean of squared
        # deviations) — the one-pass E[x^2]-mu^2 form cancels catastrophically
        # for large-mean rows and residual magnitude grows with depth. The row
        # is VMEM-resident so the second pass is cheap.
        h = xn_b.astype(jnp.float32)
        mu = jnp.mean(h, axis=-1, keepdims=True)
        cen = h - mu
        var = jnp.mean(jnp.square(cen), axis=-1, keepdims=True)
        h = cen * jax.lax.rsqrt(var + eps) * g_ref[0] + b2_ref[0]
        yq_ref[i], ys_ref[i] = _rowquant(h)

    _pipelined(bb, lambda i: _int8_dot(xq_ref[i], w), epilogue)


def _res_kernel(xq_ref, xs_ref, wq_ref, ws_ref, b_ref, res_ref,
                xn_ref, *, bb):
    w = wq_ref[...]

    def epilogue(i, acc):
        y = acc.astype(jnp.float32) * xs_ref[i] * ws_ref[0] + b_ref[0]
        xn_ref[i] = (res_ref[i].astype(jnp.float32) + y).astype(xn_ref.dtype)

    _pipelined(bb, lambda i: _int8_dot(xq_ref[i], w), epilogue)


def _row2(v, O):
    return jnp.asarray(v, jnp.float32).reshape(1, O)


def _common_in_specs(bb, N, K, O):
    return [
        pl.BlockSpec((bb, N, K), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bb, N, 1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((K, O), lambda b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, O), lambda b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, O), lambda b: (0, 0), memory_space=pltpu.VMEM),
    ]


def _cost(B, N, K, O, transcendental_rows=0):
    return pl.CostEstimate(
        flops=2 * B * N * K * O,
        bytes_accessed=B * N * (K + O) + K * O + 4 * B * N * 2,
        transcendentals=transcendental_rows * B * N * O,
    )


def int8_matmul_gelu_quant(xq, xs, wq, ws, bias, interpret: bool = False,
                           approx_gelu: bool = False):
    """fc1 + GELU + requant in one HBM pass.

    xq: (B, N, K) int8; xs: (B, N, 1) f32; wq: (K, O) int8; ws/bias: (O,).
    Returns (yq (B, N, O) int8, ys (B, N, 1) f32). approx_gelu swaps the
    erf rational for x*sigmoid(1.702x) (see _gelu_sigmoid).
    """
    B, N, K = xq.shape
    O = wq.shape[1]
    bb = _pick_bb(B, N * (K + 6 * O))  # int8 in + f32 acc + int8/f32 out
    return pl.pallas_call(
        functools.partial(_gelu_quant_kernel, bb=bb, approx=approx_gelu,
                          bf16_epi=_epilogue_bf16()),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, O), jnp.int8),
            jax.ShapeDtypeStruct((B, N, 1), jnp.float32),
        ),
        grid=(B // bb,),
        in_specs=_common_in_specs(bb, N, K, O),
        out_specs=(
            pl.BlockSpec((bb, N, O), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, N, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 2**20,
        ),
        cost_estimate=_cost(B, N, K, O, transcendental_rows=2),
        interpret=interpret,
    )(xq, xs, wq, _row2(ws, O), _row2(bias, O))


def int8_matmul_res_ln_quant(xq, xs, wq, ws, bias, res, ln_scale, ln_bias,
                             eps: float = 1e-6, interpret: bool = False):
    """proj/fc2 + residual add + next LayerNorm + requant in one HBM pass.

    res: (B, N, O) bf16 residual stream. Returns (x_new (B, N, O) bf16,
    yq (B, N, O) int8, ys (B, N, 1) f32) where yq/ys quantize
    layernorm(x_new).
    """
    B, N, K = xq.shape
    O = wq.shape[1]
    bb = _pick_bb(B, N * (K + 11 * O))
    return pl.pallas_call(
        functools.partial(_res_ln_quant_kernel, bb=bb, eps=eps),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, O), res.dtype),
            jax.ShapeDtypeStruct((B, N, O), jnp.int8),
            jax.ShapeDtypeStruct((B, N, 1), jnp.float32),
        ),
        grid=(B // bb,),
        in_specs=_common_in_specs(bb, N, K, O) + [
            pl.BlockSpec((bb, N, O), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, O), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, O), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bb, N, O), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, N, O), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, N, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 2**20,
        ),
        cost_estimate=_cost(B, N, K, O),
        interpret=interpret,
    )(xq, xs, wq, _row2(ws, O), _row2(bias, O), res,
      _row2(ln_scale, O), _row2(ln_bias, O))


def int8_matmul_res(xq, xs, wq, ws, bias, res, interpret: bool = False):
    """Last-block fc2 + residual add (no follow-on LayerNorm/quant)."""
    B, N, K = xq.shape
    O = wq.shape[1]
    bb = _pick_bb(B, N * (K + 9 * O))
    return pl.pallas_call(
        functools.partial(_res_kernel, bb=bb),
        out_shape=jax.ShapeDtypeStruct((B, N, O), res.dtype),
        grid=(B // bb,),
        in_specs=_common_in_specs(bb, N, K, O) + [
            pl.BlockSpec((bb, N, O), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, N, O), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 2**20,
        ),
        cost_estimate=_cost(B, N, K, O),
        interpret=interpret,
    )(xq, xs, wq, _row2(ws, O), _row2(bias, O), res)


# ---------------------------------------------------------------------------
# Flat (M-blocked) variants — no per-image block structure.
#
# The per-image kernels above run one (N=257, K) dot per image inside each
# grid cell: M=257 underfills the MXU pipeline and the 257-row blocks are
# sublane-padded, which measured at 30-69 TOPS-effective vs 92-374 for plain
# XLA at the same shapes. Rowquant, LayerNorm, and GELU are all row-local, so
# nothing about the epilogue actually needs image structure: these variants
# treat the activation stream as a flat (M, K) matrix (M = B * N_padded with
# the token axis padded to a multiple of the 32-row int8 tile, so the
# (B, NP, D) <-> (M, D) reshape is layout-free) and tile M into large
# MXU-friendly row blocks. Only attention needs image structure and handles
# it separately (ops/attention.fused_qkv_attention_quant_flat, masking the
# padded key rows).
# ---------------------------------------------------------------------------


def _pick_bm(M: int, bytes_per_row: int, budget: int = 48 * 2**20) -> int:
    bm = next((b for b in (2048, 1024, 512, 256, 128, 64, 32)
               if M % b == 0 and b * bytes_per_row <= budget), None)
    if bm is None:
        raise ValueError(
            f"int8 flat matmul: no row-block of M={M} fits the {budget} byte "
            f"VMEM budget at {bytes_per_row} bytes/row (pad M to a multiple "
            "of 32 and keep K*O moderate)"
        )
    return bm


def _gelu_quant_kernel_flat(xq_ref, xs_ref, wq_ref, ws_ref, b_ref,
                            yq_ref, ys_ref, *, approx):
    y = _gelu(_matmul_f32(xq_ref[...], xs_ref[...], wq_ref[...],
                          ws_ref[0], b_ref[0]), approx)
    yq_ref[...], ys_ref[...] = _rowquant(y)


def _res_ln_quant_kernel_flat(xq_ref, xs_ref, wq_ref, ws_ref, b_ref, res_ref,
                              g_ref, b2_ref, xn_ref, yq_ref, ys_ref, *, eps):
    y = _matmul_f32(xq_ref[...], xs_ref[...], wq_ref[...], ws_ref[0], b_ref[0])
    xn = res_ref[...].astype(jnp.float32) + y
    xn_b = xn.astype(xn_ref.dtype)
    xn_ref[...] = xn_b
    # LN on the stored (rounded) residual; two-pass stats (see blocked kernel)
    h = xn_b.astype(jnp.float32)
    mu = jnp.mean(h, axis=-1, keepdims=True)
    cen = h - mu
    var = jnp.mean(jnp.square(cen), axis=-1, keepdims=True)
    h = cen * jax.lax.rsqrt(var + eps) * g_ref[0] + b2_ref[0]
    yq_ref[...], ys_ref[...] = _rowquant(h)


def _res_kernel_flat(xq_ref, xs_ref, wq_ref, ws_ref, b_ref, res_ref, xn_ref):
    y = _matmul_f32(xq_ref[...], xs_ref[...], wq_ref[...], ws_ref[0], b_ref[0])
    xn_ref[...] = (res_ref[...].astype(jnp.float32) + y).astype(xn_ref.dtype)


def _flat_in_specs(bm, K, O):
    return [
        pl.BlockSpec((bm, K), lambda b: (b, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bm, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((K, O), lambda b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, O), lambda b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, O), lambda b: (0, 0), memory_space=pltpu.VMEM),
    ]


def _cost_flat(M, K, O, transcendental_rows=0):
    return pl.CostEstimate(
        flops=2 * M * K * O,
        bytes_accessed=M * (K + O) + K * O + 4 * M * 2,
        transcendentals=transcendental_rows * M * O,
    )


def int8_matmul_gelu_quant_flat(xq, xs, wq, ws, bias, interpret: bool = False,
                                approx_gelu: bool = False):
    """fc1 + GELU + requant, flat layout.

    xq: (M, K) int8; xs: (M, 1) f32; wq: (K, O) int8; ws/bias: (O,).
    Returns (yq (M, O) int8, ys (M, 1) f32).
    """
    M, K = xq.shape
    O = wq.shape[1]
    bm = _pick_bm(M, K + 6 * O)
    return pl.pallas_call(
        functools.partial(_gelu_quant_kernel_flat, approx=approx_gelu),
        out_shape=(
            jax.ShapeDtypeStruct((M, O), jnp.int8),
            jax.ShapeDtypeStruct((M, 1), jnp.float32),
        ),
        grid=(M // bm,),
        in_specs=_flat_in_specs(bm, K, O),
        out_specs=(
            pl.BlockSpec((bm, O), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 2**20,
        ),
        cost_estimate=_cost_flat(M, K, O, transcendental_rows=2),
        interpret=interpret,
    )(xq, xs, wq, _row2(ws, O), _row2(bias, O))


def int8_matmul_res_ln_quant_flat(xq, xs, wq, ws, bias, res, ln_scale,
                                  ln_bias, eps: float = 1e-6,
                                  interpret: bool = False):
    """proj/fc2 + residual + next LayerNorm + requant, flat layout.

    res: (M, O) bf16. Returns (x_new (M, O) bf16, yq (M, O) int8,
    ys (M, 1) f32) where yq/ys quantize layernorm(x_new).
    """
    M, K = xq.shape
    O = wq.shape[1]
    bm = _pick_bm(M, K + 11 * O)
    return pl.pallas_call(
        functools.partial(_res_ln_quant_kernel_flat, eps=eps),
        out_shape=(
            jax.ShapeDtypeStruct((M, O), res.dtype),
            jax.ShapeDtypeStruct((M, O), jnp.int8),
            jax.ShapeDtypeStruct((M, 1), jnp.float32),
        ),
        grid=(M // bm,),
        in_specs=_flat_in_specs(bm, K, O) + [
            pl.BlockSpec((bm, O), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, O), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, O), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bm, O), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, O), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 2**20,
        ),
        cost_estimate=_cost_flat(M, K, O),
        interpret=interpret,
    )(xq, xs, wq, _row2(ws, O), _row2(bias, O), res,
      _row2(ln_scale, O), _row2(ln_bias, O))


def int8_matmul_res_flat(xq, xs, wq, ws, bias, res, interpret: bool = False):
    """Last-block fc2 + residual add, flat layout."""
    M, K = xq.shape
    O = wq.shape[1]
    bm = _pick_bm(M, K + 9 * O)
    return pl.pallas_call(
        _res_kernel_flat,
        out_shape=jax.ShapeDtypeStruct((M, O), res.dtype),
        grid=(M // bm,),
        in_specs=_flat_in_specs(bm, K, O) + [
            pl.BlockSpec((bm, O), lambda b: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, O), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 2**20,
        ),
        cost_estimate=_cost_flat(M, K, O),
        interpret=interpret,
    )(xq, xs, wq, _row2(ws, O), _row2(bias, O), res)
