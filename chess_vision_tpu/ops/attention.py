"""Fused single-tile attention kernel for short sequences (Pallas, TPU).

XLA on this backend materializes the full (B, H, N, N) f32 score tensor for
jax.nn.dot_product_attention — at ViT-B serving shapes (N=257) that is 9.3GB
of HBM traffic per block at batch 2048 (measured; it OOMs), which made
attention dominate runtime despite being ~1% of the FLOPs.

At N=257 a whole (batch, head) attention instance fits comfortably in VMEM
(Q/K/V 33KB each + 264KB f32 scores), so no online-softmax tiling is needed:
one grid cell = one (batch, head-pair) -> QK^T, softmax, PV entirely on-chip.
Scores never touch HBM.

The kernel reads Q/K/V directly out of the *packed* qkv projection output
(B, N, 3*H*Dh) — the timm fused-qkv layout (B,N,3,H,Dh) flattened — using
BlockSpec index maps, so the (B,N,3,H,Dh) reshape/transpose copy (3.4GB at
batch 2048, measured) disappears as well. Two 64-wide heads are processed per
grid cell so blocks fill the 128-lane VPU/MXU tile width.

Training uses a custom VJP whose backward recomputes attention with plain XLA
ops (jax.vjp over the reference math): the memory saving applies to the
forward/serving path, and no flash backward kernel is needed at N=257.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _reference_attention(qkv: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """Plain-XLA reference (identical math): used on CPU and for the VJP."""
    B, N, C3 = qkv.shape
    D = C3 // 3
    parts = qkv.reshape(B, N, 3, num_heads, D // num_heads)
    q, k, v = parts[:, :, 0], parts[:, :, 1], parts[:, :, 2]
    scale = 1.0 / math.sqrt(q.shape[-1])
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), v)
    return out.reshape(B, N, D)


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, heads_per_block, head_dim,
                 scale):
    # Softmax is the kernel's real cost (profiled: attention is VPU-bound —
    # its matmul time is ~2ms/batch vs ~46ms measured): every elementwise
    # pass runs over the (N, N) score tile, lane-padded 257->384. So the
    # normalizer is folded into the PV matmul instead of being its own
    # passes: append a ones-column to V (free — the 64-wide V tile pads to
    # 128 lanes anyway) so the MXU emits [P@V | rowsum(P)], and divide the
    # small (N, head_dim) output. VPU passes per head drop from ~4 (max,
    # exp, sum, divide+cast) to 2 (max, exp).
    q = q_ref[0]  # (N, heads_per_block * head_dim)
    k = k_ref[0]
    v = v_ref[0]
    n = q.shape[0]
    fold = _pow2(scale)
    if fold:
        q = q * jnp.asarray(scale, q.dtype)  # exact: scale = 2^-3 at Dh=64
    nm = (n // _LANES) * _LANES
    split = fold and nm >= _LANES and 0 < n - nm <= 2
    extra = _extra_key_scores(q, k, nm, heads_per_block) if split else None
    for i in range(heads_per_block):
        sl = slice(i * head_dim, (i + 1) * head_dim)
        if split:
            # exact max-shifted softmax with the key axis split at the last
            # multiple of 128 lanes (see _head_pv_split); [P@V | rowsum] f32
            o_ext = _head_pv_split(q, k, v, sl, None, extra, i)
        else:
            s = _head_scores(q, k, sl, 1.0 if fold else scale, False)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m).astype(v.dtype)      # unnormalized, rows <= 1
            v_ext = jnp.concatenate(
                [v[:, sl], jnp.ones((n, 1), v.dtype)], axis=1
            )
            o_ext = jax.lax.dot(p, v_ext,
                                preferred_element_type=jnp.float32)
        o_ref[0, :, sl] = (
            o_ext[:, :head_dim] / o_ext[:, head_dim:]
        ).astype(o_ref.dtype)


def _kernel_attention(qkv: jnp.ndarray, num_heads: int,
                      interpret: bool = False,
                      heads_per_block: int | None = None) -> jnp.ndarray:
    B, N, C3 = qkv.shape
    D = C3 // 3
    head_dim = D // num_heads
    # Process all heads of an image in one cell when the tiles fit VMEM
    # (fewer grid transitions measured slightly faster than 128-lane-width
    # blocking); otherwise fall back to filling the 128-lane tile width.
    if heads_per_block:
        hpb = heads_per_block
    elif D * N * 7 <= 24 * 2**20 and D % _LANES == 0:
        hpb = num_heads
    else:
        hpb = max(1, _LANES // head_dim)
    while num_heads % hpb:
        hpb //= 2
    width = hpb * head_dim
    groups = num_heads // hpb
    scale = 1.0 / math.sqrt(head_dim)

    spec = lambda part: pl.BlockSpec(  # noqa: E731
        (1, N, width),
        lambda b, g, part=part: (b, 0, part * groups + g),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        functools.partial(_attn_kernel, heads_per_block=hpb,
                          head_dim=head_dim, scale=scale),
        out_shape=jax.ShapeDtypeStruct((B, N, D), qkv.dtype),
        grid=(B, groups),
        in_specs=[spec(0), spec(1), spec(2)],  # q, k, v column groups of qkv
        out_specs=pl.BlockSpec(
            (1, N, width), lambda b, g: (b, 0, g), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * num_heads * N * N * head_dim,
            bytes_accessed=qkv.size * qkv.dtype.itemsize * 4 // 3,
            transcendentals=B * num_heads * N * N,
        ),
        interpret=interpret,
    )(qkv, qkv, qkv)


def _pow2(x: float) -> bool:
    """True when x is an exact power of two (folding it is lossless)."""
    m, _ = math.frexp(x)
    return m == 0.5


def _softmax_shift_mode() -> str:
    """CHESS_VISION_ATTN_SOFTMAX: bound (default) | fixed | max.

    The per-row max reduction over the lane-padded (N, N) score tile is the
    serving attention kernel's single most expensive pass (~1.4ms of
    ~3.4ms/layer-batch at B=512 — exp itself is nearly free on the VPU;
    measured via experiments/attn_variants.py). The ones-column rowsum
    renormalizes ANY shift exactly, so the max is not needed for
    correctness — only to keep exp(s - shift) inside f32 range.

    'bound' replaces the max with the per-(row, head) Cauchy-Schwarz bound
    |q_i| * max_j |k_j| - 45, computed outside the score tile from one
    squared pass over q/k plus two tiny MXU dots against a block-diagonal
    head selector. Since bound >= true row max, exp(max - shift) <= e^45
    and the rowsum <= 257*e^45 ~ 2.6e21 — overflow is IMPOSSIBLE for any
    checkpoint. A whole row underflows only if the bound overshoots the
    true max by > 132 (worst measured on a trained ViT: 81, and the
    rowsum floor degrades that row to zero attention instead of NaN).

    'fixed' uses exp(s - 24) with no per-row work at all — fastest, but
    only safe for models whose logits are known < ~110 (trained ViTs here
    measured up to 126: NOT safe as a default; kept for calibrated
    deployments). 'max' is the exact max-shifted softmax. Read at trace
    time."""
    import os

    return os.environ.get("CHESS_VISION_ATTN_SOFTMAX", "bound")


_FIXED_SHIFT = 24.0
_BOUND_OFFSET = 45.0


def _bound_shift(q, k, num_heads, head_dim, kn2_mask_rows=None):
    """(N, H) f32 per-(row, head) softmax shifts: |q_i| max_j|k_j| - 45.

    q must already carry the softmax scale (folded). kn2_mask_rows masks
    padded key rows (flat layout) out of the key-norm max."""
    sel = _head_selector(q.shape[1], num_heads)
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    qn2 = jax.lax.dot(qf * qf, sel, preferred_element_type=jnp.float32)
    kn2 = jax.lax.dot(kf * kf, sel, preferred_element_type=jnp.float32)
    if kn2_mask_rows is not None:
        kn2 = jnp.where(kn2_mask_rows, 0.0, kn2)
    kn2max = jnp.max(kn2, axis=0, keepdims=True)  # (1, H) sublane reduce
    return jnp.sqrt(qn2 * kn2max) - _BOUND_OFFSET


def _exp_bf16() -> bool:
    """CHESS_VISION_ATTN_EXP=bf16 runs the softmax exp pass in bfloat16.

    p is cast to bf16 for the PV matmul anyway, so moving the cast BEFORE
    the exp changes only where the rounding lands: bf16 exp's ~0.4%
    relative error on the softmax weights sits well under the per-row int8
    quantization (~0.8% half-step) of the attention output that follows,
    and the VPU packs two bf16 lanes per f32 lane on the serving path's
    single largest elementwise pass (N x N_keys per head per image).
    Read at trace time; default f32 until validated end-to-end."""
    import os

    return os.environ.get("CHESS_VISION_ATTN_EXP", "f32") == "bf16"


def _head_selector(width: int, num_heads: int) -> jnp.ndarray:
    """(width, num_heads) f32 block-diagonal head selector: column h is 1 on
    the rows of head h's feature slice. Contracting a (N, width) tensor with
    it sums per head — per-head row stats for all heads in ONE MXU dot."""
    head_dim = width // num_heads
    return (
        jax.lax.broadcasted_iota(jnp.int32, (width, num_heads), 0) // head_dim
        == jax.lax.broadcasted_iota(jnp.int32, (width, num_heads), 1)
    ).astype(jnp.float32)


def _extra_key_scores(q, k, nm, num_heads):
    """(N, n_extra) x num_heads extra-key logits, no narrow dots.

    Scores against the <=2 keys past the last 128-multiple are computed for
    ALL heads at once: q * k_row broadcast (f32, exact to f32 rounding)
    contracted with the block-diagonal head selector. Mosaic rejects 1-wide
    matmuls, and this costs one (N, D) multiply + one (N, D)@(D, H) dot per
    extra key. Returns a list of (N, num_heads) f32, one per extra key.
    q must already carry the softmax scale."""
    sel = _head_selector(q.shape[1], num_heads)
    qf = q.astype(jnp.float32)
    return [
        jax.lax.dot(qf * k[j, :].astype(jnp.float32), sel,
                    preferred_element_type=jnp.float32)
        for j in range(nm, k.shape[0])
    ]


def _head_pv_split(q, k, v, sl, shift, extra, head_index):
    """[P@V | rowsum(P)] -> (N, head_dim + 1) f32 for one head slice.

    The key axis is split at its last multiple of 128: a 257-key score
    tile lane-pads to 384 (+50% on every score-tile op — the QK^T output,
    exp, and the PV contraction), while a 256-key main tile maps exactly.
    The remainder keys' logits arrive precomputed (`extra`, from
    _extra_key_scores) and their [P@V | rowsum] contribution is a
    broadcast FMA (softmax is a sum over keys, so partial results add).

    shift: (N, 1) or scalar softmax shift; None computes the exact per-row
    max across the main tile and the extra keys. q must already carry the
    softmax scale."""
    n_keys = k.shape[0]
    head_dim = sl.stop - sl.start
    nm = n_keys - len(extra)
    s = jax.lax.dot_general(
        q[:, sl], k[:nm, sl],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    se = [e[:, head_index:head_index + 1] for e in extra]  # (N, 1) each
    if shift is None:
        shift = jnp.max(s, axis=-1, keepdims=True)
        for e in se:
            shift = jnp.maximum(shift, e)
    if _exp_bf16():
        p = jnp.exp((s - shift).astype(v.dtype))
    else:
        p = jnp.exp(s - shift).astype(v.dtype)
    v_ext = jnp.concatenate(
        [v[:nm, sl], jnp.ones((nm, 1), v.dtype)], axis=1
    )
    o_ext = jax.lax.dot(p, v_ext, preferred_element_type=jnp.float32)
    for j, e in enumerate(se):
        pe = jnp.exp(e - shift)                       # (N, 1) f32
        row = jnp.concatenate(
            [v[nm + j:nm + j + 1, sl], jnp.ones((1, 1), v.dtype)], axis=1
        ).astype(jnp.float32)                         # (1, head_dim + 1)
        o_ext = o_ext + pe * row                      # broadcast FMA
    return o_ext


def _rowq8(x):
    """Per-row int8 quantization of a (N, head_dim) slice, f32 in."""
    amax = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True), 1e-8)
    xq = jnp.clip(jnp.round(x * (127.0 / amax)), -127, 127).astype(jnp.int8)
    return xq, amax * (1.0 / 127.0)


def _head_scores(q, k, sl, scale, qk_int8):
    """(N, N) f32 scaled attention logits for one head slice.

    qk_int8 runs the QK^T contraction in int8 with per-(row, head) dynamic
    scales: head_dim=64 fills only half the 128-wide MXU contraction, and
    the int8 MXU runs that underfilled pass at twice the bf16 rate
    (profiled: attention is the serving path's second-largest cost at ~34
    T/s-eff). Relative score error ~0.6% (two per-row int8 roundings into a
    64-term dot), well under the output row-quant that follows; validated
    end-to-end on the trained checkpoint (experiments/int8_eval.py)."""
    if not qk_int8:
        s = jax.lax.dot_general(
            q[:, sl], k[:, sl],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # scale == 1.0 when it was folded into q before the dot (exact for
        # power-of-two scales); skip the (N, N) lane-padded multiply pass.
        return s if scale == 1.0 else s * scale
    qq, qs = _rowq8(q[:, sl].astype(jnp.float32))
    kq, ks = _rowq8(k[:, sl].astype(jnp.float32))
    s32 = jax.lax.dot_general(
        qq, kq,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return s32.astype(jnp.float32) * (qs * scale) * ks.reshape(1, -1)


def _colq8(x):
    """Per-column int8 quantization of a (N, head_dim) slice, f32 in."""
    amax = jnp.maximum(jnp.max(jnp.abs(x), axis=0, keepdims=True), 1e-8)
    xq = jnp.clip(jnp.round(x * (127.0 / amax)), -127, 127).astype(jnp.int8)
    return xq, amax * (1.0 / 127.0)


def _head_av(p, v, sl, pv_int8):
    """(N, head_dim) f32 attention output P@V for one head slice.

    pv_int8 also runs the value contraction in int8: P rows quantized
    against their max (softmax output, >= 0), V per-COLUMN — the scale must
    factor out of the sum over keys, so it cannot be per-key: sum_k
    pq[q,k]*vq[k,d] * ps[q]*vs[d]."""
    if not pv_int8:
        return jax.lax.dot(
            p.astype(v.dtype), v[:, sl],
            preferred_element_type=jnp.float32,
        )
    pq, ps = _rowq8(p)
    vq, vs = _colq8(v[:, sl].astype(jnp.float32))
    o32 = jax.lax.dot(pq, vq, preferred_element_type=jnp.int32)
    return o32.astype(jnp.float32) * ps * vs


def _attn_quant_kernel(q_ref, k_ref, v_ref, oq_ref, os_ref, scratch, *rest,
                       num_heads, head_dim, scale, qk_int8, pv_int8,
                       shift_mode, fixed_shift=_FIXED_SHIFT):
    s_all = rest[0] if rest else None  # wide-exp score scratch (fixed mode)
    # Several images per grid cell (ab, leading block dim): at B=512 the
    # one-image grid is 512 cells x ~5us of work each, so fixed per-cell
    # cost (grid transition + DMA wait) is a measurable fraction; blocking
    # amortizes it without changing any per-image math.
    for j in range(q_ref.shape[0]):
        _attn_quant_image(q_ref, k_ref, v_ref, oq_ref, os_ref, scratch,
                          s_all, j,
                          num_heads=num_heads, head_dim=head_dim, scale=scale,
                          qk_int8=qk_int8, pv_int8=pv_int8,
                          shift_mode=shift_mode, fixed_shift=fixed_shift)


def _wide_exp_attention(q, k, v, scratch, s_all, num_heads, head_dim, nm,
                        shift):
    """Calibrated-shift fast path: all head score tiles -> ONE wide exp pass.

    The per-head structure runs 12 narrow exp passes over (N, 256) tiles;
    Mosaic's elementwise throughput on narrow tiles measured ~4x below its
    wide-pass rate (same effect as the r4 per-head-amax negative result, in
    reverse). With a per-layer CALIBRATED scalar shift the exp input needs no
    per-row/per-head work at all, so the score tiles for every head are
    written side by side into one (N, H*nm) f32 scratch and exponentiated in
    a single wide pass at the fc1-epilogue VPU rate. PV dots + extra-key FMAs
    then read bf16 column slices. Math identical to _head_pv_split with a
    scalar shift."""
    n = q.shape[0]
    for i in range(num_heads):
        sl = slice(i * head_dim, (i + 1) * head_dim)
        s_all[:, i * nm:(i + 1) * nm] = jax.lax.dot_general(
            q[:, sl], k[:nm, sl],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    p_all = jnp.exp(s_all[...] - shift).astype(v.dtype)   # ONE wide pass
    extra = _extra_key_scores(q, k, nm, num_heads)        # (N, H) f32 each
    for i in range(num_heads):
        sl = slice(i * head_dim, (i + 1) * head_dim)
        v_ext = jnp.concatenate(
            [v[:nm, sl], jnp.ones((nm, 1), v.dtype)], axis=1
        )
        o_ext = jax.lax.dot(p_all[:, i * nm:(i + 1) * nm], v_ext,
                            preferred_element_type=jnp.float32)
        for j, e in enumerate(extra):
            pe = jnp.exp(e[:, i:i + 1] - shift)           # (N, 1) f32
            row = jnp.concatenate(
                [v[nm + j:nm + j + 1, sl], jnp.ones((1, 1), v.dtype)], axis=1
            ).astype(jnp.float32)
            o_ext = o_ext + pe * row
        scratch[:, sl] = o_ext[:, :head_dim] / jnp.maximum(
            o_ext[:, head_dim:], 1e-30)


def _attn_quant_image(q_ref, k_ref, v_ref, oq_ref, os_ref, scratch, s_all, j,
                      *, num_heads, head_dim, scale, qk_int8, pv_int8,
                      shift_mode, fixed_shift=_FIXED_SHIFT):
    q = q_ref[j]
    k = k_ref[j]
    v = v_ref[j]
    n = q.shape[0]
    legacy = qk_int8 or pv_int8  # experimental int8-score modes: full-width
    fold = not legacy and _pow2(scale)
    if fold:
        # Fold the softmax scale into q: one (N, D) multiply replaces a
        # per-head pass over the lane-padded (N, N) score tile. Exact —
        # scale = 2^-3 at head_dim 64, a pure exponent shift in bf16/f32.
        q = q * jnp.asarray(scale, q.dtype)
    bound = _bound_shift(q, k, num_heads, head_dim) \
        if shift_mode == "bound" and fold else None
    nm = (n // _LANES) * _LANES
    split = fold and nm >= _LANES and 0 < n - nm <= 2
    wide = shift_mode == "fixed" and split and s_all is not None
    if wide:
        _wide_exp_attention(q, k, v, scratch, s_all, num_heads, head_dim,
                            nm, fixed_shift)
    extra = _extra_key_scores(q, k, nm, num_heads) if split and not wide \
        else None
    for i in range(0 if wide else num_heads):
        sl = slice(i * head_dim, (i + 1) * head_dim)
        if legacy:
            s = _head_scores(q, k, sl, scale, qk_int8)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            if pv_int8:
                p = p / jnp.sum(p, axis=-1, keepdims=True)
                scratch[:, sl] = _head_av(p, v, sl, True)
            else:
                v_ext = jnp.concatenate(
                    [v[:, sl], jnp.ones((n, 1), v.dtype)], axis=1
                )
                o_ext = jax.lax.dot(
                    p.astype(v.dtype), v_ext,
                    preferred_element_type=jnp.float32,
                )
                scratch[:, sl] = o_ext[:, :head_dim] / o_ext[:, head_dim:]
            continue
        if bound is not None:
            shift = bound[:, i:i + 1]
        elif shift_mode == "fixed" and fold:
            shift = fixed_shift
        else:
            shift = None  # exact per-row max
        if split:
            o_ext = _head_pv_split(q, k, v, sl, shift, extra, i)
        else:
            s = _head_scores(q, k, sl, 1.0 if fold else scale, False)
            if shift is None:
                shift = jnp.max(s, axis=-1, keepdims=True)
            if _exp_bf16():
                p = jnp.exp((s - shift).astype(v.dtype))
            else:
                p = jnp.exp(s - shift).astype(v.dtype)
            v_ext = jnp.concatenate(
                [v[:, sl], jnp.ones((n, 1), v.dtype)], axis=1
            )
            o_ext = jax.lax.dot(p, v_ext,
                                preferred_element_type=jnp.float32)
        # rowsum floor: a (pathological) fully-underflowed row yields
        # zero attention output instead of 0/0 = NaN; (N, 1) so free.
        scratch[:, sl] = o_ext[:, :head_dim] / jnp.maximum(
            o_ext[:, head_dim:], 1e-30)
    # int8 serving path: the proj matmul consumes a quantized tensor anyway,
    # so quantize here — the full row is on-chip — instead of writing bf16 to
    # HBM and re-reading it in a separate rowquant pass. One wide (N, D)
    # abs+max: per-head (N, 64) reductions folded into the loop were tried
    # and measured 1.7x SLOWER (Mosaic narrow lane reductions; 52.6 vs 30.5
    # ms/batch at B=512 — r4 profile).
    o = scratch[...].astype(jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(o), axis=-1, keepdims=True), 1e-8)
    oq_ref[j] = jnp.clip(jnp.round(o * (127.0 / amax)), -127, 127
                         ).astype(jnp.int8)
    os_ref[j] = amax * (1.0 / 127.0)


def _attn_int8_mode() -> tuple[bool, bool]:
    """CHESS_VISION_ATTN_QK: bf16 (default) | int8 (QK^T leg) | int8pv
    (QK^T and P@V legs). Returns (qk_int8, pv_int8)."""
    import os

    mode = os.environ.get("CHESS_VISION_ATTN_QK", "bf16")
    return mode in ("int8", "int8pv"), mode == "int8pv"


def fused_qkv_attention_quant(qkv: jnp.ndarray, num_heads: int,
                              interpret: bool = False,
                              qk_int8: bool | None = None,
                              pv_int8: bool | None = None,
                              softmax_shift: float | None = None):
    """(B, N, 3*H*Dh) packed qkv -> (int8 (B, N, H*Dh), f32 (B, N, 1)).

    Attention + dynamic per-token int8 quantization of the output in one
    kernel (serving path: feeds the int8 proj matmul). Falls back to
    attention-then-quant in plain XLA off-TPU. softmax_shift overrides the
    CHESS_VISION_ATTN_SOFTMAX mode with a CALIBRATED per-layer fixed shift
    (quant.calibrate_attn_shifts stores them in the quant pack) — the
    fastest mode, made safe by measuring each layer's logit range.
    """
    B, N, C3 = qkv.shape
    D = C3 // 3
    head_dim = D // num_heads
    env_qk, env_pv = _attn_int8_mode()
    if qk_int8 is None:
        qk_int8 = env_qk
    if pv_int8 is None:
        pv_int8 = env_pv
    if jax.default_backend() != "tpu" and not interpret:
        o = _reference_attention(qkv, num_heads).astype(jnp.float32)
        amax = jnp.maximum(jnp.max(jnp.abs(o), axis=-1, keepdims=True), 1e-8)
        oq = jnp.clip(jnp.round(o * (127.0 / amax)), -127, 127
                      ).astype(jnp.int8)
        return oq, amax * (1.0 / 127.0)
    scale = 1.0 / math.sqrt(head_dim)
    # images per grid cell: amortize per-cell overhead within a VMEM budget
    # (~3 x N x D inputs + int8/f32 outputs + score tiles, ~2.6MB/image).
    # CHESS_VISION_ATTN_AB=1 pins one image/cell (A/B knob).
    import os as _os

    ab_cap = int(_os.environ.get("CHESS_VISION_ATTN_AB", "4"))
    ab = next((a for a in (4, 2, 1)
               if a <= ab_cap and B % a == 0 and a * N * D <= 2**20), 1)
    spec = lambda part: pl.BlockSpec(  # noqa: E731
        (ab, N, D),
        lambda b, part=part: (b, 0, part),
        memory_space=pltpu.VMEM,
    )
    if softmax_shift is not None:
        mode, fixed = "fixed", float(softmax_shift)
    else:
        mode, fixed = _softmax_shift_mode(), _FIXED_SHIFT
    # calibrated fixed-shift path: one (N, H*nm) f32 scratch holds every
    # head's score tile so the softmax exp runs as ONE wide VPU pass
    nm = (N // _LANES) * _LANES
    wide = (mode == "fixed" and _pow2(scale) and not (qk_int8 or pv_int8)
            and nm >= _LANES and 0 < N - nm <= 2
            and _os.environ.get("CHESS_VISION_ATTN_WIDE", "1") != "0")
    scratch_shapes = [pltpu.VMEM((N, D), jnp.float32)]
    if wide:
        scratch_shapes.append(pltpu.VMEM((N, num_heads * nm), jnp.float32))
    return pl.pallas_call(
        functools.partial(_attn_quant_kernel, num_heads=num_heads,
                          head_dim=head_dim, scale=scale, qk_int8=qk_int8,
                          pv_int8=pv_int8, shift_mode=mode,
                          fixed_shift=fixed),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, D), jnp.int8),
            jax.ShapeDtypeStruct((B, N, 1), jnp.float32),
        ),
        grid=(B // ab,),
        in_specs=[spec(0), spec(1), spec(2)],
        out_specs=(
            pl.BlockSpec((ab, N, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ab, N, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * num_heads * N * N * head_dim,
            bytes_accessed=qkv.size * qkv.dtype.itemsize,
            transcendentals=B * num_heads * N * N,
        ),
        interpret=interpret,
    )(qkv, qkv, qkv)


def _attn_bwd_kernel(q_ref, k_ref, v_ref, g_ref, dqkv_ref, *, num_heads,
                     head_dim, scale):
    """Fused attention backward, one image per grid cell (flash-style: the
    (N, N) score/probability tiles and their VJP never touch HBM).

    Recomputes the max-shifted softmax from the saved packed qkv, then per
    head: dV = P^T dO, dP = dO V^T, dS = P * (dP - rowsum(dP * P)), and
    dQ = scale * dS K / dK = scale * dS^T Q, written straight into the
    packed (B, N, 3*H*Dh) dqkv layout — the train profile showed the plain
    XLA VJP spending ~180 ms/step at B=256 on f32 (B, H, N, N) softmax-VJP
    fusions, reductions, and layout copies around exactly this math."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    g = g_ref[0]
    n = q.shape[0]
    D = num_heads * head_dim
    f32 = jnp.float32
    for i in range(num_heads):
        sl = slice(i * head_dim, (i + 1) * head_dim)
        qh, kh, vh, gh = q[:, sl], k[:, sl], v[:, sl], g[:, sl]
        s = jax.lax.dot_general(
            qh, kh, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        ) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)                                   # (n, n) f32
        pn = p / jnp.sum(p, axis=-1, keepdims=True)          # normalized
        pb = pn.astype(v.dtype)
        dv = jax.lax.dot_general(                            # P^T @ dO
            pb, gh, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        dp = jax.lax.dot_general(                            # dO @ V^T
            gh, vh, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        )
        r = jnp.sum(dp * pn, axis=-1, keepdims=True)
        ds = (pn * (dp - r) * scale).astype(q.dtype)         # scale folded
        dq = jax.lax.dot(ds, kh, preferred_element_type=f32)
        dk = jax.lax.dot_general(                            # dS^T @ Q
            ds, qh, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        dqkv_ref[0, :, i * head_dim:(i + 1) * head_dim] = dq.astype(
            dqkv_ref.dtype)
        dqkv_ref[0, :, D + i * head_dim:D + (i + 1) * head_dim] = dk.astype(
            dqkv_ref.dtype)
        dqkv_ref[0, :, 2 * D + i * head_dim:2 * D + (i + 1) * head_dim] = \
            dv.astype(dqkv_ref.dtype)


def _kernel_attention_bwd(qkv: jnp.ndarray, g: jnp.ndarray, num_heads: int,
                          interpret: bool = False) -> jnp.ndarray:
    """(B, N, 3D) saved qkv + (B, N, D) cotangent -> (B, N, 3D) dqkv."""
    B, N, C3 = qkv.shape
    D = C3 // 3
    head_dim = D // num_heads
    scale = 1.0 / math.sqrt(head_dim)
    spec = lambda part: pl.BlockSpec(  # noqa: E731
        (1, N, D),
        lambda b, part=part: (b, 0, part),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        functools.partial(_attn_bwd_kernel, num_heads=num_heads,
                          head_dim=head_dim, scale=scale),
        out_shape=jax.ShapeDtypeStruct((B, N, C3), qkv.dtype),
        grid=(B,),
        in_specs=[spec(0), spec(1), spec(2),
                  pl.BlockSpec((1, N, D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, N, C3), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 5 * B * num_heads * N * N * head_dim,
            bytes_accessed=2 * qkv.size * qkv.dtype.itemsize,
            transcendentals=B * num_heads * N * N,
        ),
        interpret=interpret,
    )(qkv, qkv, qkv, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _tpu_attention(qkv, num_heads):
    return _kernel_attention(qkv, num_heads)


def _tpu_attention_fwd(qkv, num_heads):
    return _kernel_attention(qkv, num_heads), (qkv,)


def _tpu_attention_bwd(num_heads, res, g):
    (qkv,) = res
    import os

    if os.environ.get("CHESS_VISION_NO_PALLAS_ATTN_BWD") == "1":
        _, vjp = jax.vjp(lambda t: _reference_attention(t, num_heads), qkv)
        return (vjp(g)[0],)
    return (_kernel_attention_bwd(qkv, g, num_heads),)


_tpu_attention.defvjp(_tpu_attention_fwd, _tpu_attention_bwd)


def fused_qkv_attention(qkv: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """(B, N, 3*H*Dh) packed qkv -> (B, N, H*Dh) attention output.

    Dispatches to the Pallas kernel on TPU (forward; XLA-recompute backward)
    and to the plain XLA math elsewhere (CPU test meshes).
    CHESS_VISION_NO_PALLAS_ATTN=1 forces the XLA math on TPU too — isolation
    knob for backend miscompiles (the scanned train program faulted the
    tunnelled v5e worker with the Pallas kernel in the scan body).
    """
    import os

    if jax.default_backend() != "tpu" or os.environ.get(
            "CHESS_VISION_NO_PALLAS_ATTN") == "1":
        return _reference_attention(qkv, num_heads)
    return _tpu_attention(qkv, num_heads)


def _attn_quant_kernel_flat(q_ref, k_ref, v_ref, oq_ref, os_ref, scratch,
                            *, num_heads, head_dim, scale, n_real, qk_int8,
                            pv_int8, shift_mode, fixed_shift=_FIXED_SHIFT):
    """One image per grid cell on the FLAT layout: refs are (NP, D) slabs of
    the (M, 3D) qkv stream. Key columns >= n_real (token padding) are masked
    out of the softmax; padded query rows produce garbage that stays
    row-local downstream (matmuls/LN/rowquant are row-local and padded rows
    are never attention keys)."""
    q = q_ref[...]
    k = k_ref[...]
    v = v_ref[...]
    NP = q.shape[0]
    legacy = qk_int8 or pv_int8
    fold = not legacy and _pow2(scale)
    if fold:
        q = q * jnp.asarray(scale, q.dtype)  # see _attn_quant_kernel
    if shift_mode == "bound" and fold:
        # padded key rows are garbage — mask them out of the key-norm max
        row_pad = jax.lax.broadcasted_iota(
            jnp.int32, (NP, num_heads), 0) >= n_real
        bound = _bound_shift(q, k, num_heads, head_dim,
                             kn2_mask_rows=row_pad)
    else:
        bound = None
    key_pad = jax.lax.broadcasted_iota(jnp.int32, (NP, NP), 1) >= n_real
    for i in range(num_heads):
        sl = slice(i * head_dim, (i + 1) * head_dim)
        if legacy:
            s = _head_scores(q, k, sl, scale, qk_int8)
            s = jnp.where(key_pad, -1e30, s)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            if pv_int8:
                p = p / jnp.sum(p, axis=-1, keepdims=True)
                scratch[:, sl] = _head_av(p, v, sl, True)
            else:
                v_ext = jnp.concatenate(
                    [v[:, sl], jnp.ones((NP, 1), v.dtype)], axis=1
                )
                o_ext = jax.lax.dot(
                    p.astype(v.dtype), v_ext,
                    preferred_element_type=jnp.float32,
                )
                scratch[:, sl] = o_ext[:, :head_dim] / jnp.maximum(
                    o_ext[:, head_dim:], 1e-30)
            continue
        if bound is not None:
            # exp(-1e30 - shift) == 0 exactly, so masked keys contribute
            # nothing to P@V or to the ones-column rowsum; padded QUERY
            # rows are garbage either way and stay row-local downstream.
            shift = bound[:, i:i + 1]
        elif shift_mode == "fixed" and fold:
            shift = fixed_shift
        else:
            shift = None
        s = _head_scores(q, k, sl, 1.0 if fold else scale, False)
        s = jnp.where(key_pad, -1e30, s)
        if shift is None:
            shift = jnp.max(s, axis=-1, keepdims=True)
        if _exp_bf16():
            p = jnp.exp((s - shift).astype(v.dtype))
        else:
            p = jnp.exp(s - shift).astype(v.dtype)
        v_ext = jnp.concatenate(
            [v[:, sl], jnp.ones((NP, 1), v.dtype)], axis=1
        )
        o_ext = jax.lax.dot(p, v_ext, preferred_element_type=jnp.float32)
        scratch[:, sl] = o_ext[:, :head_dim] / jnp.maximum(
            o_ext[:, head_dim:], 1e-30)
    o = scratch[...].astype(jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(o), axis=-1, keepdims=True), 1e-8)
    oq_ref[...] = jnp.clip(jnp.round(o * (127.0 / amax)), -127, 127
                           ).astype(jnp.int8)
    os_ref[...] = amax * (1.0 / 127.0)


def fused_qkv_attention_quant_flat(qkv, images: int, n_real: int,
                                   num_heads: int, interpret: bool = False,
                                   qk_int8: bool | None = None,
                                   pv_int8: bool | None = None,
                                   softmax_shift: float | None = None):
    """Flat-layout attention + int8 output quant for the serving path.

    qkv: (M, 3*H*Dh) packed qkv with M = images * NP (NP = padded tokens per
    image, a multiple of the 32-row int8 tile). Keys >= n_real are masked.
    Returns (int8 (M, H*Dh), f32 scales (M, 1)).
    """
    M, C3 = qkv.shape
    D = C3 // 3
    head_dim = D // num_heads
    NP = M // images
    assert NP * images == M, (M, images)
    env_qk, env_pv = _attn_int8_mode()
    if qk_int8 is None:
        qk_int8 = env_qk
    if pv_int8 is None:
        pv_int8 = env_pv
    scale = 1.0 / math.sqrt(head_dim)
    if softmax_shift is not None:
        mode, fixed = "fixed", float(softmax_shift)
    else:
        mode, fixed = _softmax_shift_mode(), _FIXED_SHIFT
    if jax.default_backend() != "tpu" and not interpret:
        # XLA fallback (CPU test meshes): identical math on the real rows;
        # padded rows differ (they are discarded downstream).
        o3 = _reference_attention(
            qkv.reshape(images, NP, C3)[:, :n_real], num_heads)
        o3 = jnp.pad(o3.astype(jnp.float32),
                     ((0, 0), (0, NP - n_real), (0, 0)))
        o = o3.reshape(M, D)
        amax = jnp.maximum(jnp.max(jnp.abs(o), axis=-1, keepdims=True), 1e-8)
        oq = jnp.clip(jnp.round(o * (127.0 / amax)), -127, 127
                      ).astype(jnp.int8)
        return oq, amax * (1.0 / 127.0)
    spec = lambda part: pl.BlockSpec(  # noqa: E731
        (NP, D),
        lambda b, part=part: (b, part),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        functools.partial(_attn_quant_kernel_flat, num_heads=num_heads,
                          head_dim=head_dim, scale=scale, n_real=n_real,
                          qk_int8=qk_int8, pv_int8=pv_int8, shift_mode=mode,
                          fixed_shift=fixed),
        out_shape=(
            jax.ShapeDtypeStruct((M, D), jnp.int8),
            jax.ShapeDtypeStruct((M, 1), jnp.float32),
        ),
        grid=(images,),
        in_specs=[spec(0), spec(1), spec(2)],
        out_specs=(
            pl.BlockSpec((NP, D), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NP, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((NP, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * images * num_heads * NP * NP * head_dim,
            bytes_accessed=qkv.size * qkv.dtype.itemsize,
            transcendentals=images * num_heads * NP * NP,
        ),
        interpret=interpret,
    )(qkv, qkv, qkv)
