"""Fused attention + rowquant kernel parity (interpret mode on CPU).

The Pallas kernels (ops/attention.py, ops/quant.fused_rowquant) replace the
XLA lowering that materialized the full f32 score tensor in HBM (measured
9.3GB/block at batch 2048). These tests pin the kernels' numerics to the
plain-XLA reference math they replace.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from chess_vision_tpu.ops.attention import (
    _kernel_attention,
    _kernel_attention_bwd,
    _reference_attention,
    fused_qkv_attention,
)
from chess_vision_tpu.ops.quant import _layernorm, fused_rowquant, quant_dense_q


@pytest.mark.parametrize("B,N,H,Dh", [(2, 257, 12, 64), (3, 17, 1, 32),
                                      (1, 64, 4, 16)])
def test_attention_kernel_matches_reference(rng, B, N, H, Dh):
    qkv = jnp.asarray(
        rng.normal(size=(B, N, 3 * H * Dh)).astype(np.float32), jnp.bfloat16
    )
    ref = np.asarray(_reference_attention(qkv, H), np.float32)
    ker = np.asarray(_kernel_attention(qkv, H, interpret=True), np.float32)
    np.testing.assert_allclose(ker, ref, atol=2e-2)


@pytest.mark.parametrize("B,N,H,Dh", [(2, 257, 12, 64), (3, 17, 1, 32),
                                      (1, 64, 4, 16)])
def test_attention_bwd_kernel_matches_xla_vjp(rng, B, N, H, Dh):
    """The fused backward (flash-style, scores in VMEM, packed dqkv) must
    match jax.vjp over the reference math it replaces."""
    import jax

    qkv = jnp.asarray(rng.normal(size=(B, N, 3 * H * Dh)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(B, N, H * Dh)), jnp.float32)
    _, vjp = jax.vjp(lambda t: _reference_attention(t, H), qkv)
    ref = np.asarray(vjp(g)[0], np.float32)
    ker = np.asarray(_kernel_attention_bwd(qkv, g, H, interpret=True),
                     np.float32)
    np.testing.assert_allclose(ker, ref, rtol=1e-4, atol=1e-4)


def test_attention_bwd_kernel_bf16_close(rng):
    """bf16 inputs (the training dtype): kernel vs f32-upcast analytic VJP."""
    import jax

    B, N, H, Dh = (2, 257, 12, 64)
    qkv = jnp.asarray(
        rng.normal(size=(B, N, 3 * H * Dh)).astype(np.float32), jnp.bfloat16
    )
    g = jnp.asarray(
        rng.normal(size=(B, N, H * Dh)).astype(np.float32), jnp.bfloat16
    )
    _, vjp = jax.vjp(
        lambda t: _reference_attention(t.astype(jnp.float32), H),
        qkv.astype(jnp.float32))
    ref = np.asarray(vjp(g.astype(jnp.float32))[0], np.float32)
    ker = np.asarray(_kernel_attention_bwd(qkv, g, H, interpret=True),
                     np.float32)
    np.testing.assert_allclose(ker, ref, atol=5e-2)


def test_fused_qkv_attention_dispatches_to_reference_on_cpu(rng):
    qkv = jnp.asarray(rng.normal(size=(2, 17, 96)).astype(np.float32))
    out = fused_qkv_attention(qkv, 2)
    ref = _reference_attention(qkv, 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_attn_quant_int8_qk_close_to_bf16(rng):
    """CHESS_VISION_ATTN_QK=int8 runs the QK^T contraction in int8 with
    per-(row, head) dynamic scales. Dequantized outputs must stay within a
    few output-quant steps of the bf16-score kernel, for both layouts."""
    from chess_vision_tpu.ops.attention import (
        fused_qkv_attention_quant,
        fused_qkv_attention_quant_flat,
    )

    B, N, H, Dh = 2, 33, 4, 64
    qkv = jnp.asarray(
        rng.normal(size=(B, N, 3 * H * Dh)).astype(np.float32), jnp.bfloat16
    )
    oq_b, os_b = fused_qkv_attention_quant(qkv, H, interpret=True,
                                           qk_int8=False)
    oq_i, os_i = fused_qkv_attention_quant(qkv, H, interpret=True,
                                           qk_int8=True)
    a = np.asarray(oq_b, np.float32) * np.asarray(os_b)
    b = np.asarray(oq_i, np.float32) * np.asarray(os_i)
    # int8 scores perturb softmax weights by <~1%; outputs are O(1)
    np.testing.assert_allclose(a, b, atol=0.08)

    NP = 48
    qpad = jnp.pad(qkv, ((0, 0), (0, NP - N), (0, 0)))
    fq, fs = fused_qkv_attention_quant_flat(
        qpad.reshape(B * NP, 3 * H * Dh), B, N, H, interpret=True,
        qk_int8=True)
    f = (np.asarray(fq, np.float32) * np.asarray(fs)).reshape(B, NP, -1)
    np.testing.assert_allclose(f[:, :N], b, atol=0.08)

    # int8pv (P@V leg also int8: P per-row, V per-column scales)
    oq_p, os_p = fused_qkv_attention_quant(qkv, H, interpret=True,
                                           qk_int8=True, pv_int8=True)
    c = np.asarray(oq_p, np.float32) * np.asarray(os_p)
    np.testing.assert_allclose(a, c, atol=0.15)
    fqp, fsp = fused_qkv_attention_quant_flat(
        qpad.reshape(B * NP, 3 * H * Dh), B, N, H, interpret=True,
        qk_int8=True, pv_int8=True)
    fp = (np.asarray(fqp, np.float32) * np.asarray(fsp)).reshape(B, NP, -1)
    np.testing.assert_allclose(fp[:, :N], c, atol=0.08)


def test_rowquant_ln_matches_xla(rng):
    x = jnp.asarray(rng.normal(size=(2, 257, 768)).astype(np.float32),
                    jnp.bfloat16)
    g = rng.normal(size=768).astype(np.float32)
    b = rng.normal(size=768).astype(np.float32)
    xq, s = fused_rowquant(x, "ln", g, b, interpret=True)
    assert xq.dtype == jnp.int8 and s.shape == (2, 257, 1)
    ref = np.asarray(_layernorm(x, {"scale": g, "bias": b}))
    ref_s = np.maximum(np.abs(ref).max(-1, keepdims=True), 1e-8) / 127.0
    ref_q = np.clip(np.round(ref / ref_s), -127, 127)
    np.testing.assert_allclose(np.asarray(s), ref_s, rtol=1e-5)
    # rounding ties at the .5 boundary may flip one level
    assert (np.abs(np.asarray(xq, np.int32) - ref_q) <= 1).all()
    assert (np.asarray(xq, np.int32) != ref_q).mean() < 1e-3


def test_rowquant_gelu_matches_exact_erf(rng):
    from scipy import special

    x = jnp.asarray(rng.normal(size=(1, 64, 256)).astype(np.float32),
                    jnp.bfloat16)
    xq, s = fused_rowquant(x, "gelu", interpret=True)
    xf = np.asarray(x, np.float32)
    ref = 0.5 * xf * (1 + special.erf(xf / np.sqrt(2)))
    ref_s = np.maximum(np.abs(ref).max(-1, keepdims=True), 1e-8) / 127.0
    ref_q = np.clip(np.round(ref / ref_s), -127, 127)
    # A&S-erf polynomial: max abs err 1.5e-7 -> at most one quant level off
    assert (np.abs(np.asarray(xq, np.int32) - ref_q) <= 1).all()
    np.testing.assert_allclose(np.asarray(s), ref_s, rtol=1e-4)


def test_rowquant_feeds_quant_dense(rng):
    x = jnp.asarray(rng.normal(size=(2, 64, 128)).astype(np.float32),
                    jnp.bfloat16)
    xq, s = fused_rowquant(x, "none", interpret=True)
    wq = jnp.asarray(rng.integers(-127, 128, (128, 32)), jnp.int8)
    ws = jnp.asarray((rng.random(32) + 0.5) / 100, jnp.float32)
    bias = jnp.asarray(rng.normal(size=32), jnp.float32)
    out = quant_dense_q(xq, s, wq, ws, bias, out_dtype=jnp.float32)
    ref = (np.asarray(xq, np.float32) @ np.asarray(wq, np.float32)
           ) * np.asarray(s) * np.asarray(ws) + np.asarray(bias)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_fixed_shift_softmax_matches_max_shift(rng, monkeypatch):
    """The serving quant kernels' fixed-shift softmax (default) must match
    the max-shifted form to float rounding: the ones-column rowsum
    renormalizes any shift exactly, so the only difference is f32 exp
    rounding. Exercised at score magnitudes near the trained-checkpoint
    range (|s| <= ~16) in both layouts."""
    from chess_vision_tpu.ops.attention import (
        fused_qkv_attention_quant,
        fused_qkv_attention_quant_flat,
    )

    B, N, H, Dh = 2, 33, 4, 64
    # scale up q so per-head logits reach O(10) like a trained checkpoint
    qkv = rng.normal(size=(B, N, 3 * H * Dh)).astype(np.float32)
    qkv[:, :, : H * Dh] *= 4.0
    qkv = jnp.asarray(qkv, jnp.bfloat16)

    outs = {}
    for mode in ("bound", "fixed", "max"):
        monkeypatch.setenv("CHESS_VISION_ATTN_SOFTMAX", mode)
        oq, os_ = fused_qkv_attention_quant(qkv, H, interpret=True)
        outs[mode] = np.asarray(oq, np.float32) * np.asarray(os_)
        NP = 48
        qpad = jnp.pad(qkv, ((0, 0), (0, NP - N), (0, 0)))
        fq, fs = fused_qkv_attention_quant_flat(
            qpad.reshape(B * NP, 3 * H * Dh), B, N, H, interpret=True)
        f = (np.asarray(fq, np.float32) * np.asarray(fs)).reshape(B, NP, -1)
        np.testing.assert_allclose(f[:, :N], outs[mode], atol=0.02)
    # a couple of int8 output-quant steps of an O(1) activation
    np.testing.assert_allclose(outs["fixed"], outs["max"], atol=0.04)
    np.testing.assert_allclose(outs["bound"], outs["max"], atol=0.04)
