"""Int8 quantized-inference numerics vs the fp32 model."""

import jax
import jax.numpy as jnp
import numpy as np

from chess_vision_tpu.models import build_model
from chess_vision_tpu.ops.quant import (
    chessvit_int8_apply,
    quant_dense,
    quantize_chessvit,
    _quant_weight,
)


def test_quant_dense_close_to_f32(rng):
    x = rng.normal(size=(8, 64)).astype(np.float32)
    w = rng.normal(size=(64, 32)).astype(np.float32)
    b = rng.normal(size=(32,)).astype(np.float32)
    wq, ws = _quant_weight(w)
    ref = x @ w + b
    out = np.asarray(quant_dense(jnp.asarray(x), jnp.asarray(wq),
                                 jnp.asarray(ws), jnp.asarray(b)))
    rel = np.abs(out - ref).max() / np.abs(ref).max()
    assert rel < 0.02, rel


def test_quant_weight_roundtrip_properties(rng):
    w = rng.normal(size=(16, 8)).astype(np.float32)
    wq, ws = _quant_weight(w)
    assert wq.dtype == np.int8
    assert np.abs(wq).max() <= 127
    deq = wq.astype(np.float32) * ws
    assert np.abs(deq - w).max() <= ws.max()  # within one quant step


def test_int8_vit_matches_f32_model():
    rng = np.random.default_rng(1234)  # own rng: session fixture state is
    # test-order dependent and this test is sensitive to the exact draw
    cfg = {
        "model": {"arch": "vit", "input_size": 128, "head_dropout": 0.0,
                  "drop_path_rate": 0.0},
        "training": {"mixed_precision": False},
    }
    model = build_model(cfg)
    x = jnp.asarray(rng.normal(size=(2, 128, 128, 3)).astype(np.float32))
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        x, train=False,
    )
    ref = model.apply(variables, x, train=False)
    pack = quantize_chessvit(variables["params"])
    out = chessvit_int8_apply(pack, x)

    # squares: 1664 logits — cosine is meaningful
    a = np.asarray(ref["squares"]).reshape(-1)
    b = np.asarray(out["squares"]).reshape(-1)
    cos = float((a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert cos > 0.995, cos
    # turn/castling: 2-8 near-zero values — bound the absolute error instead
    for key in ("turn", "castling"):
        a = np.asarray(ref[key])
        b = np.asarray(out[key])
        scale = max(np.abs(a).max(), 0.1)
        assert np.abs(a - b).max() / scale < 0.15, (key, a, b)
    agree = (
        np.asarray(ref["squares"]).reshape(-1, 13).argmax(-1)
        == np.asarray(out["squares"]).reshape(-1, 13).argmax(-1)
    ).mean()
    # random-init logits are nearly tied; trained margins agree far better
    assert agree > 0.95, agree


# ---------------------------------------------------------------------------
# Fused int8 matmul+epilogue kernels (interpret mode) vs the plain-XLA path
# ---------------------------------------------------------------------------

def _dequant(yq, ys):
    return np.asarray(yq, np.float32) * np.asarray(ys, np.float32)


def test_int8_matmul_gelu_quant_matches_composition():
    from chess_vision_tpu.ops.int8_matmul import int8_matmul_gelu_quant
    from chess_vision_tpu.ops.quant import fused_rowquant, quant_dense_q

    rng = np.random.default_rng(7)
    B, N, K, O = 2, 16, 64, 128
    x = rng.normal(size=(B, N, K)).astype(np.float32)
    w = rng.normal(size=(K, O)).astype(np.float32) / np.sqrt(K)
    wq, ws = _quant_weight(w)
    bias = rng.normal(size=(O,)).astype(np.float32) * 0.1

    xq, xs = fused_rowquant(jnp.asarray(x), "none", interpret=True)
    yq, ys = int8_matmul_gelu_quant(xq, xs, jnp.asarray(wq), jnp.asarray(ws),
                                    jnp.asarray(bias), interpret=True)
    # composition: XLA int8 matmul -> bf16 -> gelu-rowquant pass
    h = quant_dense_q(xq, xs, jnp.asarray(wq), jnp.asarray(ws),
                      jnp.asarray(bias))
    gq, gs = fused_rowquant(h, "gelu", interpret=True)
    a, b = _dequant(yq, ys), _dequant(gq, gs)
    # fused path skips the intermediate bf16 rounding -> tolerance, not bits
    tol = 2 * np.abs(b).max(axis=-1, keepdims=True) / 127 + 2e-2
    assert np.abs(a - b).max() < 0.1, np.abs(a - b).max()
    assert (np.abs(a - b) <= tol).mean() > 0.99


def test_int8_matmul_gelu_quant_sigmoid_approx():
    """approx_gelu=True (CHESS_VISION_GELU=sigmoid serving mode) computes
    x*sigmoid(1.702x): pin it against the XLA composition and bound its
    deviation from the erf path well inside the int8 row-quant step."""
    from chess_vision_tpu.ops.int8_matmul import (
        int8_matmul_gelu_quant,
        int8_matmul_gelu_quant_flat,
    )
    from chess_vision_tpu.ops.quant import fused_rowquant, quant_dense_q

    rng = np.random.default_rng(9)
    B, N, K, O = 2, 16, 64, 128
    x = rng.normal(size=(B, N, K)).astype(np.float32)
    w = rng.normal(size=(K, O)).astype(np.float32) / np.sqrt(K)
    wq, ws = _quant_weight(w)
    bias = rng.normal(size=(O,)).astype(np.float32) * 0.1

    xq, xs = fused_rowquant(jnp.asarray(x), "none", interpret=True)
    yq, ys = int8_matmul_gelu_quant(
        xq, xs, jnp.asarray(wq), jnp.asarray(ws), jnp.asarray(bias),
        interpret=True, approx_gelu=True)
    fq, fs = int8_matmul_gelu_quant_flat(
        xq.reshape(B * N, K), xs.reshape(B * N, 1), jnp.asarray(wq),
        jnp.asarray(ws), jnp.asarray(bias), interpret=True, approx_gelu=True)
    np.testing.assert_array_equal(np.asarray(yq).reshape(B * N, O),
                                  np.asarray(fq))

    h = np.asarray(quant_dense_q(xq, xs, jnp.asarray(wq), jnp.asarray(ws),
                                 jnp.asarray(bias)), np.float32)
    ref = h / (1.0 + np.exp(-1.702 * h))
    a = _dequant(yq, ys)
    step = np.abs(ref).max(axis=-1, keepdims=True) / 127
    assert np.abs(a - ref).max() < 0.1
    assert (np.abs(a - ref) <= 2 * step + 2e-2).mean() > 0.99
    # sigmoid-vs-erf gap stays below ~0.021 everywhere (max of the
    # difference function), i.e. within ~2.6 int8 steps at |h|~1
    eq, _ = int8_matmul_gelu_quant(
        xq, xs, jnp.asarray(wq), jnp.asarray(ws), jnp.asarray(bias),
        interpret=True)
    erf_out = _dequant(eq, _)
    assert np.abs(a - erf_out).max() < 0.06


def test_int8_matmul_res_ln_quant_matches_composition():
    from chess_vision_tpu.ops.int8_matmul import int8_matmul_res_ln_quant
    from chess_vision_tpu.ops.quant import (
        _layernorm, fused_rowquant, quant_dense_q)

    rng = np.random.default_rng(8)
    B, N, K, O = 2, 16, 128, 64
    x = rng.normal(size=(B, N, K)).astype(np.float32)
    res = rng.normal(size=(B, N, O)).astype(np.float32)
    w = rng.normal(size=(K, O)).astype(np.float32) / np.sqrt(K)
    wq, ws = _quant_weight(w)
    bias = rng.normal(size=(O,)).astype(np.float32) * 0.1
    g = rng.normal(size=(O,)).astype(np.float32)
    b2 = rng.normal(size=(O,)).astype(np.float32) * 0.1

    xq, xs = fused_rowquant(jnp.asarray(x), "none", interpret=True)
    res_b = jnp.asarray(res).astype(jnp.bfloat16)
    xn, yq, ys = int8_matmul_res_ln_quant(
        xq, xs, jnp.asarray(wq), jnp.asarray(ws), jnp.asarray(bias),
        res_b, jnp.asarray(g), jnp.asarray(b2), interpret=True)

    xn_ref = res_b + quant_dense_q(xq, xs, jnp.asarray(wq), jnp.asarray(ws),
                                   jnp.asarray(bias))
    gq, gs = fused_rowquant(xn_ref.astype(jnp.bfloat16), "ln", g, b2,
                            interpret=True)
    assert np.allclose(np.asarray(xn, np.float32),
                       np.asarray(xn_ref, np.float32), atol=0.15)
    a, b = _dequant(yq, ys), _dequant(gq, gs)
    assert np.abs(a - b).max() < 0.2, np.abs(a - b).max()


def test_int8_matmul_res_matches_composition():
    from chess_vision_tpu.ops.int8_matmul import int8_matmul_res
    from chess_vision_tpu.ops.quant import fused_rowquant, quant_dense_q

    rng = np.random.default_rng(9)
    B, N, K, O = 1, 8, 64, 64
    x = rng.normal(size=(B, N, K)).astype(np.float32)
    res = rng.normal(size=(B, N, O)).astype(np.float32)
    w = rng.normal(size=(K, O)).astype(np.float32) / np.sqrt(K)
    wq, ws = _quant_weight(w)
    bias = np.zeros((O,), np.float32)

    xq, xs = fused_rowquant(jnp.asarray(x), "none", interpret=True)
    res_b = jnp.asarray(res).astype(jnp.bfloat16)
    xn = int8_matmul_res(xq, xs, jnp.asarray(wq), jnp.asarray(ws),
                         jnp.asarray(bias), res_b, interpret=True)
    xn_ref = res_b + quant_dense_q(xq, xs, jnp.asarray(wq), jnp.asarray(ws),
                                   jnp.asarray(bias))
    assert np.allclose(np.asarray(xn, np.float32),
                       np.asarray(xn_ref, np.float32), atol=0.1)


def test_attention_quant_fusion_matches_separate():
    from chess_vision_tpu.ops.attention import (
        _reference_attention, fused_qkv_attention_quant)

    rng = np.random.default_rng(10)
    B, N, H, Dh = 2, 16, 2, 64
    qkv = jnp.asarray(rng.normal(size=(B, N, 3 * H * Dh)).astype(np.float32))
    oq, os_ = fused_qkv_attention_quant(qkv, H, interpret=True)
    ref = np.asarray(_reference_attention(qkv, H), np.float32)
    deq = _dequant(oq, os_)
    step = np.abs(ref).max(axis=-1, keepdims=True) / 127
    assert (np.abs(deq - ref) <= step + 1e-5).all()


def test_block_tpu_chain_matches_plain_block():
    """The fused serving chain (interpret mode) reproduces _block's math."""
    from chess_vision_tpu.ops.quant import (
        _block, _block_tpu, fused_rowquant)

    rng = np.random.default_rng(11)
    B, N, D, H = 1, 16, 128, 2
    x = jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32) * 0.5
                    ).astype(jnp.bfloat16)

    def mkdense(k, o):
        w = rng.normal(size=(k, o)).astype(np.float32) / np.sqrt(k)
        wq, ws = _quant_weight(w)
        return {"wq": jnp.asarray(wq), "scale": jnp.asarray(ws),
                "bias": jnp.asarray(rng.normal(size=(o,)).astype(np.float32)
                                    * 0.05)}

    def mknorm():
        return {"scale": jnp.asarray(1 + 0.1 * rng.normal(size=(D,))
                                     .astype(np.float32)),
                "bias": jnp.asarray(0.1 * rng.normal(size=(D,))
                                    .astype(np.float32))}

    q = {"norm1": mknorm(), "norm2": mknorm(),
         "qkv": mkdense(D, 3 * D), "proj": mkdense(D, D),
         "fc1": mkdense(D, 4 * D), "fc2": mkdense(4 * D, D)}

    ref = np.asarray(_block(x, q, num_heads=H), np.float32)
    xq, xs = fused_rowquant(x, "ln", q["norm1"]["scale"], q["norm1"]["bias"],
                            interpret=True)
    out, xq2, xs2 = _block_tpu(x, xq, xs, q, next_ln=None, num_heads=H,
                               interpret=True)
    assert xq2 is None and xs2 is None
    out = np.asarray(out, np.float32)
    assert np.abs(out - ref).max() < 0.25, np.abs(out - ref).max()
    rel = np.abs(out - ref).max() / max(np.abs(ref).max(), 1e-6)
    assert rel < 0.05, rel


def _tiny_block_params(rng, D, seed_scale=0.05):
    def mkdense(k, o):
        w = rng.normal(size=(k, o)).astype(np.float32) / np.sqrt(k)
        wq, ws = _quant_weight(w)
        return {"wq": jnp.asarray(wq), "scale": jnp.asarray(ws),
                "bias": jnp.asarray(rng.normal(size=(o,)).astype(np.float32)
                                    * seed_scale)}

    def mknorm():
        return {"scale": jnp.asarray(1 + 0.1 * rng.normal(size=(D,))
                                     .astype(np.float32)),
                "bias": jnp.asarray(0.1 * rng.normal(size=(D,))
                                    .astype(np.float32))}

    return {"norm1": mknorm(), "norm2": mknorm(),
            "qkv": mkdense(D, 3 * D), "proj": mkdense(D, D),
            "fc1": mkdense(D, 4 * D), "fc2": mkdense(4 * D, D)}


def test_block_hybrid_matches_plain_block():
    """The hybrid serving layout (XLA int8 matmuls + fused_rowquant quant
    chain) reproduces _block's math within int8 rounding tolerance."""
    from chess_vision_tpu.ops.quant import _block, _block_hybrid

    rng = np.random.default_rng(12)
    B, N, D, H = 1, 16, 128, 2
    x = jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32) * 0.5
                    ).astype(jnp.bfloat16)
    q = _tiny_block_params(rng, D)

    ref = np.asarray(_block(x, q, num_heads=H), np.float32)
    out = np.asarray(_block_hybrid(x, q, num_heads=H, interpret=True),
                     np.float32)
    assert np.abs(out - ref).max() < 0.25, np.abs(out - ref).max()
    rel = np.abs(out - ref).max() / max(np.abs(ref).max(), 1e-6)
    assert rel < 0.05, rel


def test_hybrid_stack_matches_unrolled():
    """The scanned hybrid stack is bitwise-identical to the per-block loop
    (same kernels, same order — scan only stacks the weights)."""
    from chess_vision_tpu.ops.quant import _block_hybrid, _hybrid_stack

    rng = np.random.default_rng(13)
    B, N, D, H = 2, 16, 128, 2
    x = jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32) * 0.5
                    ).astype(jnp.bfloat16)
    blocks = [_tiny_block_params(rng, D) for _ in range(3)]

    ref = x
    for q in blocks:
        ref = _block_hybrid(ref, q, num_heads=H, interpret=True)
    out = _hybrid_stack(x, blocks, num_heads=H, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref, np.float32),
                                  np.asarray(out, np.float32))


def test_calibrated_softmax_shifts(rng):
    """calibrate_attn_shifts measures per-layer logit ranges on the int8
    block math and returns shifts usable by the serving kernels; the
    calibrated fixed-shift forward must match the uncalibrated (bound-mode)
    forward exactly at argmax level (the ones-column rowsum renormalizes any
    shift — only f32 exp rounding differs)."""
    import jax

    from chess_vision_tpu.models import build_model, init_variables
    from chess_vision_tpu.ops.quant import (
        calibrate_attn_shifts,
        chessvit_int8_apply,
        quantize_chessvit,
    )

    cfg = {"model": {"arch": "vit", "input_size": 128, "head_dropout": 0.0,
                     "drop_path_rate": 0.0},
           "training": {"mixed_precision": False}}
    model = build_model(cfg)
    params = init_variables(model, 128, seed=0)["params"]
    x = jnp.asarray(rng.normal(size=(2, 128, 128, 3)).astype(np.float32))

    pack = quantize_chessvit(params, calib=x)
    shifts = pack.pop("attn_shifts")
    assert len(shifts) == 12
    # random-init logits are small and tight: every layer calibratable
    assert all(isinstance(s, float) for s in shifts)

    base = chessvit_int8_apply(pack, x)
    calibrated = chessvit_int8_apply(pack, x, attn_shifts=shifts)
    for key in ("squares", "turn", "castling"):
        np.testing.assert_allclose(
            np.asarray(calibrated[key], np.float32),
            np.asarray(base[key], np.float32), atol=1e-4)
