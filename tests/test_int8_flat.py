"""Flat (M-blocked) int8 serving kernels vs the per-image blocked kernels.

The flat layout pads the token axis to the 32-row int8 tile and runs the
block stack on (M, D) streams (ops/int8_matmul.py *_flat, ops/attention.py
fused_qkv_attention_quant_flat). These tests pin, in interpret mode on CPU:

- flat matmul kernels == blocked kernels on the same rows (identical math,
  only the grid decomposition differs)
- the flat attention kernel masks padded keys exactly (real rows match the
  XLA reference on the unpadded input)
- the full flat block chain == the per-image block chain on real rows
"""

import numpy as np
import jax.numpy as jnp
import pytest

from chess_vision_tpu.ops.attention import (
    _reference_attention,
    fused_qkv_attention_quant_flat,
)
from chess_vision_tpu.ops.int8_matmul import (
    int8_matmul_gelu_quant,
    int8_matmul_gelu_quant_flat,
    int8_matmul_res,
    int8_matmul_res_flat,
    int8_matmul_res_ln_quant,
    int8_matmul_res_ln_quant_flat,
)
from chess_vision_tpu.ops.quant import _block_tpu, _block_tpu_flat


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _rand_q(rng, *shape):
    return jnp.asarray(rng.integers(-127, 128, shape), jnp.int8)


def _rand_s(rng, *shape):
    return jnp.asarray(rng.uniform(0.005, 0.02, shape), jnp.float32)


def test_flat_gelu_quant_matches_blocked(rng):
    B, N, K, O = 2, 32, 128, 256
    xq = _rand_q(rng, B, N, K)
    xs = _rand_s(rng, B, N, 1)
    wq = _rand_q(rng, K, O)
    ws = _rand_s(rng, O)
    bias = jnp.asarray(rng.normal(0, 0.1, O), jnp.float32)
    yq_b, ys_b = int8_matmul_gelu_quant(xq, xs, wq, ws, bias, interpret=True)
    yq_f, ys_f = int8_matmul_gelu_quant_flat(
        xq.reshape(B * N, K), xs.reshape(B * N, 1), wq, ws, bias,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(yq_b).reshape(B * N, O),
                                  np.asarray(yq_f))
    np.testing.assert_allclose(np.asarray(ys_b).reshape(B * N, 1),
                               np.asarray(ys_f), rtol=1e-6)


def test_flat_res_ln_quant_matches_blocked(rng):
    B, N, K, O = 2, 32, 128, 256
    xq = _rand_q(rng, B, N, K)
    xs = _rand_s(rng, B, N, 1)
    wq = _rand_q(rng, K, O)
    ws = _rand_s(rng, O)
    bias = jnp.asarray(rng.normal(0, 0.1, O), jnp.float32)
    res = jnp.asarray(rng.normal(0, 1, (B, N, O)), jnp.bfloat16)
    g = jnp.asarray(rng.normal(1, 0.1, O), jnp.float32)
    b2 = jnp.asarray(rng.normal(0, 0.1, O), jnp.float32)
    x_b, yq_b, ys_b = int8_matmul_res_ln_quant(
        xq, xs, wq, ws, bias, res, g, b2, interpret=True)
    x_f, yq_f, ys_f = int8_matmul_res_ln_quant_flat(
        xq.reshape(B * N, K), xs.reshape(B * N, 1), wq, ws, bias,
        res.reshape(B * N, O), g, b2, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(x_b, np.float32).reshape(B * N, O),
        np.asarray(x_f, np.float32))
    np.testing.assert_array_equal(np.asarray(yq_b).reshape(B * N, O),
                                  np.asarray(yq_f))
    np.testing.assert_allclose(np.asarray(ys_b).reshape(B * N, 1),
                               np.asarray(ys_f), rtol=1e-6)


def test_flat_res_matches_blocked(rng):
    B, N, K, O = 2, 32, 128, 256
    xq = _rand_q(rng, B, N, K)
    xs = _rand_s(rng, B, N, 1)
    wq = _rand_q(rng, K, O)
    ws = _rand_s(rng, O)
    bias = jnp.asarray(rng.normal(0, 0.1, O), jnp.float32)
    res = jnp.asarray(rng.normal(0, 1, (B, N, O)), jnp.bfloat16)
    x_b = int8_matmul_res(xq, xs, wq, ws, bias, res, interpret=True)
    x_f = int8_matmul_res_flat(
        xq.reshape(B * N, K), xs.reshape(B * N, 1), wq, ws, bias,
        res.reshape(B * N, O), interpret=True)
    np.testing.assert_array_equal(
        np.asarray(x_b, np.float32).reshape(B * N, O),
        np.asarray(x_f, np.float32))


def test_flat_attention_masks_padded_keys(rng):
    B, NP, n_real, H, Dh = 2, 32, 27, 2, 64
    D = H * Dh
    qkv3 = rng.normal(0, 1, (B, NP, 3 * D)).astype(np.float32)
    qkv = jnp.asarray(qkv3.reshape(B * NP, 3 * D), jnp.bfloat16)
    oq, os_ = fused_qkv_attention_quant_flat(qkv, B, n_real, H,
                                             interpret=True)
    # reference on the unpadded input
    ref = _reference_attention(
        jnp.asarray(qkv3, jnp.bfloat16)[:, :n_real], H)
    ref = np.asarray(ref, np.float32)
    out = (np.asarray(oq, np.float32) * np.asarray(os_)).reshape(B, NP, D)
    np.testing.assert_allclose(out[:, :n_real], ref, atol=0.06)


def test_flat_block_chain_matches_blocked_chain(rng):
    """Full block stack: flat layout == per-image layout on real rows."""
    B, n_real, D, H = 2, 27, 128, 2
    NP = 32
    hidden = 256

    def blk():
        wq_qkv = _rand_q(rng, D, 3 * D)
        return {
            "norm1": {"scale": jnp.ones(D), "bias": jnp.zeros(D)},
            "norm2": {"scale": jnp.asarray(rng.normal(1, 0.05, D), jnp.float32),
                      "bias": jnp.asarray(rng.normal(0, 0.05, D), jnp.float32)},
            "qkv": {"wq": wq_qkv, "scale": _rand_s(rng, 3 * D),
                    "bias": jnp.asarray(rng.normal(0, 0.02, 3 * D), jnp.float32)},
            "proj": {"wq": _rand_q(rng, D, D), "scale": _rand_s(rng, D),
                     "bias": jnp.asarray(rng.normal(0, 0.02, D), jnp.float32)},
            "fc1": {"wq": _rand_q(rng, D, hidden), "scale": _rand_s(rng, hidden),
                    "bias": jnp.asarray(rng.normal(0, 0.02, hidden), jnp.float32)},
            "fc2": {"wq": _rand_q(rng, hidden, D), "scale": _rand_s(rng, D),
                    "bias": jnp.asarray(rng.normal(0, 0.02, D), jnp.float32)},
        }

    q0, q1 = blk(), blk()
    x3 = jnp.asarray(rng.normal(0, 1, (B, n_real, D)), jnp.bfloat16)
    from chess_vision_tpu.ops.quant import fused_rowquant

    # per-image chain
    xq, xs = fused_rowquant(x3, "ln", q0["norm1"]["scale"],
                            q0["norm1"]["bias"], interpret=True)
    xb, xqb, xsb = _block_tpu(x3, xq, xs, q0, q1["norm1"], num_heads=H,
                              interpret=True)
    xb, _, _ = _block_tpu(xb, xqb, xsb, q1, None, num_heads=H,
                          interpret=True)

    # flat chain on the padded stream
    xpad = jnp.pad(x3, ((0, 0), (0, NP - n_real), (0, 0))).reshape(B * NP, D)
    fq, fs = fused_rowquant(xpad, "ln", q0["norm1"]["scale"],
                            q0["norm1"]["bias"], interpret=True)
    xf, fq, fs = _block_tpu_flat(xpad, fq, fs, q0, q1["norm1"], images=B,
                                 n_real=n_real, num_heads=H, interpret=True)
    xf, _, _ = _block_tpu_flat(xf, fq, fs, q1, None, images=B,
                               n_real=n_real, num_heads=H, interpret=True)
    xf3 = np.asarray(xf, np.float32).reshape(B, NP, D)[:, :n_real]
    np.testing.assert_array_equal(np.asarray(xb, np.float32), xf3)
