"""Whole-block fused serving kernel (interpret mode) vs the split kernels.

The fused kernel (ops/fused_block.py) must reproduce quant._block_tpu's
math operation-for-operation — both were written against the same reference
block (reference models/vit.py:28-49) and the same quantization scheme, so
any drift here is a kernel bug, not a tolerance question.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from chess_vision_tpu.ops.fused_block import fused_vit_block
from chess_vision_tpu.ops.quant import (
    _block_tpu,
    _quant_weight,
    fused_rowquant,
)

# split-path attention requires nm = 128-multiple + <=2 extra keys; 129 is
# the smallest token count exercising both the main tile and the extra key
B, N, D, H = 2, 129, 128, 2


def _mkblock(rng):
    def mkdense(k, o):
        w = rng.normal(size=(k, o)).astype(np.float32) / np.sqrt(k)
        wq, ws = _quant_weight(w)
        return {"wq": jnp.asarray(wq), "scale": jnp.asarray(ws),
                "bias": jnp.asarray(
                    rng.normal(size=(o,)).astype(np.float32) * 0.05)}

    def mknorm():
        return {"scale": jnp.asarray(
                    1 + 0.1 * rng.normal(size=(D,)).astype(np.float32)),
                "bias": jnp.asarray(
                    0.1 * rng.normal(size=(D,)).astype(np.float32))}

    return {"norm1": mknorm(), "norm2": mknorm(),
            "qkv": mkdense(D, 3 * D), "proj": mkdense(D, D),
            "fc1": mkdense(D, 4 * D), "fc2": mkdense(4 * D, D)}


@pytest.mark.parametrize("shift", [None, 3.0], ids=["bound", "calibrated"])
def test_fused_block_matches_split_kernels(shift, monkeypatch):
    rng = np.random.default_rng(21)
    q = _mkblock(rng)
    next_ln = {"scale": jnp.asarray(
                   1 + 0.1 * rng.normal(size=(D,)).astype(np.float32)),
               "bias": jnp.asarray(
                   0.1 * rng.normal(size=(D,)).astype(np.float32))}
    x = jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32) * 0.5
                    ).astype(jnp.bfloat16)
    xq, xs = fused_rowquant(x, "ln", q["norm1"]["scale"], q["norm1"]["bias"],
                            interpret=True)

    ref_x, ref_q, ref_s = _block_tpu(x, xq, xs, q, next_ln=next_ln,
                                     num_heads=H, interpret=True,
                                     softmax_shift=shift)
    out_x, out_q, out_s = fused_vit_block(xq, xs, x, q, next_ln,
                                          num_heads=H, softmax_shift=shift,
                                          interpret=True)

    # The fused kernel computes the qkv epilogue in-kernel while the split
    # path runs it as an XLA op: an input element landing exactly on a bf16
    # rounding boundary can flip by 1 ulp between the two contexts, move an
    # int8 code by one, and perturb that row's LN/GELU downstream (~0.03 at
    # these magnitudes). That noise touches a few ROWS; a real math bug
    # (e.g. the wrong GELU variant) perturbs nearly every element — so the
    # assertions are distributional: tiny affected fraction + bounded max.
    dx = np.abs(np.asarray(out_x, np.float32) - np.asarray(ref_x, np.float32))
    assert dx.max() < 0.1, dx.max()
    assert (dx > 1e-3).mean() < 0.05, (dx > 1e-3).mean()
    ds = np.abs(np.asarray(out_s) - np.asarray(ref_s))
    assert (ds > 1e-6).mean() < 0.05
    dq = np.abs(np.asarray(out_q, np.int32) - np.asarray(ref_q, np.int32))
    assert dq.max() <= 2, dq.max()
    assert (dq > 0).mean() < 0.05, (dq > 0).mean()


def test_fused_block_chain_matches_split_chain():
    """Two fused blocks chained (the serving wiring) track the split chain."""
    rng = np.random.default_rng(22)
    q0, q1 = _mkblock(rng), _mkblock(rng)
    x = jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32) * 0.5
                    ).astype(jnp.bfloat16)
    xq, xs = fused_rowquant(x, "ln", q0["norm1"]["scale"],
                            q0["norm1"]["bias"], interpret=True)

    rx, rq, rs = _block_tpu(x, xq, xs, q0, next_ln=q1["norm1"], num_heads=H,
                            interpret=True, softmax_shift=2.5)
    rx2, _, _ = _block_tpu(rx, rq, rs, q1, next_ln=None, num_heads=H,
                           interpret=True, softmax_shift=2.5)

    fx, fq, fs = fused_vit_block(xq, xs, x, q0, q1["norm1"], num_heads=H,
                                 softmax_shift=2.5, interpret=True)
    fx2, _, _ = _block_tpu(fx, fq, fs, q1, next_ln=None, num_heads=H,
                           interpret=True, softmax_shift=2.5)

    r = np.asarray(rx2, np.float32)
    f = np.asarray(fx2, np.float32)
    assert np.abs(f - r).max() / max(np.abs(r).max(), 1e-6) < 0.02


@pytest.mark.parametrize("shifts", [[2.5, 3.0, 2.0], [None, None, None]],
                         ids=["calibrated", "bound"])
def test_fused_stack_matches_unrolled(shifts):
    """lax.scan over stacked weights == the unrolled fused-block chain.

    The scan compiles the kernel once (the B=512 program-size fix); its math
    must be bitwise identical to unrolled calls — the only wiring change is
    the calibrated shift arriving as a traced SMEM scalar."""
    from chess_vision_tpu.ops.fused_block import fused_vit_stack

    rng = np.random.default_rng(23)
    qs = [_mkblock(rng) for _ in range(4)]
    x = jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32) * 0.5
                    ).astype(jnp.bfloat16)
    xq, xs = fused_rowquant(x, "ln", qs[0]["norm1"]["scale"],
                            qs[0]["norm1"]["bias"], interpret=True)

    ux, uq, us = x, xq, xs
    for i in range(3):
        ux, uq, us = fused_vit_block(uq, us, ux, qs[i], qs[i + 1]["norm1"],
                                     num_heads=H, softmax_shift=shifts[i],
                                     interpret=True)

    sx, sq, ss = fused_vit_stack(xq, xs, x, qs[:3],
                                 [q["norm1"] for q in qs[1:]], shifts,
                                 num_heads=H, interpret=True)

    np.testing.assert_array_equal(np.asarray(sx, np.float32),
                                  np.asarray(ux, np.float32))
    np.testing.assert_array_equal(np.asarray(sq), np.asarray(uq))
    np.testing.assert_array_equal(np.asarray(ss), np.asarray(us))
