#!/usr/bin/env python
"""Sweep attention-kernel variants on the chip (serving shapes, B=512).

The per-op profile (experiments/profile_serving.py, 2026-08-18) puts the
attention+quant kernel at 41.2 ms/batch — 35% of the serving path and ~30
T/s-eff. Cycle accounting says it is VPU-pass-bound per head: exp (~200
cycles), the per-row max reduction (~200), scale/sub/cast (~125). Each
variant here removes passes:

  base      — current kernel (max + exp, scale folded into PV? no: s*scale)
  foldscale — scale applied to q once per cell instead of per-head on the
              (N, N) f32 score tile
  noshift   — foldscale + NO max pass: p = exp(s - C) with a fixed shift.
              Safe in f32 as long as max score < C + 88: the ones-column
              rowsum renormalizes exactly, and unnormalized p values as
              small as e^-87 keep full relative precision. C is chosen
              from the measured score range of trained checkpoints (see
              score_range mode below).
  bb2       — foldscale + 2 images per grid cell (pipelining check)

Usage:
  python experiments/attn_variants.py sweep [batch]
  python experiments/attn_variants.py score_range <ckpt> [n_images]
"""

from __future__ import annotations

import functools
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(x):
    np.asarray(x)


def _make_variant(name: str, num_heads: int, N: int, D: int, bb: int = 1):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    head_dim = D // num_heads
    scale = 1.0 / math.sqrt(head_dim)
    SHIFT = 24.0  # measured: trained-ckpt max score ~<= 16 (score_range mode)

    def _fastexp2(t):
        """2^t via cubic minimax poly on the fraction + exponent-bit splice.
        Max rel err ~2e-4 — far under the int8 rowquant step downstream."""
        t = jnp.clip(t, -120.0, 120.0)
        i = jnp.floor(t)
        f = t - i
        # minimax cubic for 2^f on [0,1)
        p = 1.0 + f * (0.6931471 + f * (0.2401536 + f * 0.0558282))
        e = jax.lax.shift_left(i.astype(jnp.int32) + 127, 23)
        return jax.lax.bitcast_convert_type(e, jnp.float32) * p

    LOG2E = 1.4426950408889634

    def kernel(q_ref, k_ref, v_ref, oq_ref, os_ref, scratch):
        for b in range(bb):
            q = q_ref[b]
            k = k_ref[b]
            v = v_ref[b]
            n = q.shape[0]
            if name not in ("base",):
                fold = scale * LOG2E if "fexp" in name else scale
                q = q * jnp.asarray(fold, q.dtype)
            if name.startswith("normbound"):
                # per-head row norms via one squared pass + one MXU dot
                # against a block-diagonal ones selector; per-row shift
                # m = |q_i| * max_j |k_j| >= true row max (Cauchy-Schwarz),
                # offset -40 to center the f32 band (underflow cliff at
                # bound gap ~127; measured worst gap on the trained
                # checkpoint: 81).
                sel = (
                    jax.lax.broadcasted_iota(
                        jnp.int32, (q.shape[1], num_heads), 0) // head_dim
                    == jax.lax.broadcasted_iota(
                        jnp.int32, (q.shape[1], num_heads), 1)
                ).astype(jnp.float32)
                qf = q.astype(jnp.float32)
                kf = k.astype(jnp.float32)
                qn2 = jax.lax.dot(qf * qf, sel,
                                  preferred_element_type=jnp.float32)
                kn2 = jax.lax.dot(kf * kf, sel,
                                  preferred_element_type=jnp.float32)
                kn2max = jnp.max(kn2, axis=0, keepdims=True)   # (1, H)
                m_all = jnp.sqrt(qn2 * kn2max) - 40.0          # (N, H)
            for i in range(num_heads):
                sl = slice(i * head_dim, (i + 1) * head_dim)
                pref = jnp.bfloat16 if name == "bf16s" else jnp.float32
                s = jax.lax.dot_general(
                    q[:, sl], k[:, sl],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=pref,
                )
                if name == "base":
                    s = s * scale
                if name == "noshift":
                    p = jnp.exp(s - SHIFT).astype(v.dtype)
                elif name == "noexp":
                    m = jnp.max(s, axis=-1, keepdims=True)
                    p = (s - m).astype(v.dtype)  # exp removed: cost probe
                elif name == "fexp":
                    m = jnp.max(s, axis=-1, keepdims=True)
                    p = _fastexp2(s - m).astype(v.dtype)
                elif name == "fexp_ns":
                    p = _fastexp2(s - 110.0).astype(v.dtype)  # shiftless
                elif name == "bf16s":
                    m = jnp.max(s, axis=-1, keepdims=True)
                    p = jnp.exp(s - m).astype(v.dtype)  # all-bf16 tile
                elif name.startswith("normbound"):
                    p = jnp.exp(s - m_all[:, i:i + 1]).astype(v.dtype)
                else:
                    m = jnp.max(s, axis=-1, keepdims=True)
                    p = jnp.exp(s - m).astype(v.dtype)
                v_ext = jnp.concatenate(
                    [v[:, sl], jnp.ones((n, 1), v.dtype)], axis=1
                )
                o_ext = jax.lax.dot(p, v_ext,
                                    preferred_element_type=jnp.float32)
                if name == "normbound_bd":
                    scratch[b, :, sl] = o_ext[:, :head_dim]
                    rows.append(o_ext[:, head_dim:])
                else:
                    scratch[b, :, sl] = (o_ext[:, :head_dim]
                                         / o_ext[:, head_dim:])
            o = scratch[b].astype(jnp.float32)
            if name == "normbound_bd":
                # batched divide: 12 per-head (N, 64) divides collapse into
                # one MXU block-ones broadcast + one wide multiply fused
                # into the quant pass
                rinv = 1.0 / jnp.concatenate(rows, axis=1)        # (N, H)
                o = o * jax.lax.dot(rinv, sel.T,
                                    preferred_element_type=jnp.float32)
            amax = jnp.maximum(
                jnp.max(jnp.abs(o), axis=-1, keepdims=True), 1e-8)
            oq_ref[b] = jnp.clip(jnp.round(o * (127.0 / amax)), -127, 127
                                 ).astype(jnp.int8)
            os_ref[b] = amax * (1.0 / 127.0)

    def run(qkv):
        B = qkv.shape[0]
        spec = lambda part: pl.BlockSpec(  # noqa: E731
            (bb, N, D), lambda b, part=part: (b, 0, part),
            memory_space=pltpu.VMEM,
        )
        return pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((B, N, D), jnp.int8),
                jax.ShapeDtypeStruct((B, N, 1), jnp.float32),
            ),
            grid=(B // bb,),
            in_specs=[spec(0), spec(1), spec(2)],
            out_specs=(
                pl.BlockSpec((bb, N, D), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bb, N, 1), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[pltpu.VMEM((bb, N, head_dim * num_heads),
                                       jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * 2 * B * num_heads * N * N * head_dim,
                bytes_accessed=qkv.size * qkv.dtype.itemsize,
                transcendentals=B * num_heads * N * N,
            ),
        )(qkv, qkv, qkv)

    return run


def sweep(batch: int) -> None:
    from chess_vision_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    import jax
    import jax.numpy as jnp

    N, H, Dh = 257, 12, 64
    D = H * Dh
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.normal(size=(batch, N, 3 * D)), jnp.bfloat16)

    from chess_vision_tpu.ops.attention import fused_qkv_attention_quant

    iters = 16
    for name, bb in (("base", 1), ("noshift", 1), ("normbound", 1)):
        if name == "actual":
            fn = functools.partial(fused_qkv_attention_quant, num_heads=H)
        else:
            fn = _make_variant(name, H, N, D, bb=bb)

        @jax.jit
        def loop(qkv, fn=fn):
            def body(_, carry):
                oq, os_ = fn(qkv + carry.astype(qkv.dtype))
                return jnp.sum(os_) * jnp.float32(1e-30)

            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

        try:
            _sync(loop(qkv))
            t0 = time.time()
            _sync(loop(qkv))
            dt = (time.time() - t0) / iters
            print(f"{name:10s} bb={bb}: {dt * 1e3:7.2f} ms/batch "
                  f"({batch / dt:.0f} img/s attn-only)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:10s} bb={bb}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


def score_range(ckpt: str, n_images: int) -> None:
    """Max |attention score| per layer on real data through a trained
    checkpoint — determines a safe fixed softmax shift (CPU, XLA path)."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    from chess_vision_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    import jax.numpy as jnp

    from chess_vision_tpu.data import ChessDataset
    from chess_vision_tpu.models import build_model, abstract_variables
    from chess_vision_tpu.utils.checkpoint import (
        load_checkpoint,
        restore_tree,
    )
    from chess_vision_tpu.ops import attention as attn_mod
    cfg = {"model": {"arch": "vit", "input_size": 256, "head_dropout": 0.0,
                     "drop_path_rate": 0.0},
           "training": {"mixed_precision": True}}
    model = build_model(cfg)
    payload = load_checkpoint(ckpt)
    params = restore_tree(abstract_variables(model, 256)["params"],
                          payload["params"])

    maxes: list[float] = []
    orig = attn_mod._reference_attention

    def spy(qkv, num_heads):
        B, N, C3 = qkv.shape
        Dm = C3 // 3
        parts = qkv.reshape(B, N, 3, num_heads, Dm // num_heads)
        q, k = parts[:, :, 0], parts[:, :, 1]
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
        s = s / math.sqrt(q.shape[-1])
        maxes.append(float(jnp.max(s)))
        return orig(qkv, num_heads)

    gaps: list[float] = []

    def spy2(qkv, num_heads):
        """Also record the worst per-row gap between the Cauchy-Schwarz
        bound (scale*|q_i|*max_j|k_j|) and the true row max score: rows
        whose gap exceeds ~80 would underflow entirely under the
        norm-bound shift."""
        B, N, C3 = qkv.shape
        Dm = C3 // 3
        parts = qkv.reshape(B, N, 3, num_heads, Dm // num_heads)
        q, k = parts[:, :, 0], parts[:, :, 1]
        sc = 1.0 / math.sqrt(q.shape[-1])
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * sc
        maxes.append(float(jnp.max(s)))
        qn = jnp.linalg.norm(q.astype(jnp.float32), axis=-1)  # (B,N,H)
        kn = jnp.linalg.norm(k.astype(jnp.float32), axis=-1)
        bound = sc * qn.transpose(0, 2, 1) * jnp.max(
            kn, axis=1)[:, :, None]                            # (B,H,N)
        gap = bound - jnp.max(s, axis=-1)                      # (B,H,N)
        gaps.append(float(jnp.max(gap)))
        return orig(qkv, num_heads)

    attn_mod._reference_attention = spy2
    ds = ChessDataset("data/test", max_samples=n_images)
    imgs = np.stack([ds.load_image(i) for i in range(len(ds))])
    x = (imgs.astype(np.float32) / 255.0 - 0.5) / 0.5
    model.apply({"params": params}, jnp.asarray(x, jnp.bfloat16),
                train=False)
    attn_mod._reference_attention = orig
    print(f"per-layer max score / worst norm-bound gap over {len(ds)} "
          "test images:")
    for i, (m, g) in enumerate(zip(maxes, gaps)):
        print(f"  layer {i:2d}: max={m:8.3f}  worst_gap={g:8.3f}")
    print(f"global max: {max(maxes):.3f}, global worst gap: "
          f"{max(gaps):.3f} (underflow cliff at ~87)")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "sweep"
    if mode == "sweep":
        sweep(int(sys.argv[2]) if len(sys.argv) > 2 else 512)
    elif mode == "score_range":
        score_range(sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3
                    else 64)
    else:
        raise SystemExit(f"unknown mode {mode}")
