#!/usr/bin/env python
"""TPU microbenchmarks for the serving compute path.

Establishes the chip's achievable matmul rates (bf16 vs int8) and decomposes
the int8 ViT-B forward into its cost components, so kernel work targets the
actual bottleneck (VERDICT r1 #2). All loops run INSIDE one jitted program
(lax.fori_loop with a chained carry) so the ~100-300 ms tunnel RPC latency
does not pollute the numbers; sync is a D2H read of a small reduction.

Usage:
    python experiments/microbench.py matmul     # bf16/int8 peak sweep
    python experiments/microbench.py vit        # fwd variants, batch sweep
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(x):
    return np.asarray(x)


def bench_matmul():
    import jax
    import jax.numpy as jnp

    def run(n, iters, dtype):
        rng = np.random.default_rng(0)
        if dtype == "int8":
            a = jnp.asarray(
                rng.integers(-127, 128, (n, n)), jnp.int8
            )
            x0 = jnp.asarray(rng.integers(-127, 128, (n, n)), jnp.int8)

            def body(_, x):
                acc = jax.lax.dot(a, x, preferred_element_type=jnp.int32)
                # renormalize back to int8 (elementwise, keeps the chain live)
                return jnp.clip(acc >> 8, -127, 127).astype(jnp.int8)

        else:
            a = jnp.asarray(rng.normal(size=(n, n)) / np.sqrt(n), jnp.bfloat16)
            x0 = jnp.asarray(rng.normal(size=(n, n)), jnp.bfloat16)

            def body(_, x):
                return jax.lax.dot(a, x).astype(jnp.bfloat16)

        @jax.jit
        def loop(x):
            x = jax.lax.fori_loop(0, iters, body, x)
            return jnp.sum(x.astype(jnp.float32))

        _sync(loop(x0))  # compile+warm
        t0 = time.time()
        _sync(loop(x0))
        dt = time.time() - t0
        flops = 2 * n**3 * iters
        return flops / dt / 1e12

    for dtype in ("bf16", "int8"):
        for n in (4096, 8192):
            iters = 48 if n == 4096 else 12
            rate = run(n, iters, dtype)
            unit = "TOPS" if dtype == "int8" else "TFLOP/s"
            print(f"matmul {dtype} {n}x{n}: {rate:.1f} {unit}", flush=True)


def _vit_flops(batch, tokens=257, dim=768, depth=12):
    per_block = 2 * tokens * dim * (3 * dim) + 2 * tokens * dim * dim \
        + 2 * 2 * tokens * dim * 4 * dim
    attn = 2 * 2 * tokens * tokens * dim
    embed = 2 * (tokens - 1) * dim * 768
    return batch * (depth * (per_block + attn) + embed)


def bench_vit():
    import jax
    import jax.numpy as jnp

    from chess_vision_tpu.models import build_model, init_variables
    from chess_vision_tpu.ops.quant import (
        chessvit_int8_apply,
        quantize_chessvit,
    )

    cfg = {
        "model": {"arch": "vit", "input_size": 256,
                  "head_dropout": 0.0, "drop_path_rate": 0.0},
        "training": {"mixed_precision": True},
    }
    model = build_model(cfg)
    variables = init_variables(model, 256)
    params = variables["params"]
    pack = quantize_chessvit(params)
    pack_dev = jax.tree.map(jnp.asarray, pack)

    params = jax.tree.map(jnp.asarray, params)

    def run(fn, weights, x, iters):
        # weights passed as explicit args: a closed-over tree would be baked
        # into the uploaded program (344MB f32 -> HTTP 413 on remote compile)
        @jax.jit
        def loop(weights, x):
            def body(_, carry):
                out = fn(weights, x + carry * jnp.bfloat16(0))
                return jnp.sum(out["squares"]).astype(jnp.bfloat16) * 1e-12

            return jax.lax.fori_loop(
                0, iters, body, jnp.bfloat16(0.0)
            )

        _sync(loop(weights, x))
        t0 = time.time()
        _sync(loop(weights, x))
        return time.time() - t0

    for batch in (512, 1024, 2048):
        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(batch, 256, 256, 3)),
            jnp.bfloat16,
        )
        iters = max(4, 2048 // batch)
        fl = _vit_flops(batch) * iters

        dt = run(chessvit_int8_apply, pack_dev, x, iters)
        print(f"int8 vit b={batch}: {batch * iters / dt:.0f} img/s "
              f"({fl / dt / 1e12:.1f} TFLOP/s-equiv)", flush=True)

        dt = run(
            lambda w, im: model.apply({"params": w}, im, train=False),
            params, x, iters,
        )
        print(f"bf16 vit b={batch}: {batch * iters / dt:.0f} img/s "
              f"({fl / dt / 1e12:.1f} TFLOP/s-equiv)", flush=True)


def bench_kernels():
    """Per-op decomposition of the fused int8 serving path at ViT-B shapes:
    each Pallas kernel timed in its own chained fori_loop. Effective rates
    count the kernel's matmul FLOPs (epilogue work rides along free-of-FLOPs),
    so they are comparable to the matmul sweep. All tensors are jit ARGS
    (closed-over arrays would be baked into the uploaded program: HTTP 413)."""
    import jax
    import jax.numpy as jnp

    from chess_vision_tpu.ops.attention import fused_qkv_attention_quant
    from chess_vision_tpu.ops.int8_matmul import (
        int8_matmul_gelu_quant,
        int8_matmul_res_ln_quant,
    )
    from chess_vision_tpu.ops.quant import fused_rowquant

    B, N, D = (int(sys.argv[2]) if len(sys.argv) > 2 else 512), 257, 768
    iters = 8
    rng = np.random.default_rng(0)
    xq = jnp.asarray(rng.integers(-127, 128, (B, N, D)), jnp.int8)
    xs = jnp.asarray(rng.random((B, N, 1)), jnp.float32) * 0.01
    xb = jnp.asarray(rng.normal(size=(B, N, D)), jnp.bfloat16)
    g = jnp.ones((D,), jnp.float32)
    b2 = jnp.zeros((D,), jnp.float32)

    def timed(name, loop_fn, args, flops):
        loop = jax.jit(loop_fn)
        _sync(loop(*args))
        t0 = time.time()
        _sync(loop(*args))
        dt = time.time() - t0
        print(f"{name}: {flops * iters / dt / 1e12:.1f} T/s-equiv "
              f"({dt / iters * 1e3:.1f} ms/call)", flush=True)

    def loop_rowquant(xb, g, b2):
        def body(_, c):
            q, s = fused_rowquant(xb + c, "ln", g, b2)
            return (q[0, 0, 0].astype(jnp.bfloat16)) * 0

        return jax.lax.fori_loop(0, iters, body, jnp.bfloat16(0))

    # rowquant does no matmul: bytes moved per call, reported as T/s
    timed("fused_rowquant(ln) bytes", loop_rowquant, (xb, g, b2),
          B * N * D * 3)

    wq_proj = jnp.asarray(rng.integers(-127, 128, (D, D)), jnp.int8)
    ws = jnp.ones((D,), jnp.float32) * 0.01
    bias = jnp.zeros((D,), jnp.float32)

    def loop_proj(xq, xs, wq_proj, ws, bias, xb, g, b2):
        def body(_, c):
            x, hq, hs = int8_matmul_res_ln_quant(
                xq, xs + c, wq_proj, ws, bias, xb, g, b2)
            return (hs[0, 0, 0] * 0).astype(jnp.float32)

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    timed("int8_matmul_res_ln_quant (proj 768->768)", loop_proj,
          (xq, xs, wq_proj, ws, bias, xb, g, b2), 2 * B * N * D * D)

    wq_fc1 = jnp.asarray(rng.integers(-127, 128, (D, 4 * D)), jnp.int8)
    ws1 = jnp.ones((4 * D,), jnp.float32) * 0.01
    b1 = jnp.zeros((4 * D,), jnp.float32)

    def loop_fc1(xq, xs, wq_fc1, ws1, b1):
        def body(_, c):
            q, s = int8_matmul_gelu_quant(xq, xs + c, wq_fc1, ws1, b1)
            return (s[0, 0, 0] * 0).astype(jnp.float32)

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    timed("int8_matmul_gelu_quant (fc1 768->3072)", loop_fc1,
          (xq, xs, wq_fc1, ws1, b1), 2 * B * N * D * 4 * D)

    qkv = jnp.asarray(rng.normal(size=(B, N, 3 * D)), jnp.bfloat16)

    def loop_attn(qkv):
        def body(_, c):
            aq, s = fused_qkv_attention_quant(qkv + c, 12)
            return (s[0, 0, 0] * 0).astype(jnp.bfloat16)

        return jax.lax.fori_loop(0, iters, body, jnp.bfloat16(0))

    timed("fused_qkv_attention_quant", loop_attn, (qkv,),
          2 * 2 * B * N * N * D)


def bench_flat():
    """Per-op rates for the FLAT (M-blocked) int8 serving kernels at ViT-B
    shapes (M = B * 288 padded tokens), comparable to bench_kernels."""
    import jax
    import jax.numpy as jnp

    from chess_vision_tpu.ops.attention import fused_qkv_attention_quant_flat
    from chess_vision_tpu.ops.int8_matmul import (
        int8_matmul_gelu_quant_flat,
        int8_matmul_res_ln_quant_flat,
    )

    B = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    NP, D = 288, 768
    M = B * NP
    iters = 8
    rng = np.random.default_rng(0)
    xq = jnp.asarray(rng.integers(-127, 128, (M, D)), jnp.int8)
    xs = jnp.asarray(rng.random((M, 1)), jnp.float32) * 0.01
    xb = jnp.asarray(rng.normal(size=(M, D)), jnp.bfloat16)
    g = jnp.ones((D,), jnp.float32)
    b2 = jnp.zeros((D,), jnp.float32)

    def timed(name, loop_fn, args, flops):
        loop = jax.jit(loop_fn)
        _sync(loop(*args))
        t0 = time.time()
        _sync(loop(*args))
        dt = time.time() - t0
        print(f"{name}: {flops * iters / dt / 1e12:.1f} T/s-equiv "
              f"({dt / iters * 1e3:.1f} ms/call)", flush=True)

    wq_proj = jnp.asarray(rng.integers(-127, 128, (D, D)), jnp.int8)
    ws = jnp.ones((D,), jnp.float32) * 0.01
    bias = jnp.zeros((D,), jnp.float32)

    def loop_proj(xq, xs, wq_proj, ws, bias, xb, g, b2):
        def body(_, c):
            x, hq, hs = int8_matmul_res_ln_quant_flat(
                xq, xs + c, wq_proj, ws, bias, xb, g, b2)
            return (hs[0, 0] * 0).astype(jnp.float32)

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    timed("flat res_ln_quant (proj 768->768)", loop_proj,
          (xq, xs, wq_proj, ws, bias, xb, g, b2), 2 * M * D * D)

    wq_fc1 = jnp.asarray(rng.integers(-127, 128, (D, 4 * D)), jnp.int8)
    ws1 = jnp.ones((4 * D,), jnp.float32) * 0.01
    b1 = jnp.zeros((4 * D,), jnp.float32)

    def loop_fc1(xq, xs, wq_fc1, ws1, b1):
        def body(_, c):
            q, s = int8_matmul_gelu_quant_flat(xq, xs + c, wq_fc1, ws1, b1)
            return (s[0, 0] * 0).astype(jnp.float32)

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    timed("flat gelu_quant (fc1 768->3072)", loop_fc1,
          (xq, xs, wq_fc1, ws1, b1), 2 * M * D * 4 * D)

    hq = jnp.asarray(rng.integers(-127, 128, (M, 4 * D)), jnp.int8)
    hs = jnp.asarray(rng.random((M, 1)), jnp.float32) * 0.01
    wq_fc2 = jnp.asarray(rng.integers(-127, 128, (4 * D, D)), jnp.int8)

    def loop_fc2(hq, hs, wq_fc2, ws, bias, xb, g, b2):
        def body(_, c):
            x, q, s = int8_matmul_res_ln_quant_flat(
                hq, hs + c, wq_fc2, ws, bias, xb, g, b2)
            return (s[0, 0] * 0).astype(jnp.float32)

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    timed("flat res_ln_quant (fc2 3072->768)", loop_fc2,
          (hq, hs, wq_fc2, ws, bias, xb, g, b2), 2 * M * 4 * D * D)

    qkv = jnp.asarray(rng.normal(size=(M, 3 * D)), jnp.bfloat16)

    def loop_attn(qkv):
        def body(_, c):
            aq, s = fused_qkv_attention_quant_flat(qkv + c, B, 257, 12)
            return (s[0, 0] * 0).astype(jnp.bfloat16)

        return jax.lax.fori_loop(0, iters, body, jnp.bfloat16(0))

    timed("flat attention (NP=288, masked)", loop_attn, (qkv,),
          2 * 2 * B * NP * NP * D)


def bench_train():
    """Compute-bound ViT-B train-step throughput (VERDICT r2 #6): donated
    train steps chained in one jitted fori_loop on device-resident data,
    D2H-synced — the reference's comparable number is ~614 img/s on one CUDA
    GPU (01_vit_baseline_3ep_train.log). Also doubles as the scanned-mode
    fault bisection (VERDICT r2 #7): run with CHESS_VISION_NO_PALLAS_ATTN=1
    to take the Pallas attention kernel out of the loop body."""
    import jax
    import jax.numpy as jnp

    from chess_vision_tpu.models import build_model, init_variables
    from chess_vision_tpu.train.loop import make_steps
    from chess_vision_tpu.train.state import create_train_state

    B = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    # optional 4th arg: remat policy for the step (true | false | attn_out).
    # The flash attention backward (ops/attention.py VJP) freed the score
    # tensors, so noremat now fits at b=256 — worth measuring as the default
    # candidate.
    remat_arg = sys.argv[4] if len(sys.argv) > 4 else "true"
    remat = {"true": True, "false": False}.get(remat_arg, remat_arg)
    cfg = {
        "model": {"arch": "vit", "input_size": 256,
                  "head_dropout": 0.1, "drop_path_rate": 0.1,
                  "remat": remat},
        "training": {
            "mixed_precision": True, "epochs": 10, "batch_size": B,
            "lr": 2e-4, "weight_decay": 0.05, "grad_clip_norm": 1.0,
            "label_smoothing": 0.1, "turn_loss_weight": 1.0,
            "castling_loss_weight": 1.0,
        },
        "scheduler": {"warmup_epochs": 1},
    }
    model = build_model(cfg)
    variables = init_variables(model, 256)
    state, _ = create_train_state(cfg, variables, steps_per_epoch=351)
    train_step, _ = make_steps(
        model, cfg, class_weights=None, mean=(0.5,) * 3, std=(0.5,) * 3)

    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(
            rng.integers(0, 256, (B, 256, 256, 3)), jnp.uint8),
        "squares": jnp.asarray(rng.integers(0, 13, (B, 64)), jnp.int32),
        "turn": jnp.asarray(rng.integers(0, 2, (B, 1)), jnp.float32),
        "castling": jnp.asarray(rng.integers(0, 2, (B, 4)), jnp.float32),
        "legal": jnp.ones((B, 1), jnp.float32),
        "mask": jnp.ones(B, jnp.float32),
    }

    @jax.jit
    def loop(state, batch, key):
        def body(i, st):
            st, _ = train_step(st, batch, jax.random.fold_in(key, i))
            return st

        st = jax.lax.fori_loop(0, iters, body, state)
        return st.step, jax.tree.leaves(st.params)[0].reshape(-1)[0]

    key = jax.random.key(0)
    t0 = time.time()
    step, p0 = loop(state, batch, key)
    _sync(p0)
    print(f"compile+warm {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    step, p0 = loop(state, batch, key)
    _sync(p0)
    dt = time.time() - t0
    print(f"train vit b={B}: {B * iters / dt:.1f} img/s "
          f"({dt / iters * 1e3:.0f} ms/step, {iters} chained steps)",
          flush=True)


def bench_train_bisect():
    """Bisect where the train-step time goes (VERDICT r2 #6 follow-up: the
    full step measured 67 img/s vs a ~630 img/s compute ceiling implied by
    the 92 TFLOP/s bf16 forward). One process, several jitted variants, each
    timed with a short chained fori_loop so tunnel RTT stays amortized."""
    import os

    import jax
    import jax.numpy as jnp

    import chess_vision_tpu.train.loop as loop_mod
    from chess_vision_tpu.augment import preprocess_eval_batch
    from chess_vision_tpu.models import build_model, init_variables
    from chess_vision_tpu.train.loop import make_steps
    from chess_vision_tpu.train.state import create_train_state

    B = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(
            rng.integers(0, 256, (B, 256, 256, 3)), jnp.uint8),
        "squares": jnp.asarray(rng.integers(0, 13, (B, 64)), jnp.int32),
        "turn": jnp.asarray(rng.integers(0, 2, (B, 1)), jnp.float32),
        "castling": jnp.asarray(rng.integers(0, 2, (B, 4)), jnp.float32),
        "legal": jnp.ones((B, 1), jnp.float32),
        "mask": jnp.ones(B, jnp.float32),
    }
    key = jax.random.key(0)
    real_aug = loop_mod.preprocess_train_batch

    def measure(name, *, aug=True, dropout=0.1, remat=True, xla_attn=False,
                fwd_only=False):
        cfg = {
            "model": {"arch": "vit", "input_size": 256,
                      "head_dropout": dropout, "drop_path_rate": dropout,
                      "remat": remat},
            "training": {
                "mixed_precision": True, "epochs": 10, "batch_size": B,
                "lr": 2e-4, "weight_decay": 0.05, "grad_clip_norm": 1.0,
                "label_smoothing": 0.1, "turn_loss_weight": 1.0,
                "castling_loss_weight": 1.0,
            },
            "scheduler": {"warmup_epochs": 1},
        }
        os.environ["CHESS_VISION_NO_PALLAS_ATTN"] = "1" if xla_attn else "0"
        loop_mod.preprocess_train_batch = real_aug if aug else (
            lambda b, k, mean, std, **kw: preprocess_eval_batch(b, mean, std))
        try:
            model = build_model(cfg)
            variables = init_variables(model, 256)
            state, _ = create_train_state(cfg, variables, steps_per_epoch=351)
            train_step, eval_step = make_steps(
                model, cfg, class_weights=None, mean=(0.5,) * 3,
                std=(0.5,) * 3)

            if fwd_only:
                @jax.jit
                def loop(state, batch, key):
                    def body(i, c):
                        # thread the carry into the INPUT, not just the
                        # output: a loop-invariant eval_step(params, batch)
                        # gets hoisted out of the fori_loop by XLA (LICM)
                        # and times one forward instead of `iters`.
                        b = dict(batch)
                        b["image"] = b["image"] + (c * 0).astype(
                            b["image"].dtype)
                        sums = eval_step(state.params, state.batch_stats, b)
                        return c + sums["loss_sum"].astype(
                            jnp.float32) * 1e-12
                    return jax.lax.fori_loop(
                        0, iters, body, jnp.float32(0))

                _sync(loop(state, batch, key))
                t0 = time.time()
                _sync(loop(state, batch, key))
            else:
                @jax.jit
                def loop(state, batch, key):
                    def body(i, st):
                        st, _ = train_step(
                            st, batch, jax.random.fold_in(key, i))
                        return st
                    st = jax.lax.fori_loop(0, iters, body, state)
                    return jax.tree.leaves(st.params)[0].reshape(-1)[0]

                _sync(loop(state, batch, key))
                t0 = time.time()
                _sync(loop(state, batch, key))
            dt = time.time() - t0
            print(f"{name}: {B * iters / dt:.1f} img/s "
                  f"({dt / iters * 1e3:.0f} ms/step)", flush=True)
        except Exception as e:  # OOM variants report instead of aborting
            print(f"{name}: FAILED ({type(e).__name__}: {str(e)[:200]})",
                  flush=True)
        finally:
            loop_mod.preprocess_train_batch = real_aug
            os.environ.pop("CHESS_VISION_NO_PALLAS_ATTN", None)

    measure("base (full step)")
    measure("noaug", aug=False)
    measure("noaug+xla_attn", aug=False, xla_attn=True)
    measure("noaug+nodrop", aug=False, dropout=0.0)
    measure("noaug+nodrop+xla_attn", aug=False, dropout=0.0, xla_attn=True)
    measure("eval fwd (floor)", aug=False, dropout=0.0, fwd_only=True)
    measure("noaug+noremat", aug=False, remat=False)
    measure("noaug+remat=attn_out", aug=False, remat="attn_out")
    measure("base+remat=attn_out", remat="attn_out")
    measure("base+noremat", remat=False)


if __name__ == "__main__":
    from chess_vision_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    what = sys.argv[1] if len(sys.argv) > 1 else "matmul"
    if what == "matmul":
        bench_matmul()
    elif what == "vit":
        bench_vit()
    elif what == "kernels":
        bench_kernels()
    elif what == "flat":
        bench_flat()
    elif what == "train":
        bench_train()
    elif what == "train_bisect":
        bench_train_bisect()
