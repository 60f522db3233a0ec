#!/usr/bin/env python
"""Headline benchmark: ViT-B/16 batched inference throughput (boards/sec/chip).

Measures the serving hot path on the flagship model — uint8 board batches ->
device normalize -> bf16 forward -> per-square argmax -> compact results
(69 bytes/board) back to host — pipelined with a bounded in-flight window so
host<->device transfers overlap device compute. JPEG decode is excluded (it
runs on host CPU threads and scales with cores, not chips).

Two numbers are measured every run:
  - compute-bound (device-resident inputs, no per-step H2D) — the headline
    metric: reproducible across runs and representative of per-chip serving
    capability on production hardware.
  - end-to-end (pipelined H2D through this environment's relay tunnel) —
    recorded alongside; the tunnel's 1-700 MB/s bandwidth swings make it
    noisy run-to-run and ~100x below a real PCIe/ICI ingest path, so it
    measures the dev tunnel, not the chip. Use --end-to-end to make it the
    headline value anyway.

Robustness contract (the driver runs this under `timeout` and parses stdout):
ONE JSON line is ALWAYS printed — on success, on any exception, on SIGTERM/
SIGINT, and when the internal --budget expires while the backend is wedged.

Un-null-ability (round-4 lesson: BENCH_r04 was nulled by one transient
remote-compile HTTP 500): the default mode is a DRIVER that tries a chain of
(layout, batch) configs, each in its OWN subprocess with its own watchdog, so
a compile-helper crash or a tunnel wedge on one config cannot erase the run —
the driver retries transient failures with backoff, falls through the chain
(fused -> block, 512 -> 256), and emits the best number obtained with
"degraded": true when any planned config failed. `--single` runs one config
in-process (the old behavior; what the driver spawns).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "boards/s", "vs_baseline": N/5000,
   "compute_bound": M, "end_to_end": K, "stage": ...,
   ["configs": {...}, "degraded": bool, "error": ...]}
vs_baseline is relative to the 5,000 boards/sec/chip target in BASELINE.json
(the reference publishes no inference throughput; its training throughput was
~614 img/s on one CUDA GPU, BASELINE.md).
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import threading
import time

import numpy as np


def arg(flag: str, default, cast):
    if flag in sys.argv:
        return cast(sys.argv[sys.argv.index(flag) + 1])
    return default


STATE = {
    "stage": "start",
    "compute_bound": None,
    "end_to_end": None,
    "error": None,
    "n_dev": 1,
    "done": False,
}
_EMITTED = threading.Lock()


def emit_and_exit(code: int = 0, extra: dict | None = None) -> None:
    """Print the single JSON result line (exactly once) and hard-exit."""
    if not _EMITTED.acquire(blocking=False):  # someone else is emitting
        time.sleep(5)
        os._exit(code)
    cb, e2e = STATE["compute_bound"], STATE["end_to_end"]
    headline = e2e if "--end-to-end" in sys.argv and e2e else (cb or e2e)
    out = {
        "metric": "vitb_inference_boards_per_sec_per_chip",
        "value": round(headline, 1) if headline else None,
        "unit": "boards/s",
        "vs_baseline": round(headline / 5000.0, 4) if headline else None,
        "compute_bound": round(cb, 1) if cb else None,
        "end_to_end": round(e2e, 1) if e2e else None,
        "stage": STATE["stage"],
    }
    if STATE["error"]:
        out["error"] = str(STATE["error"])[:300]
    if extra:
        out.update(extra)
    print(json.dumps(out), flush=True)
    sys.stdout.flush()
    os._exit(code)


def host_init_params(model, input_size: int) -> dict:
    """Random params on HOST from the abstract shape tree — avoids shipping a
    whole jitted init program through the tunnel just to benchmark throughput
    (weight values don't affect speed)."""
    import jax

    from chess_vision_tpu.models import abstract_variables

    rng = np.random.default_rng(0)
    abstract = abstract_variables(model, input_size)

    def materialize(leaf):
        return (rng.standard_normal(leaf.shape) * 0.02).astype(leaf.dtype)

    return jax.tree.map(materialize, abstract["params"])


def run_bench(batch: int, seconds: float, mode: str, use_int8: bool) -> None:
    """Worker-thread body. Updates STATE incrementally so the supervisor can
    emit partial results at any point."""
    STATE["stage"] = "import"
    from chess_vision_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    import jax

    STATE["stage"] = "backend_init"
    n_dev = len(jax.devices())
    STATE["n_dev"] = n_dev

    STATE["stage"] = "build_model"
    from chess_vision_tpu.models import build_model
    from chess_vision_tpu.serve import make_infer_fn

    cfg = {
        "model": {"arch": "vit", "input_size": 256,
                  "head_dropout": 0.0, "drop_path_rate": 0.0},
        "training": {"mixed_precision": True},
    }
    model = build_model(cfg)
    params = host_init_params(model, 256)

    if use_int8:
        STATE["stage"] = "quantize"
        from chess_vision_tpu.ops.quant import quantize_chessvit
        from chess_vision_tpu.serve import make_int8_infer_fn

        calib = None
        # xla/hybrid attention ignores calibrated shifts (plain kernel,
        # env-selected shift mode) — don't spend child budget calibrating
        if (os.environ.get("CVT_BENCH_CALIB", "1") == "1"
                and os.environ.get("CHESS_VISION_INT8_LAYOUT", "block")
                not in ("xla", "hybrid")):
            # calibrate per-layer softmax shifts on a synthetic batch — the
            # recommended serving config (serve.py --calib does the same on
            # real inputs at load time; measured +6% over the adaptive
            # bound-shift mode, one extra jitted dispatch at load).
            # CVT_BENCH_CALIB=0 falls back to the bound-shift default.
            STATE["stage"] = "calibrate"
            crng = np.random.default_rng(7)
            calib = ((crng.integers(0, 256, (8, 256, 256, 3)) / 255.0 - 0.5)
                     / 0.5).astype(np.float32)
        STATE["stage"] = "upload_pack"
        pack = quantize_chessvit(params, calib=calib)
        shifts = pack.pop("attn_shifts", None)
        params = jax.device_put(pack)
        infer = make_int8_infer_fn(
            mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5), mode=mode,
            attn_shifts=shifts,
        )
    else:
        infer = make_infer_fn(
            model, mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5), mode=mode
        )

    rng = np.random.default_rng(0)
    if mode == "ycbcr420":
        # the native decoder emits subsampled planes directly (half the
        # bytes of RGB); RGB is reconstructed on device
        hosts = [
            (
                rng.integers(0, 256, (batch, 256, 256)).astype(np.uint8),
                rng.integers(0, 256, (batch, 128, 128)).astype(np.uint8),
                rng.integers(0, 256, (batch, 128, 128)).astype(np.uint8),
            )
            for _ in range(2)
        ]
    else:
        hosts = [
            (rng.integers(0, 256, (batch, 256, 256, 3)).astype(np.uint8),)
            for _ in range(2)
        ]

    def submit(host_tuple):
        dev = tuple(jax.device_put(a) for a in host_tuple)
        return infer(params, {}, *dev)

    # Warmup / compile (block via D2H of results — block_until_ready is
    # unreliable over tunneled backends).
    STATE["stage"] = "compile"
    t_c = time.time()
    out = submit(hosts[0])
    np.asarray(out[0])
    print(f"bench: mode={mode} int8={use_int8} "
          f"compile+warmup {time.time() - t_c:.1f}s", file=sys.stderr,
          flush=True)

    # --- compute-bound: device-resident inputs, K batches chained per
    # dispatch in a fori_loop ------------------------------------------------
    # One RPC per batch leaves ~30ms/batch of relay dispatch latency in the
    # number even at queue depth 8 (profiled: 117ms device vs 151ms wall) —
    # the tunnel serializes submissions. Chaining K forwards inside one jitted
    # program measures the chip, which is the compute-bound contract. The
    # carry threads a data dependency through every iteration (microbench.py
    # pattern: f32 *0 is not constant-folded — NaN semantics — so XLA cannot
    # hoist the forward).
    import jax.numpy as jnp

    STATE["stage"] = "upload"
    dev_inputs = [tuple(jax.device_put(a) for a in h) for h in hosts]
    np.asarray(infer(params, {}, *dev_inputs[0])[0])  # settle transfers
    K = int(os.environ.get("CVT_BENCH_K", "4"))

    @jax.jit
    def chained(params, ins):
        def body(_, carry):
            dep = carry.astype(ins[0].dtype)  # 0 at runtime, traced for XLA
            out = infer(params, {}, ins[0] + dep, *ins[1:])
            return jnp.sum(out[0]).astype(jnp.float32) * jnp.float32(1e-30)

        return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

    STATE["stage"] = "compute_bound_compile"
    np.asarray(chained(params, dev_inputs[0]))  # compile + warm
    STATE["stage"] = "compute_bound"
    reps = 0
    t0 = time.time()
    window = []
    while time.time() - t0 < seconds or reps < 2:
        window.append(chained(params, dev_inputs[reps % 2]))
        if len(window) >= 3:
            np.asarray(window.pop(0))
            done = (reps - 2) * K  # batches actually retired
            if done >= 2 * K:
                STATE["compute_bound"] = done * batch / (time.time() - t0) / n_dev
        reps += 1
    while window:
        np.asarray(window.pop(0))
    compute_bound = reps * K * batch / (time.time() - t0) / n_dev
    STATE["compute_bound"] = compute_bound

    # --- end-to-end: pipelined H2D -> infer -> D2H, depth-3 window --------
    STATE["stage"] = "end_to_end"
    window = []
    boards = 0
    i = 0
    t0 = time.time()
    while time.time() - t0 < seconds or i < 4:
        window.append(submit(hosts[i % 2]))
        if len(window) >= 3:
            np.asarray(window.pop(0)[0])
            boards += batch
            if boards >= 2 * batch:
                STATE["end_to_end"] = boards / (time.time() - t0) / n_dev
        i += 1
    while window:
        np.asarray(window.pop(0)[0])
        boards += batch
    end_to_end = boards / (time.time() - t0) / n_dev
    STATE["end_to_end"] = end_to_end

    print(
        f"bench: end_to_end {end_to_end:.1f} boards/s "
        f"({boards} boards), compute_bound {compute_bound:.1f} "
        f"boards/s on {n_dev} chip(s), batch={batch}", file=sys.stderr,
        flush=True,
    )
    STATE["stage"] = "done"
    STATE["done"] = True


def run_single():
    """One (layout, batch) config in-process — the old bench behavior.

    Supervisor on the main thread (heartbeats + budget watchdog), measurement
    on a worker thread; one JSON line always."""
    batch = arg("--batch", 512, int)
    seconds = arg("--seconds", 12.0, float)
    budget = arg("--budget", float(os.environ.get("CVT_BENCH_BUDGET", 480)),
                 float)
    layout = arg("--layout", os.environ.get("CHESS_VISION_INT8_LAYOUT",
                                            "block"), str)
    mode = "rgb" if "--rgb" in sys.argv else "ycbcr420"
    use_int8 = "--no-int8" not in sys.argv
    if layout == "bf16":
        # Pseudo-layout: the unquantized bf16 forward. No int8 Pallas
        # programs anywhere — the deepest fallback when the remote compile
        # helper rejects every quantized serving program (round-5 failure
        # mode; see EXPERIMENTS.md "compile-helper regression").
        use_int8 = False
    else:
        os.environ["CHESS_VISION_INT8_LAYOUT"] = layout

    # Mock plan for the fallback unit test (no TPU touched): a JSON map of
    # "layout:batch" -> result, where result is a number (succeed with that
    # compute_bound), a string "error:<msg>" (fail), or a list indexed by
    # --attempt (retry scenarios).
    plan = os.environ.get("CVT_BENCH_MOCK_PLAN")
    if plan:
        res = json.loads(plan).get(f"{layout}:{batch}", "error:not in plan")
        if isinstance(res, list):
            res = res[min(arg("--attempt", 0, int), len(res) - 1)]
        if isinstance(res, str) and res.startswith("error:"):
            STATE["error"] = res[6:]
            STATE["stage"] = "compile"
        else:
            STATE["compute_bound"] = float(res)
            STATE["end_to_end"] = float(res) / 2
            STATE["stage"] = "done"
        emit_and_exit(0)

    for sig in (signal.SIGTERM, signal.SIGINT):
        signal.signal(sig, lambda s, f: (
            STATE.__setitem__("error", STATE["error"] or f"signal {s}"),
            emit_and_exit(0)))

    def body():
        try:
            run_bench(batch, seconds, mode, use_int8)
        except BaseException as e:  # noqa: BLE001 — always report
            STATE["error"] = f"{type(e).__name__}: {e}"
            STATE["done"] = True

    worker = threading.Thread(target=body, daemon=True)
    worker.start()

    deadline = time.time() + budget
    last_beat = 0.0
    while not STATE["done"] and time.time() < deadline:
        now = time.time()
        if now - last_beat >= 10:
            print(f"bench: [{now - deadline + budget:5.0f}s] "
                  f"stage={STATE['stage']}"
                  + (f" cb={STATE['compute_bound']:.0f}"
                     if STATE['compute_bound'] else ""),
                  file=sys.stderr, flush=True)
            last_beat = now
        time.sleep(1.0)

    if not STATE["done"]:
        STATE["error"] = (
            f"budget {budget:.0f}s expired at stage={STATE['stage']} "
            "(tunnel/backend stalled)")
    emit_and_exit(0)


# ---------------------------------------------------------------------------
# Driver mode: config chain + retries + fallback, each config in its own
# subprocess so a wedged backend or a crashed compile helper is contained.
# ---------------------------------------------------------------------------

# Chain order: bank a number FIRST, then chase the upside. Round-5's compile
# helper deterministically 500s every int8_matmul/fused_block Pallas program
# (block, fused, any batch) while pure-XLA int8 compiles and measures
# (2,357.7 boards/s on 2026-08-21) — so xla:512 leads: ~8 min to a banked
# number in the broken-helper world, a small constant cost in the healthy
# one (the driver keeps the best value across the chain, so block/fused
# still set the headline when they compile). hybrid:512 runs second: it uses
# only the two custom calls the broken helper still accepts (fused_rowquant
# + the plain attention kernel, both already inside the xla:512 program that
# compiled) and removes the pure-XLA layout's f32 quant-chain HBM passes.
# A leading "?" marks a fallback-only config: tried only if nothing before
# it produced a number.
# hybrid:512 measured 2,619.4 vs xla:512's 2,357.7 (both banked 2026-08-21;
# hybrid's compile is cached server-side) — lead with the better bank.
DEFAULT_CONFIGS = ("hybrid:512,xla:512,block:512,fused:512,fused:256,"
                   "?block:256,?bf16:512")
TRANSIENT = ("500", "budget", "stall", "wedge", "timeout", "signal",
             "unavailable", "deadline", "internal", "socket closed")


def parse_configs(spec: str) -> list[dict]:
    out = []
    for item in spec.split(","):
        item = item.strip()
        if not item:
            continue
        fallback = item.startswith("?")
        layout, _, b = item.lstrip("?").partition(":")
        out.append({"layout": layout, "batch": int(b or 512),
                    "fallback": fallback})
    return out


def spawn_single(cfg: dict, attempt: int, child_budget: float,
                 seconds: float) -> dict:
    """Run one config in a subprocess; return its parsed JSON (or a synthetic
    error dict). Kills the exact child PID on watchdog expiry."""
    cmd = [sys.executable, os.path.abspath(__file__), "--single",
           "--layout", cfg["layout"], "--batch", str(cfg["batch"]),
           "--seconds", str(seconds), "--budget", str(child_budget),
           "--attempt", str(attempt)]
    for flag in ("--rgb", "--no-int8", "--end-to-end"):
        if flag in sys.argv:
            cmd.append(flag)
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE, text=True)
    try:
        # child enforces its own budget and always prints JSON; the +90s
        # grace covers emit/teardown. communicate() cannot hang past that.
        out, _ = proc.communicate(timeout=child_budget + 90)
    except subprocess.TimeoutExpired:
        proc.kill()  # exact PID — never pattern-kill
        out, _ = proc.communicate()
    for line in reversed((out or "").strip().splitlines()):
        try:
            return json.loads(line)
        except (json.JSONDecodeError, ValueError):
            continue
    return {"value": None,
            "error": f"child produced no JSON (killed at {child_budget:.0f}s"
                     " watchdog)"}


def run_driver():
    configs = parse_configs(
        arg("--configs", os.environ.get("CVT_BENCH_CONFIGS",
                                        DEFAULT_CONFIGS), str))
    seconds = arg("--seconds", 12.0, float)
    budget = arg("--budget",
                 float(os.environ.get("CVT_BENCH_BUDGET", 1500)), float)
    # 1 retry by default: with today's deterministic compile-500s a third
    # attempt never helps, and two fewer dead attempts per config buys the
    # tail of the chain (where the banking configs live) ~8 min of budget.
    retries = arg("--retries", 1, int)
    backoff = arg("--backoff",
                  float(os.environ.get("CVT_BENCH_BACKOFF", 30)), float)
    t0 = time.time()
    results: dict[str, float | None] = {}
    errors: dict[str, str] = {}
    best: dict = {}

    def remaining():
        return budget - (time.time() - t0)

    def emit_driver(code=0):
        cb = best.get("compute_bound")
        e2e = best.get("end_to_end")
        STATE["compute_bound"] = cb
        STATE["end_to_end"] = e2e
        STATE["stage"] = "done" if results else "driver"
        # degraded: some planned (non-fallback) config never yielded a
        # number, or no number at all — i.e. the emitted value may not be
        # the best obtainable. A transient failure that recovered on retry
        # does NOT degrade the run.
        degraded = (not any(v for v in results.values() if v)
                    or any(v is None for v in results.values()))
        extra = {"configs": results, "degraded": degraded}
        if best.get("config"):
            extra["config"] = best["config"]
        if errors:
            extra["errors"] = {k: v[:160] for k, v in errors.items()}
        emit_and_exit(code, extra=extra)

    for sig in (signal.SIGTERM, signal.SIGINT):
        signal.signal(sig, lambda s, f: (
            STATE.__setitem__("error", STATE["error"] or f"signal {s}"),
            emit_driver(0)))

    have_number = False
    for cfg in configs:
        key = f"{cfg['layout']}:{cfg['batch']}"
        if cfg["fallback"] and have_number:
            continue
        for attempt in range(retries + 1):
            # leave enough budget for the child to finish measuring
            child_budget = min(
                float(os.environ.get("CVT_BENCH_CHILD_BUDGET", 480)),
                remaining() - 15)
            if child_budget < 60:
                errors.setdefault(key, "driver budget exhausted")
                results.setdefault(key, None)
                break
            print(f"bench-driver: config {key} attempt {attempt} "
                  f"(child budget {child_budget:.0f}s, "
                  f"{remaining():.0f}s left)", file=sys.stderr, flush=True)
            res = spawn_single(cfg, attempt, child_budget, seconds)
            val = res.get("compute_bound") or res.get("value")
            if val:
                results[key] = val
                have_number = True
                headline = res.get("value") or val
                if headline > (best.get("value") or 0):
                    best = {"value": headline,
                            "compute_bound": res.get("compute_bound"),
                            "end_to_end": res.get("end_to_end"),
                            "config": key}
                break
            err = str(res.get("error", "unknown"))
            errors[key] = err
            print(f"bench-driver: {key} attempt {attempt} failed: "
                  f"{err[:200]}", file=sys.stderr, flush=True)
            transient = any(t in err.lower() for t in TRANSIENT)
            if not transient or attempt == retries:
                results.setdefault(key, None)
                break
            # transient (compile-helper 500 / tunnel stall): brief backoff —
            # a full tunnel wedge lasts ~20 min, which we cannot wait out,
            # but helper crashes recover in seconds.
            time.sleep(min(backoff, max(0.0, remaining() - 90)))
        if remaining() < 60:
            break

    emit_driver(0)


def main():
    if "--host-pipeline" in sys.argv:
        # Host-ingest proof (CPU only, no TPU claim): decode-pool throughput
        # vs thread count — see experiments/host_pipeline.py for the replay
        # (H2D-mocked) companion measurement.
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "experiments"))
        from host_pipeline import bench_decode

        bench_decode(arg("--images", 4096, int))
        return
    if "--single" in sys.argv:
        run_single()
    else:
        run_driver()


if __name__ == "__main__":
    main()
