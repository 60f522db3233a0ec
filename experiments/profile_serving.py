#!/usr/bin/env python
"""Capture a device trace of the int8 serving path and print the per-op time
account.

The fori_loop microbench rates (experiments/microbench.py kernels/flat) are
inconsistent with the end-to-end rate — fc1 at ~66 T/s-equiv on ~31% of the
model FLOPs cannot average to the measured ~137 T/s-equiv — so optimization
needs ground truth from the profiler, not synthetic loops. This runs a few
compute-bound batches under jax.profiler.trace and parses the XPlane into a
per-HLO-op self-time table (xprof/tensorboard_plugin_profile converter).

Usage: python experiments/profile_serving.py [batch] [iters]
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRACE_DIR = "/tmp/cvt_trace"


def _sync(x):
    np.asarray(x)


def capture(batch: int, iters: int) -> None:
    from chess_vision_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    import jax

    from chess_vision_tpu.models import build_model
    from chess_vision_tpu.ops.quant import quantize_chessvit
    from chess_vision_tpu.serve import make_int8_infer_fn

    from bench import host_init_params  # repo root is on sys.path above

    cfg = {
        "model": {"arch": "vit", "input_size": 256,
                  "head_dropout": 0.0, "drop_path_rate": 0.0},
        "training": {"mixed_precision": True},
    }
    model = build_model(cfg)
    params = host_init_params(model, 256)
    # per-layer calibrated softmax shifts — the recommended serving config
    # and what bench.py measures (round-3 calibration work)
    crng = np.random.default_rng(7)
    calib = ((crng.integers(0, 256, (8, 256, 256, 3)) / 255.0 - 0.5)
             / 0.5).astype(np.float32)
    pack = jax.device_put(quantize_chessvit(params, calib=calib))
    infer = make_int8_infer_fn(mean=(0.5,) * 3, std=(0.5,) * 3,
                               mode="ycbcr420")

    rng = np.random.default_rng(0)
    host = (
        rng.integers(0, 256, (batch, 256, 256)).astype(np.uint8),
        rng.integers(0, 256, (batch, 128, 128)).astype(np.uint8),
        rng.integers(0, 256, (batch, 128, 128)).astype(np.uint8),
    )
    dev = tuple(jax.device_put(a) for a in host)

    t0 = time.time()
    out = infer(pack, {}, *dev)
    _sync(out[0])
    print(f"compile+warmup {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    outs = [infer(pack, {}, *dev) for _ in range(iters)]
    for o in outs:
        _sync(o[0])
    dt = time.time() - t0
    print(f"untraced: {batch * iters / dt:.1f} boards/s "
          f"({dt / iters * 1e3:.1f} ms/batch)", flush=True)

    with jax.profiler.trace(TRACE_DIR):
        outs = [infer(pack, {}, *dev) for _ in range(iters)]
        for o in outs:
            _sync(o[0])
    print("trace captured", flush=True)


def report(iters: int) -> None:
    paths = sorted(glob.glob(
        os.path.join(TRACE_DIR, "**", "*.xplane.pb"), recursive=True))
    if not paths:
        print("no xplane.pb found under", TRACE_DIR)
        return
    xplane = paths[-1]
    data = None
    for mod in ("tensorboard_plugin_profile.convert.raw_to_tool_data",
                "xprof.convert.raw_to_tool_data"):
        try:
            import importlib

            r2t = importlib.import_module(mod)
            data, _ = r2t.xspace_to_tool_data([xplane], "op_profile", {})
            break
        except Exception as e:  # try the next converter
            print(f"{mod}: {type(e).__name__}: {e}", file=sys.stderr)
    if data is None:
        print("no converter worked; raw trace at", xplane)
        return
    if isinstance(data, bytes):
        try:
            data = gzip.decompress(data)
        except OSError:
            pass
    prof = json.loads(data)
    with open("/tmp/cvt_op_profile.json", "w") as f:
        json.dump(prof, f, indent=1)
    print("full op profile -> /tmp/cvt_op_profile.json")

    # op_profile tree: byProgram/byCategory -> children with metrics
    root = prof.get("byCategory") or prof.get("byProgram") or {}
    total_ps = (root.get("metrics") or {}).get("rawTime", 0)

    rows = []

    def walk(node, path):
        m = node.get("metrics") or {}
        kids = node.get("children") or []
        name = node.get("name", "?")
        if not kids and m.get("rawTime"):
            rows.append((m["rawTime"], m.get("rawFlops", 0),
                         "/".join(path + [name])))
        for k in kids:
            walk(k, path + [name])

    walk(root, [])
    rows.sort(reverse=True)
    print(f"\ntotal device time: {total_ps / 1e12 * 1e3:.2f} ms "
          f"({iters} batches)")
    print(f"{'ms':>9} {'%':>5} {'T/s-eff':>8}  op")
    for t, fl, name in rows[:28]:
        ms = t / 1e9
        eff = (fl / (t / 1e12)) / 1e12 if t else 0.0
        print(f"{ms:9.2f} {100 * t / max(total_ps, 1):5.1f} {eff:8.1f}  "
              f"{name[-100:]}")


if __name__ == "__main__":
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    capture(batch, iters)
    report(iters)
