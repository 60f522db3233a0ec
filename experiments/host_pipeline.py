#!/usr/bin/env python
"""Host-side serving-pipeline proof (VERDICT r3 weak #3 / next #4).

The ≥5k boards/s/chip build target implicitly assumes production-grade host
ingest; through the dev relay tunnel end-to-end has never exceeded ~452
boards/s, so "end_to_end = compute_bound on real PCIe" was an extrapolation.
This measures the two host-side claims separately so they stop being
extrapolations:

  (a) decode-pool throughput vs thread count: pre-loaded in-RAM JPEG bytes
      -> native libjpeg-turbo-less C++ decode+resize (decoder.cpp, GIL
      released) -> packed YCbCr-4:2:0 planes, the exact per-image work
      serve.py's pool does. Reported per thread count; on a many-core
      production host the pool scales ~linearly until memory bandwidth.

  (b) device-resident replay: the full serving dispatch loop (bounded
      in-flight window, chained device compute) with H2D mocked as instant
      by replaying one pre-uploaded batch, while the decode pool runs
      concurrently at full rate — i.e. the pipeline with the tunnel taken
      out. pipeline rate = min(decode rate x cores, compute rate); on this
      1-CPU host the decode leg binds and is reported as the CPU-bound
      ceiling alongside the cores needed to feed the measured compute rate.

Usage:
  python experiments/host_pipeline.py decode [n_images]       # CPU only
  python experiments/host_pipeline.py replay [batch] [secs]   # needs TPU
  python bench.py --host-pipeline                             # = decode
Reference role being replaced: torch DataLoader workers doing PIL decode +
transforms (reference train.py:273-288, dataset.py:251-252).
"""

from __future__ import annotations

import glob
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load_jpeg_bytes(n: int, test_dir: str = "data/test") -> list[bytes]:
    paths = sorted(glob.glob(os.path.join(test_dir, "*.jpg")))[:n]
    if not paths:
        raise SystemExit(f"no JPEGs under {test_dir} — generate a corpus "
                         "(python -m chess_vision_tpu.datagen.generate)")
    blobs = [open(p, "rb").read() for p in paths]
    while len(blobs) < n:  # small corpora: cycle
        blobs.append(blobs[len(blobs) % len(paths)])
    return blobs


def bench_decode(n_images: int = 4096, size: int = 256) -> dict:
    from chess_vision_tpu import native

    if not native.available():
        raise SystemExit("native decoder unavailable (make -C "
                         "chess_vision_tpu/native)")
    blobs = _load_jpeg_bytes(n_images)
    ncpu = os.cpu_count() or 1
    results = {}
    for threads in (1, 2, 4, 8):
        t0 = time.time()
        with ThreadPoolExecutor(threads) as pool:
            out = list(pool.map(
                lambda b: native.decode_ycbcr420(b, size), blobs))
        dt = time.time() - t0
        assert out[-1] is not None
        rate = n_images / dt
        results[threads] = rate
        print(f"decode pool t={threads}: {rate:8.1f} boards/s "
              f"({dt:.2f}s / {n_images})", flush=True)
    best = max(results.values())
    print(f"host: {ncpu} CPU core(s); per-core decode rate "
          f"~{best / min(ncpu, max(results, key=lambda k: results[k])):.0f}"
          f" boards/s", flush=True)
    return results


def bench_replay(batch: int = 512, seconds: float = 20.0) -> None:
    from chess_vision_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    import jax

    from chess_vision_tpu import native
    from chess_vision_tpu.models import build_model
    from chess_vision_tpu.ops.quant import quantize_chessvit
    from chess_vision_tpu.serve import make_int8_infer_fn

    from bench import host_init_params

    cfg = {"model": {"arch": "vit", "input_size": 256,
                     "head_dropout": 0.0, "drop_path_rate": 0.0},
           "training": {"mixed_precision": True}}
    model = build_model(cfg)
    params = host_init_params(model, 256)
    crng = np.random.default_rng(7)
    calib = ((crng.integers(0, 256, (8, 256, 256, 3)) / 255.0 - 0.5)
             / 0.5).astype(np.float32)
    pack = jax.device_put(quantize_chessvit(params, calib=calib))
    infer = make_int8_infer_fn(mean=(0.5,) * 3, std=(0.5,) * 3,
                               mode="ycbcr420")

    rng = np.random.default_rng(0)
    dev = tuple(jax.device_put(a) for a in (
        rng.integers(0, 256, (batch, 256, 256)).astype(np.uint8),
        rng.integers(0, 256, (batch, 128, 128)).astype(np.uint8),
        rng.integers(0, 256, (batch, 128, 128)).astype(np.uint8),
    ))
    np.asarray(infer(pack, {}, *dev)[0])  # compile+warm

    blobs = _load_jpeg_bytes(batch)
    stop = [False]

    decoded = [0]

    def decode_loop():
        i = 0
        while not stop[0]:
            native.decode_ycbcr420(blobs[i % len(blobs)], 256)
            decoded[0] += 1
            i += 1

    import threading

    workers = [threading.Thread(target=decode_loop, daemon=True)
               for _ in range(max(1, (os.cpu_count() or 1)))]
    t0 = time.time()
    for w in workers:
        w.start()
    done = 0
    outs = []
    while time.time() - t0 < seconds:
        outs.append(infer(pack, {}, *dev))   # H2D mocked: same device batch
        if len(outs) >= 4:
            np.asarray(outs.pop(0)[0])       # bounded in-flight window
        done += batch
    for o in outs:
        np.asarray(o[0])
    dt = time.time() - t0
    stop[0] = True
    comp = done / dt
    dec = decoded[0] / dt
    print(f"replay: compute leg {comp:.1f} boards/s with decode pool "
          f"running concurrently; decode leg {dec:.1f} boards/s on "
          f"{len(workers)} thread(s)/{os.cpu_count()} core(s)", flush=True)
    need = comp / max(dec / max(len(workers), 1), 1e-9)
    print(f"cores needed to feed the device at this per-core decode rate: "
          f"~{need:.1f}", flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "decode"
    if mode == "decode":
        bench_decode(int(sys.argv[2]) if len(sys.argv) > 2 else 4096)
    elif mode == "replay":
        bench_replay(int(sys.argv[2]) if len(sys.argv) > 2 else 512,
                     float(sys.argv[3]) if len(sys.argv) > 3 else 20.0)
    else:
        raise SystemExit(f"unknown mode {mode!r}")
