"""bench.py driver-mode fallback chain (VERDICT r4 #2: un-null-ability).

Round 4's scoreboard was nulled by a single remote-compile HTTP 500. These
tests prove — without touching any TPU — that the driver survives compile
failures, retries transients, falls through the (layout, batch) chain, and
always emits a usable JSON line. The mock plan (CVT_BENCH_MOCK_PLAN) is
honoured by ``bench.py --single`` before any jax import.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

BENCH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "bench.py")


def run_driver(plan: dict, configs: str, retries: int = 2) -> dict:
    env = dict(os.environ)
    env["CVT_BENCH_MOCK_PLAN"] = json.dumps(plan)
    env["CVT_BENCH_BACKOFF"] = "0"
    out = subprocess.run(
        [sys.executable, BENCH, "--configs", configs,
         "--retries", str(retries), "--budget", "300"],
        capture_output=True, text=True, timeout=120, env=env,
    )
    lines = [ln for ln in out.stdout.strip().splitlines() if ln.strip()]
    assert lines, f"no stdout from driver; stderr:\n{out.stderr}"
    return json.loads(lines[-1])


def test_first_config_succeeds_clean():
    res = run_driver({"block:512": 4100.0}, "block:512,?block:256")
    assert res["value"] == 4100.0
    assert res["degraded"] is False
    assert res["config"] == "block:512"
    # fallback config must not have been attempted
    assert "block:256" not in res["configs"]
    assert res["vs_baseline"] == round(4100.0 / 5000.0, 4)


def test_compile_500_falls_through_chain():
    # block:512 dies with the exact round-4 failure signature on every
    # attempt; fused:512 also dies; fused:256 succeeds.
    err = "error:JaxRuntimeError: INTERNAL: remote_compile HTTP 500"
    res = run_driver(
        {"block:512": err, "fused:512": err, "fused:256": 3900.0},
        "block:512,fused:512,fused:256", retries=1,
    )
    assert res["value"] == 3900.0
    assert res["config"] == "fused:256"
    assert res["degraded"] is True  # two planned configs never measured
    assert res["configs"]["block:512"] is None
    assert res["configs"]["fused:512"] is None
    assert "500" in res["errors"]["block:512"]


def test_transient_recovers_on_retry_not_degraded():
    # one HTTP-500 then success — a recovered transient is a clean run
    plan = {"block:512": ["error:compile helper HTTP 500", 4050.0]}
    res = run_driver(plan, "block:512")
    assert res["value"] == 4050.0
    assert res["degraded"] is False


def test_nontransient_error_no_retry():
    # a real bug (e.g. shape error) must not burn retries
    plan = {"block:512": "error:TypeError: bad shape (42,)",
            "fused:256": 1000.0}
    res = run_driver(plan, "block:512,fused:256", retries=2)
    assert res["value"] == 1000.0
    assert res["configs"]["block:512"] is None
    assert res["degraded"] is True


def test_all_fail_emits_null_with_errors():
    err = "error:tunnel stall"
    res = run_driver({"block:512": err}, "block:512", retries=0)
    assert res["value"] is None
    assert res["degraded"] is True
    assert "stall" in res["errors"]["block:512"]
    assert res["metric"] == "vitb_inference_boards_per_sec_per_chip"


def test_bf16_last_resort_when_every_int8_program_fails():
    # Round-5 failure mode: the compile helper 500s EVERY quantized serving
    # program (block/fused/xla at any batch); the unquantized bf16 pseudo-
    # layout is the deepest fallback and must still bank a number.
    err = "error:remote_compile HTTP 500: tpu_compile_helper exit 1"
    res = run_driver(
        {"block:512": err, "fused:512": err, "fused:256": err,
         "block:256": err, "xla:512": err, "bf16:512": 1280.0},
        "block:512,fused:512,fused:256,?block:256,?xla:512,?bf16:512",
        retries=0,
    )
    assert res["value"] == 1280.0
    assert res["config"] == "bf16:512"
    assert res["degraded"] is True


def test_best_config_wins():
    res = run_driver({"block:512": 4100.0, "fused:512": 4800.0},
                     "block:512,fused:512")
    assert res["value"] == 4800.0
    assert res["config"] == "fused:512"
    assert res["configs"]["block:512"] == 4100.0
    assert res["degraded"] is False
