#!/usr/bin/env python
"""Unattended executor for the round-3 TPU queue (RUNBOOK_r3_tpu_queue.md).

The relay worker has been UNAVAILABLE since 2026-08-17 ~20:10 UTC and the
queued items (bench evidence, int8 attention benches, train-step microbench,
150k-corpus ViT retrain, CNN/square resumes, shape-OOD evals) must execute
the moment it recovers — including while nobody is watching. This supervisor:

  * waits for the TPU (bounded probe loop, one probe process at a time);
  * runs each queue step as a child process with BOTH an overall timeout and
    a log-growth stall watchdog (mid-epoch tunnel wedges are the observed
    failure mode: the process hangs forever making no progress);
  * kills by exact pid only (never by pattern — CLAUDE.md);
  * retries training steps with --resume from latest.ckpt (the checkpoint
    story is crash-safe; resume replays deterministically);
  * re-probes between steps and pauses the queue while the backend is gone;
  * appends per-step status to experiments/logs/r3queue/status.jsonl.

stdlib only — this process must never import jax (tunnel discipline: a
second jax process alongside an active TPU job can wedge the relay).
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOGDIR = os.path.join(REPO, "experiments", "logs", "r3queue")
STATUS = os.path.join(LOGDIR, "status.jsonl")

PROBE_SRC = (
    "from chess_vision_tpu.utils.platform import apply_platform_env;"
    "apply_platform_env();"
    "import jax, numpy as np, jax.numpy as jnp;"
    "y=(jnp.ones((8,8))@jnp.ones((8,8)));"
    "print('MATMUL OK:', np.asarray(y)[0,0], len(jax.devices()))"
)


def log(msg: str) -> None:
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def record(step: str, **kw) -> None:
    os.makedirs(LOGDIR, exist_ok=True)
    with open(STATUS, "a") as f:
        f.write(json.dumps({"t": time.strftime("%Y-%m-%dT%H:%M:%S"),
                            "step": step, **kw}) + "\n")


def wait_while_held() -> None:
    """Pause while /tmp/tpu_hold exists (the interactive session uses it to
    run CPU-side jax work — pytest, smoke runs — without any chance of
    overlapping a TPU process; see tunnel discipline in CLAUDE.md)."""
    while os.path.exists("/tmp/tpu_hold"):
        log("held by /tmp/tpu_hold; sleeping 60s")
        time.sleep(60)


def probe(timeout_s: int = 300) -> bool:
    """One bounded backend-liveness check (its own process, exact kill)."""
    wait_while_held()
    try:
        out = subprocess.run(
            [sys.executable, "-u", "-c", PROBE_SRC],
            cwd=REPO, capture_output=True, text=True, timeout=timeout_s,
        )
        ok = "MATMUL OK" in (out.stdout + out.stderr)
    except subprocess.TimeoutExpired:
        ok = False
    log(f"probe -> {'UP' if ok else 'down'}")
    return ok


def wait_for_tpu(max_s: float, interval_s: float = 480.0) -> bool:
    t0 = time.time()
    while time.time() - t0 < max_s:
        if probe():
            return True
        time.sleep(interval_s)
    return False


def run_step(name: str, cmd: list[str], timeout_s: float,
             stall_s: float = 1800.0, env: dict | None = None) -> dict:
    """Run cmd; kill (exact pid) on overall timeout or when the log stops
    growing for stall_s. Returns {"rc": int, "why": str, "log": path}."""
    wait_while_held()
    os.makedirs(LOGDIR, exist_ok=True)
    logpath = os.path.join(LOGDIR, f"{name}.log")
    full_env = dict(os.environ, PYTHONUNBUFFERED="1", **(env or {}))
    log(f"step {name}: {' '.join(cmd)}")
    with open(logpath, "a") as lf:
        lf.write(f"\n===== {time.strftime('%Y-%m-%dT%H:%M:%S')} "
                 f"{' '.join(cmd)}\n")
        lf.flush()
        proc = subprocess.Popen(cmd, cwd=REPO, stdout=lf,
                                stderr=subprocess.STDOUT, env=full_env)
        t0 = time.time()
        last_size, last_growth = 0, time.time()
        why = "ok"
        while True:
            rc = proc.poll()
            if rc is not None:
                break
            now = time.time()
            size = os.path.getsize(logpath)
            if size != last_size:
                last_size, last_growth = size, now
            if now - t0 > timeout_s:
                why = f"timeout {timeout_s:.0f}s"
            elif now - last_growth > stall_s:
                why = f"stalled {stall_s:.0f}s (no log growth)"
            if why != "ok":
                log(f"step {name}: {why} — SIGTERM pid {proc.pid}")
                proc.send_signal(signal.SIGTERM)
                try:
                    rc = proc.wait(timeout=60)
                except subprocess.TimeoutExpired:
                    proc.kill()
                    rc = proc.wait()
                break
            time.sleep(20)
    res = {"rc": rc, "why": why, "log": logpath,
           "wall_s": round(time.time() - t0, 1)}
    log(f"step {name}: rc={rc} ({why}, {res['wall_s']}s)")
    record(name, **res)
    return res


def bench_value(logpath: str):
    """Last JSON line's 'value' from a bench log (None if absent)."""
    try:
        with open(logpath) as f:
            for line in reversed(f.readlines()):
                line = line.strip()
                if line.startswith("{"):
                    return json.loads(line).get("value")
    except (OSError, json.JSONDecodeError):
        pass
    return None


def train_with_retries(name: str, base_cmd: list[str], ckpt_dir: str,
                       timeout_s: float, stall_s: float,
                       attempts: int = 4, fresh_first: bool = False) -> bool:
    """Run a training step; on wedge/crash, re-probe and resume from
    latest.ckpt. fresh_first=True starts attempt 0 without --resume."""
    latest = os.path.join(ckpt_dir, "latest.ckpt")
    for attempt in range(attempts):
        cmd = list(base_cmd)
        if (not fresh_first or attempt > 0) and os.path.exists(latest):
            cmd = cmd[:2] + ["--resume", latest] + cmd[2:]
        res = run_step(f"{name}_a{attempt}", cmd, timeout_s, stall_s)
        if res["rc"] == 0:
            return True
        log(f"{name}: attempt {attempt} failed — re-probing before retry")
        if not wait_for_tpu(max_s=3600):
            log(f"{name}: backend gone >1h, abandoning this step")
            return False
    return False


def main() -> None:
    os.makedirs(LOGDIR, exist_ok=True)
    only = sys.argv[sys.argv.index("--only") + 1].split(",") \
        if "--only" in sys.argv else None

    def enabled(step: str) -> bool:
        return only is None or step in only

    record("runner_start", pid=os.getpid(), only=only)
    if not wait_for_tpu(max_s=float(
            os.environ.get("CVT_QUEUE_WAIT_H", "10")) * 3600):
        record("runner_end", ok=False, reason="tpu never came up")
        log("TPU never came up within the wait budget; exiting")
        return

    py = sys.executable

    # -- 1. driver-style bench (headline evidence) ------------------------
    if enabled("bench"):
        run_step("bench_default", [py, "bench.py"], timeout_s=900)
        # host-pipeline proof, device leg (VERDICT r3 #4): serving dispatch
        # loop with H2D mocked as instant + concurrent decode pool
        run_step("hostpipe_replay",
                 [py, "experiments/host_pipeline.py", "replay", "512", "20"],
                 timeout_s=1200)

    # -- 2. attention int8 QK / PV benches + accuracy data ----------------
    if enabled("attn"):
        run_step("bench_attn_qk", [py, "bench.py"], timeout_s=900,
                 env={"CHESS_VISION_ATTN_QK": "int8"})
        run_step("bench_attn_pv", [py, "bench.py"], timeout_s=900,
                 env={"CHESS_VISION_ATTN_QK": "int8pv"})
        v0 = bench_value(os.path.join(LOGDIR, "bench_default.log"))
        vq = bench_value(os.path.join(LOGDIR, "bench_attn_qk.log"))
        vp = bench_value(os.path.join(LOGDIR, "bench_attn_pv.log"))
        log(f"bench: default={v0} qk={vq} pv={vp}")
        # accuracy evidence for the candidate modes (cheap; gather always)
        for mode in ("int8", "int8pv"):
            run_step(f"int8_eval_attn_{mode}", [
                py, "experiments/int8_eval.py",
                "--checkpoint", "/root/ckpt_vit/best.ckpt",
                "--test-dir", "data/test", "--max-samples", "512",
            ], timeout_s=1800, env={"CHESS_VISION_ATTN_QK": mode})

    # -- 3. compute-bound train-step throughput (VERDICT r2 #6) -----------
    if enabled("trainbench"):
        run_step("microbench_train_256",
                 [py, "experiments/microbench.py", "train", "256", "8"],
                 timeout_s=1200)
        run_step("microbench_train_128",
                 [py, "experiments/microbench.py", "train", "128", "8"],
                 timeout_s=1200)
        # full variant sweep (aug/dropout/remat=attn_out/noremat/xla-attn):
        # the VERDICT r3 #2 evidence — which recompute the bwd pass pays for
        run_step("microbench_train_bisect_256",
                 [py, "experiments/microbench.py", "train_bisect", "256"],
                 timeout_s=2400)

    # -- 4b. round-4 corpus ViT retrain (VERDICT r3 #3/#6: spline-procedural
    # styles + geometry jitter + human-policy self-play corpus) ------------
    if enabled("vit_r4"):
        train_with_retries(
            "train_vit_r4",
            [py, "train.py", "--config", "configs/vit_tpu.yaml", "--set",
             "model.pretrained=false", "data.transport=ycbcr420",
             "data.num_workers=8", "data.max_samples=120000",
             "data.ood_val_dir=data/test_random",
             "data.device_cache=true", "data.device_cache_budget_gb=12",
             "data.device_cache_chunk=16",
             "training.epochs=10", "training.batch_size=128",
             "training.lr=0.0002",
             "checkpointing.save_dir=/root/ckpt_vit_r4",
             "logging.tensorboard_dir=/root/runs_vit_r4"],
            ckpt_dir="/root/ckpt_vit_r4",
            timeout_s=7 * 3600, stall_s=2400, fresh_first=True)
    if enabled("evals_r4") and os.path.exists("/root/ckpt_vit_r4/best.ckpt"):
        for tag, tdir, cap in (
            ("geo", "data/test_geo", None),
            ("lathe", "data/test_lathe", None),          # cross-grammar OOD
            ("spline", "data/test_spline_holdout", None),  # within-grammar
            ("random", "data/test_random", "2048"),
            ("test", "data/test", "2048"),
        ):
            cmd = [py, "evaluate.py",
                   "--checkpoint", "/root/ckpt_vit_r4/best.ckpt",
                   "--test-dir", tdir, "--batch-size", "64"]
            if cap:
                cmd += ["--max-samples", cap]
            run_step(f"eval_vit_r4_{tag}", cmd, timeout_s=3600, stall_s=900)
        run_step("int8_eval_vit_r4", [
            py, "experiments/int8_eval.py",
            "--checkpoint", "/root/ckpt_vit_r4/best.ckpt",
            "--test-dir", "data/test", "--max-samples", "512",
        ], timeout_s=1800)
        # tunnel H2D bandwidth swings ~700x between windows; re-capture the
        # headline + replay in whatever window the long retrain ends in
        run_step("bench_retry", [py, "bench.py"], timeout_s=900)
        run_step("hostpipe_replay_retry",
                 [py, "experiments/host_pipeline.py", "replay", "512", "20"],
                 timeout_s=1200)

    # -- 4. 150k-corpus ViT retrain (VERDICT r2 #8) ------------------------
    if enabled("vit150"):
        train_with_retries(
            "train_vit150",
            # 120k of the 135k corpus: the full set of YCbCr planes (12.9 GB)
            # plus params+opt (1.0 GB) and remat activations does not fit the
            # 16 GB HBM; 120k caches 11.3 GB and leaves headroom.
            [py, "train.py", "--config", "configs/vit_tpu.yaml", "--set",
             "model.pretrained=false", "data.transport=ycbcr420",
             "data.num_workers=8", "data.max_samples=120000",
             "data.ood_val_dir=data/test_random",
             "data.device_cache=true", "data.device_cache_budget_gb=12",
             "data.device_cache_chunk=16",
             "training.epochs=10", "training.batch_size=128",
             "training.lr=0.0002",
             "checkpointing.save_dir=/root/ckpt_vit150",
             "logging.tensorboard_dir=/root/runs_vit150"],
            ckpt_dir="/root/ckpt_vit150",
            timeout_s=7 * 3600, stall_s=2400, fresh_first=True)

    # -- 5. post-retrain shape-OOD evals (geo now in-pool; lathe held out) -
    if enabled("evals") and os.path.exists("/root/ckpt_vit150/best.ckpt"):
        for tag, tdir, cap in (
            ("geo", "data/test_geo", None),
            ("lathe", "data/test_lathe", None),
            ("random", "data/test_random", "2048"),
            ("test", "data/test", "2048"),
        ):
            cmd = [py, "evaluate.py",
                   "--checkpoint", "/root/ckpt_vit150/best.ckpt",
                   "--test-dir", tdir, "--batch-size", "64"]
            if cap:
                cmd += ["--max-samples", cap]
            run_step(f"eval_vit150_{tag}", cmd, timeout_s=3600, stall_s=900)
        # serving-accuracy claim refreshed on the newest flagship: bf16 vs
        # int8 (whatever attention mode is default) through the exact
        # serving stack
        run_step("int8_eval_vit150", [
            py, "experiments/int8_eval.py",
            "--checkpoint", "/root/ckpt_vit150/best.ckpt",
            "--test-dir", "data/test", "--max-samples", "512",
        ], timeout_s=1800)

    # -- 6. CNN resume to epoch 3 (VERDICT r2 #5 depth) --------------------
    if enabled("cnn"):
        train_with_retries(
            "train_cnn_resume",
            [py, "train.py", "--config", "configs/cnn_tpu.yaml", "--set",
             "model.pretrained=false", "data.transport=ycbcr420",
             "data.num_workers=4", "data.max_samples=50000",
             "data.ood_val_dir=data/test_random",
             "data.device_cache_chunk=16",
             "training.epochs=3", "training.batch_size=128",
             "training.lr=0.0002",
             "checkpointing.save_dir=/root/ckpt_cnn",
             "logging.tensorboard_dir=/root/runs_cnn"],
            ckpt_dir="/root/ckpt_cnn",
            timeout_s=3 * 3600, stall_s=2400)

    # -- 7. square resume (pin max_samples — ckpt split predates 150k) -----
    if enabled("square"):
        train_with_retries(
            "train_square_resume",
            [py, "train.py", "--config", "configs/square_tpu.yaml", "--set",
             "model.pretrained=false", "model.pin_backbone_bn=false",
             "data.transport=ycbcr420", "data.max_samples=50000",
             "data.ood_val_dir=data/test_random",
             "data.device_cache_chunk=16",
             "training.batch_size=128", "training.lr=0.0003",
             "training.epochs=10",
             "checkpointing.save_dir=/root/ckpt_square",
             "logging.tensorboard_dir=/root/runs_sq"],
            ckpt_dir="/root/ckpt_square",
            timeout_s=3 * 3600, stall_s=2400)

    # -- 8. CNN from scratch on the full 120k-cap corpus -------------------
    # (runs 07/09 saw only a 50k sample; epochs cost ~2 min at the measured
    # 908 img/s, so reference-scale data is now cheap for the 28M arch)
    if enabled("cnn120"):
        train_with_retries(
            "train_cnn120",
            [py, "train.py", "--config", "configs/cnn_tpu.yaml", "--set",
             "model.pretrained=false", "data.transport=ycbcr420",
             # 96k, not the 120k ViT cap: ConvNeXt trains without remat, so
             # its fwd+bwd activations (~6 GB at b=128/256px) must fit next
             # to the cache (96k = 8.9 GB); 120k OOM'd (queue log a0).
             "data.num_workers=8", "data.max_samples=96000",
             "data.ood_val_dir=data/test_random",
             "data.device_cache=true", "data.device_cache_budget_gb=10",
             "data.device_cache_chunk=16",
             "training.epochs=6", "training.batch_size=128",
             "training.lr=0.0002",
             "checkpointing.save_dir=/root/ckpt_cnn120",
             "logging.tensorboard_dir=/root/runs_cnn120"],
            ckpt_dir="/root/ckpt_cnn120",
            timeout_s=4 * 3600, stall_s=2400, fresh_first=True)
        if os.path.exists("/root/ckpt_cnn120/best.ckpt"):
            for tag, tdir, cap in (("test", "data/test", "2048"),
                                   ("random", "data/test_random", "2048"),
                                   ("lathe", "data/test_lathe", None)):
                cmd = [py, "evaluate.py",
                       "--checkpoint", "/root/ckpt_cnn120/best.ckpt",
                       "--test-dir", tdir, "--batch-size", "64"]
                if cap:
                    cmd += ["--max-samples", cap]
                run_step(f"eval_cnn120_{tag}", cmd, timeout_s=3600,
                         stall_s=900)

    # -- 9. square model from scratch on the full 120k-cap corpus ----------
    if enabled("square120"):
        train_with_retries(
            "train_square120",
            [py, "train.py", "--config", "configs/square_tpu.yaml", "--set",
             "model.pretrained=false", "model.pin_backbone_bn=false",
             "data.transport=ycbcr420",
             # square backbone sees 64 crops/board (effective batch 8192):
             # same activation-headroom reasoning as the CNN step
             "data.num_workers=8", "data.max_samples=96000",
             "data.ood_val_dir=data/test_random",
             "data.device_cache=true", "data.device_cache_budget_gb=10",
             "data.device_cache_chunk=16",
             "training.batch_size=128", "training.lr=0.0003",
             "training.epochs=10",
             "checkpointing.save_dir=/root/ckpt_square120",
             "logging.tensorboard_dir=/root/runs_sq120"],
            ckpt_dir="/root/ckpt_square120",
            timeout_s=4 * 3600, stall_s=2400, fresh_first=True)
        if os.path.exists("/root/ckpt_square120/best.ckpt"):
            run_step("eval_square120_test", [
                py, "evaluate.py",
                "--checkpoint", "/root/ckpt_square120/best.ckpt",
                "--test-dir", "data/test", "--batch-size", "64",
                "--max-samples", "2048"], timeout_s=3600, stall_s=900)

    # -- 10. post-augfix compute-bound train-step rate at b=256 ------------
    if enabled("trainbench2"):
        run_step("microbench_train_256_postfix",
                 [py, "experiments/microbench.py", "train", "256", "8"],
                 timeout_s=1800)

    # -- 11. round-4b follow-ups: geo eval retry, fused-block layout A/B,
    # trainbench with the Pallas attention backward now on by default ------
    if enabled("r4b"):
        run_step("eval_vit_r4_geo_retry", [
            py, "evaluate.py", "--checkpoint", "/root/ckpt_vit_r4/best.ckpt",
            "--test-dir", "data/test_geo", "--batch-size", "64",
        ], timeout_s=3600, stall_s=900)
        # serving layout A/B under calibrated shifts: block (default) vs the
        # whole-block fused kernel vs the flat M-blocked revisit (VERDICT #1)
        run_step("bench_fused", [py, "bench.py"], timeout_s=900,
                 env={"CHESS_VISION_INT8_LAYOUT": "fused"})
        run_step("bench_flat_calib", [py, "bench.py"], timeout_s=900,
                 env={"CHESS_VISION_INT8_LAYOUT": "flat"})
        run_step("bench_block", [py, "bench.py"], timeout_s=900)
        v_f = bench_value(os.path.join(LOGDIR, "bench_fused.log"))
        v_fl = bench_value(os.path.join(LOGDIR, "bench_flat_calib.log"))
        v_b = bench_value(os.path.join(LOGDIR, "bench_block.log"))
        log(f"layout A/B: fused={v_f} flat={v_fl} block={v_b}")
        # accuracy gate for the fused path (must match block-layout int8)
        run_step("int8_eval_fused", [
            py, "experiments/int8_eval.py",
            "--checkpoint", "/root/ckpt_vit_r4/best.ckpt",
            "--test-dir", "data/test", "--max-samples", "512",
        ], timeout_s=1800, env={"CHESS_VISION_INT8_LAYOUT": "fused"})
        # train-step rate with the Pallas flash backward (cac5b95) active
        run_step("microbench_train_256_pallasbwd",
                 [py, "experiments/microbench.py", "train", "256", "8"],
                 timeout_s=1800)
        run_step("microbench_train_bisect_pallasbwd",
                 [py, "experiments/microbench.py", "train_bisect", "256"],
                 timeout_s=2400)
        # larger batch fills the MXU pipeline deeper; the flash backward
        # removed the (B, H, N, N) score tensors that made 512 OOM-risky
        run_step("microbench_train_512_pallasbwd",
                 [py, "experiments/microbench.py", "train", "512", "8"],
                 timeout_s=1800)

    # -- 11b. r4c: retry the two infra-failed layout benches (fused stalled
    # on a 480 s upload wedge; block hit a transient remote-compile 500) ---
    if enabled("r4c"):
        run_step("bench_fused_retry", [py, "bench.py"], timeout_s=1200,
                 env={"CHESS_VISION_INT8_LAYOUT": "fused"})
        run_step("bench_block_retry", [py, "bench.py"], timeout_s=1200)
        v_f = bench_value(os.path.join(LOGDIR, "bench_fused_retry.log"))
        v_b = bench_value(os.path.join(LOGDIR, "bench_block_retry.log"))
        log(f"layout retry: fused={v_f} block={v_b}")
        # full train step WITHOUT remat (the flash bwd freed the memory;
        # bisect showed noaug+noremat 700 img/s — base+noremat projects
        # ~646 vs the 614 reference target)
        run_step("microbench_train_256_noremat",
                 [py, "experiments/microbench.py", "train", "256", "8",
                  "false"], timeout_s=1800)
        run_step("microbench_train_512_noremat",
                 [py, "experiments/microbench.py", "train", "512", "8",
                  "false"], timeout_s=1800)

    # -- 11c. noremat train-step measurements (queued in r4c; never ran —
    # the VM restarted after the two bench retries wedged) ------------------
    if enabled("noremat"):
        run_step("microbench_train_256_noremat",
                 [py, "experiments/microbench.py", "train", "256", "8",
                  "false"], timeout_s=1500, stall_s=600)
        run_step("microbench_train_512_noremat",
                 [py, "experiments/microbench.py", "train", "512", "8",
                  "false"], timeout_s=1500, stall_s=600)

    # -- 11d. layout A/B: bench.py's driver mode (round 5) now owns the
    # retry/fallback logic — per-config subprocesses, transient-failure
    # retries, fused->block / 512->256 fallback, one JSON with per-config
    # values. One step replaces the hand-rolled r4d retry loops (which
    # benched fused at the batch-512 config that deterministically failed
    # to compile — advisor r4 finding). --------------------------------------
    if enabled("r4d"):
        run_step("bench_layout_ab", [
            py, "bench.py", "--configs",
            "block:512,fused:512,fused:256,block:256", "--budget", "2400",
        ], timeout_s=2600, stall_s=2600)

    # -- 12. full_fen parity run: r3-style fixed pool + human-policy labels
    # (datagen_parity.yaml must be rendered first — CPU-only, ~30 min) -----
    if enabled("parity") and os.path.exists("data/train_parity/manifest.csv"):
        train_with_retries(
            "train_vit_parity",
            [py, "train.py", "--config", "configs/vit_tpu.yaml", "--set",
             "model.pretrained=false", "data.transport=ycbcr420",
             "data.num_workers=8", "data.max_samples=120000",
             "data.train_dir=data/train_parity",
             "data.ood_val_dir=data/test_random",
             "data.device_cache=true", "data.device_cache_budget_gb=12",
             "data.device_cache_chunk=16",
             "training.epochs=10", "training.batch_size=128",
             "training.lr=0.0002",
             "checkpointing.save_dir=/root/ckpt_vit_parity",
             "logging.tensorboard_dir=/root/runs_vit_parity"],
            ckpt_dir="/root/ckpt_vit_parity",
            timeout_s=7 * 3600, stall_s=2400, fresh_first=True)
        if os.path.exists("/root/ckpt_vit_parity/best.ckpt"):
            run_step("eval_vit_parity_test", [
                py, "evaluate.py",
                "--checkpoint", "/root/ckpt_vit_parity/best.ckpt",
                "--test-dir", "data/test_parity", "--batch-size", "64",
                "--max-samples", "2048"], timeout_s=3600, stall_s=900)
            run_step("eval_vit_parity_lathe", [
                py, "evaluate.py",
                "--checkpoint", "/root/ckpt_vit_parity/best.ckpt",
                "--test-dir", "data/test_lathe", "--batch-size", "64",
            ], timeout_s=3600, stall_s=900)

    # ======================= round 5 =======================

    # -- r5a. parity-model evals (the parity train itself runs in the
    # foreground session; this picks up its checkpoint) ---------------------
    if enabled("r5evalparity") and os.path.exists(
            "/root/ckpt_vit_parity/best.ckpt"):
        ck = "/root/ckpt_vit_parity/best.ckpt"
        run_step("eval_parity_test", [
            py, "evaluate.py", "--checkpoint", ck,
            "--test-dir", "data/test_parity", "--batch-size", "64",
        ], timeout_s=3600, stall_s=1200)
        for split in ("test_lathe", "test_spline_holdout", "test_random"):
            if os.path.exists(f"data/{split}"):
                run_step(f"eval_parity_{split}", [
                    py, "evaluate.py", "--checkpoint", ck,
                    "--test-dir", f"data/{split}", "--batch-size", "64",
                ], timeout_s=2400, stall_s=1200)

    # -- r5b. serving bench: one PATIENT single-config compile first (today's
    # helper crawls but caches persist — one success makes every later run
    # warm), then the full driver chain --------------------------------------
    if enabled("r5bench"):
        run_step("bench_patient_block512", [
            py, "bench.py", "--single", "--layout", "block",
            "--batch", "512", "--budget", "2700",
        ], timeout_s=2900, stall_s=2900)
        run_step("bench_driver_r5", [py, "bench.py", "--budget", "2400"],
                 timeout_s=2700, stall_s=2700)

    # -- r5c. production-path >=600 img/s evidence (VERDICT r4 #4): a real
    # train.py run whose device cache is small enough that model.remat=auto
    # resolves to False (55k ycbcr420 ~ 5.4 GB) ------------------------------
    if enabled("r5prod"):
        train_with_retries(
            "train_prod600",
            [py, "train.py", "--config", "configs/vit_tpu.yaml", "--set",
             "model.pretrained=false", "data.transport=ycbcr420",
             "data.num_workers=2", "data.max_samples=55000",
             "data.train_dir=data/train_parity",
             "data.test_dir=data/test_parity", "data.ood_val_dir=null",
             "data.device_cache=true", "data.device_cache_chunk=16",
             "training.epochs=2", "training.batch_size=256",
             "checkpointing.save_dir=/root/ckpt_prod600",
             "logging.tensorboard_dir=/root/runs_prod600"],
            ckpt_dir="/root/ckpt_prod600",
            timeout_s=3 * 3600, stall_s=2400, fresh_first=True)

    # -- r5d. square-model turn head A/B (VERDICT r4 #6): identical recipes
    # +- model.turn_color_stats; the evals' grouped metrics expose
    # highlighted-vs-not turn accuracy ---------------------------------------
    if enabled("r5square"):
        for tag, flag in (("base", "false"), ("stats", "true")):
            run_ok = train_with_retries(
                f"train_square_{tag}",
                [py, "train.py", "--config", "configs/square_tpu.yaml",
                 "--set", "model.pretrained=false",
                 "model.pin_backbone_bn=false",
                 f"model.turn_color_stats={flag}",
                 "data.transport=ycbcr420", "data.num_workers=2",
                 "data.max_samples=30000",
                 "data.train_dir=data/train_parity",
                 "data.test_dir=data/test_parity", "data.ood_val_dir=null",
                 "training.epochs=4",
                 f"checkpointing.save_dir=/root/ckpt_square_{tag}",
                 f"logging.tensorboard_dir=/root/runs_square_{tag}"],
                ckpt_dir=f"/root/ckpt_square_{tag}",
                timeout_s=4 * 3600, stall_s=2400, fresh_first=True)
            ck = f"/root/ckpt_square_{tag}/latest.ckpt"
            if run_ok and os.path.exists(ck):
                run_step(f"eval_square_{tag}", [
                    py, "evaluate.py", "--checkpoint", ck,
                    "--test-dir", "data/test_parity", "--batch-size", "64",
                    "--max-samples", "3000",
                ], timeout_s=2400, stall_s=1200)

    # -- r5e. OOD retrain on the round-5 corpus (VERDICT r4 #7: more random
    # share + wider spline grammar) + the full holdout table -----------------
    if enabled("r5ood"):
        train_with_retries(
            "train_vit_r5",
            [py, "train.py", "--config", "configs/vit_tpu.yaml", "--set",
             "model.pretrained=false", "data.transport=ycbcr420",
             "data.num_workers=2", "data.max_samples=120000",
             "data.train_dir=data/train", "data.test_dir=data/test",
             "data.ood_val_dir=null", "data.device_cache=true",
             "data.device_cache_budget_gb=12", "data.device_cache_chunk=16",
             "training.epochs=10", "training.batch_size=128",
             "training.lr=0.0002",
             "checkpointing.save_dir=/root/ckpt_vit_r5",
             "logging.tensorboard_dir=/root/runs_vit_r5"],
            ckpt_dir="/root/ckpt_vit_r5",
            timeout_s=7 * 3600, stall_s=2400, fresh_first=True)
        ck5 = "/root/ckpt_vit_r5/best.ckpt"
        if os.path.exists(ck5):
            for split in ("test", "test_random", "test_geo", "test_lathe",
                          "test_spline_holdout"):
                run_step(f"eval_r5_{split}", [
                    py, "evaluate.py", "--checkpoint", ck5,
                    "--test-dir", f"data/{split}", "--batch-size", "64",
                    "--max-samples", "3000",
                ], timeout_s=2400, stall_s=1200)

    # -- r5e2. reduced-scale OOD retrain: the 108k upload stalled the tunnel
    # twice (square_base, train_vit_r5 attempt 0); 4.7 GB-class uploads
    # demonstrably complete (prod600), so probe the r5 corpus levers at 55k
    # with the fast b=256/noremat recipe instead of losing the item --------
    if enabled("r5ood2"):
        train_with_retries(
            "train_vit_r5b",
            [py, "train.py", "--config", "configs/vit_tpu.yaml", "--set",
             "model.pretrained=false", "data.transport=ycbcr420",
             "data.num_workers=2", "data.max_samples=55000",
             "data.train_dir=data/train", "data.test_dir=data/test",
             "data.ood_val_dir=null", "data.device_cache=true",
             "data.device_cache_chunk=16",
             "training.epochs=10", "training.batch_size=256",
             "checkpointing.save_dir=/root/ckpt_vit_r5b",
             "logging.tensorboard_dir=/root/runs_vit_r5b"],
            ckpt_dir="/root/ckpt_vit_r5b",
            timeout_s=2 * 3600, stall_s=1500, fresh_first=True)
        ck5 = "/root/ckpt_vit_r5b/best.ckpt"
        if os.path.exists(ck5):
            for split in ("test_lathe", "test_spline_holdout", "test_random",
                          "test_geo", "test"):
                run_step(f"eval_r5b_{split}", [
                    py, "evaluate.py", "--checkpoint", ck5,
                    "--test-dir", f"data/{split}", "--batch-size", "64",
                    "--max-samples", "2000",
                ], timeout_s=2400, stall_s=1200)

    # -- r5f. hybrid serving layout (round-5 compile-helper escape hatch #2:
    # XLA int8 matmuls + fused_rowquant + plain Pallas attention, scanned) —
    # throughput + accuracy gate, then the full driver chain for the record -
    if enabled("r5hybrid"):
        run_step("bench_hybrid512", [
            py, "bench.py", "--single", "--layout", "hybrid",
            "--batch", "512", "--budget", "900",
        ], timeout_s=1100, stall_s=1100)
        ck = next((c for c in ("/root/ckpt_vit_r5/best.ckpt",
                               "/root/ckpt_vit_parity/best.ckpt")
                   if os.path.exists(c)), None)
        if ck:
            td = ("data/test_parity" if "parity" in ck else "data/test")
            run_step("int8_eval_hybrid", [
                py, "experiments/int8_eval.py", "--checkpoint", ck,
                "--test-dir", td, "--max-samples", "512",
            ], timeout_s=1800, stall_s=1200,
                env={"CHESS_VISION_INT8_LAYOUT": "hybrid"})

    # -- r5g. full driver-chain record (separate group: the round-end BENCH
    # capture runs the same chain; schedule this only if time permits) ------
    if enabled("r5benchfinal"):
        run_step("bench_driver_r5h", [py, "bench.py", "--budget", "2400"],
                 timeout_s=2700, stall_s=2700)

    record("runner_end", ok=True)
    log("queue complete")


if __name__ == "__main__":
    main()
