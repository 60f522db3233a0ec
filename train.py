#!/usr/bin/env python
"""Train a chess-recognition model on TPU (or CPU for smoke runs).

CLI parity with the reference (train.py:220-227):
    python train.py --config configs/vit.yaml [--resume ckpt]
        [--reset-schedule] [--set training.epochs=2 data.max_samples=50 ...]

TPU-native differences: one jitted+donated train step (device-side augment,
bf16 compute, fused loss/backward/AdamW, on-device metric sums), data-parallel
sharding over a jax mesh (same code for 1 chip or a v5e-8 slice), msgpack
self-describing checkpoints.
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import numpy as np

from chess_vision_tpu.config import apply_overrides, get_data_config, load_config
from chess_vision_tpu.data import BatchLoader, ChessDataset, seeded_split
from chess_vision_tpu.models import build_model, param_count
from chess_vision_tpu.parallel.mesh import (
    make_mesh,
    make_mesh_2d,
    param_sharding,
    replicated,
)
from chess_vision_tpu.train.loop import (
    jit_steps,
    make_steps,
    run_eval_epoch,
    run_eval_epoch_gathered,
    run_eval_epoch_scan,
    run_train_epoch,
    run_train_epoch_gathered,
    run_train_epoch_scan,
)
from chess_vision_tpu.train.state import compute_class_weights, create_train_state
from chess_vision_tpu.utils.checkpoint import (
    load_checkpoint,
    restore_tree,
    save_checkpoint,
)
from chess_vision_tpu.utils.logging import (
    MetricLogger,
    update_run_meta,
    write_run_meta,
)


def init_model_variables(model, cfg, rng_seed: int = 0):
    from chess_vision_tpu.models import init_variables

    size = cfg["model"].get("input_size") or 224
    return init_variables(model, size, seed=rng_seed)


def maybe_load_pretrained(variables, cfg) -> tuple[dict, bool]:
    """Load converted pretrained backbone weights if available.

    The reference pulls timm hub weights (models/vit.py:57). Offline, converted
    checkpoints are looked up at model.pretrained_path or
    pretrained/<model name>.ckpt; missing files fall back to random init with
    a warning (pretrained init is load-bearing for OOD accuracy —
    EXPERIMENT_RUNS.md:32-35).
    """
    if not cfg["model"].get("pretrained", False):
        return variables, False
    path = cfg["model"].get("pretrained_path") or os.path.join(
        "pretrained", cfg["model"]["name"] + ".ckpt"
    )
    if not os.path.exists(path):
        print(f"WARNING: pretrained weights not found at {path}; "
              "using random init (run the timm->jax converter to create them)")
        return variables, False
    from chess_vision_tpu.convert import load_pretrained_backbone

    variables = load_pretrained_backbone(variables, path)
    print(f"Loaded pretrained backbone from {path}")
    return variables, True


def _start_keepalive(interval_s: float = 20.0):
    """Round-trip a scalar through the device every interval_s until stopped.

    Round-5 diagnosis (SIGUSR1 stack dumps): after the backend initializes,
    several MINUTES of host-only startup work (dataset scan, fen counting)
    pass before the first real device op — and over the relay-tunnelled
    backend that first post-idle round-trip hangs indefinitely (a fresh
    process probing immediately completes in <1 s).  Keeping the session
    warm with a trivial op closes the idle window. Returns a stop() fn."""
    import threading

    stop = threading.Event()

    def body():
        import jax

        while not stop.wait(interval_s):
            try:
                np.asarray(jax.device_put(np.float32(0.0)))
            except Exception:
                return  # backend gone; the main thread will surface it

        # one last warm-up op right as the main thread resumes device work
        try:
            np.asarray(jax.device_put(np.float32(0.0)))
        except Exception:
            pass

    t = threading.Thread(target=body, daemon=True, name="tpu-keepalive")
    t.start()
    return stop.set


def _stage(msg: str) -> None:
    """Startup-stage heartbeat on stderr: the remote-compile/tunnel backend
    can stall any early device interaction for many minutes (round-5 infra),
    and without these lines a stuck launch is indistinguishable from a slow
    one. SIGUSR1 dumps all thread stacks (faulthandler) for live diagnosis."""
    import sys

    print(f"    [stage {time.strftime('%H:%M:%S')}] {msg}",
          file=sys.stderr, flush=True)


def main():
    import faulthandler
    import signal as _signal

    faulthandler.register(_signal.SIGUSR1, all_threads=True)
    from chess_vision_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    parser = argparse.ArgumentParser(description="Train chess recognition model")
    parser.add_argument("--config", default="configs/vit.yaml")
    parser.add_argument("--resume", default=None)
    parser.add_argument("--reset-schedule", action="store_true",
                        help="Keep weights only when resuming (warm restart)")
    parser.add_argument("--set", nargs="*", default=[],
                        help="Override config values, e.g. training.epochs=10")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--auto-resume", action="store_true",
                        help="Resume from <save_dir>/latest.ckpt when present "
                             "(crash recovery without repeating the flag)")
    parser.add_argument("--profile-steps", type=int, default=0,
                        help="Capture a jax.profiler trace of the first N "
                             "steps of epoch 1 into the TensorBoard dir")
    args = parser.parse_args()

    cfg = load_config(args.config)
    apply_overrides(cfg, args.set)

    if cfg["training"].get("debug_nans", False):
        # numeric race/corruption detector (SURVEY.md §5: the jax analogue of
        # the reference's absent sanitizers)
        jax.config.update("jax_debug_nans", True)

    if args.auto_resume and not args.resume:
        candidate = os.path.join(
            cfg["checkpointing"]["save_dir"], "latest.ckpt"
        )
        if os.path.exists(candidate):
            args.resume = candidate
            print(f"Auto-resuming from {candidate}")

    # --- Mesh (parallelism surface) ---
    # training.tensor_parallel=T shards every transformer block's matmuls
    # over the "model" axis of a (data, model) mesh (Megatron-style column/
    # row-parallel, annotation-only — XLA GSPMD inserts the collectives);
    # training.fsdp=true additionally shards the remaining large params over
    # the data axis. Defaults: pure batch DP, params replicated.
    tp = int(cfg["training"].get("tensor_parallel", 1) or 1)
    fsdp_flag = str(cfg["training"].get("fsdp", False)).lower() in (
        "true", "1", "yes")
    if tp > 1:
        # The single-tile Pallas attention custom call cannot be partitioned
        # by GSPMD over the model axis; the XLA attention math can.
        os.environ.setdefault("CHESS_VISION_NO_PALLAS_ATTN", "1")
        mesh = make_mesh_2d(tp)
        print(f"Tensor parallel: model axis {tp} wide (XLA attention path)")
    else:
        mesh = make_mesh()
    n_dev = mesh.devices.size
    if n_dev > 1:
        # Pallas custom calls carry no GSPMD partitioning rules: on a real
        # multi-chip mesh the batch-parallel attention kernel would be
        # treated as replicated (full-batch gather per chip) rather than
        # sharded. The XLA attention math partitions cleanly over any axis.
        # (CPU test meshes never reach the kernel — the dispatch in
        # ops/attention.py already falls back off-TPU.)
        os.environ.setdefault("CHESS_VISION_NO_PALLAS_ATTN", "1")
    n_data = mesh.shape.get("data", n_dev) if tp > 1 else n_dev
    print(f"Devices: {n_dev} x {jax.devices()[0].device_kind}")
    # Keep the device session warm through the host-only startup phases
    # (dataset scan / class weights): see _start_keepalive.
    stop_keepalive = _start_keepalive()

    # --- Data ---
    input_size = cfg["model"].get("input_size") or 224
    data_cfg = get_data_config(cfg["model"]["name"])
    max_samples = cfg["data"].get("max_samples")
    cache_decoded = bool(cfg["data"].get("cache_decoded", True))
    cache_budget_gb = float(cfg["data"].get("cache_budget_gb", 8.0))
    dataset = ChessDataset(
        cfg["data"]["train_dir"], max_samples=max_samples,
        input_size=input_size, cache_decoded=cache_decoded,
        cache_budget_gb=cache_budget_gb,
    )
    train_idx, val_idx = seeded_split(
        len(dataset), cfg["data"]["val_split"], seed=42
    )
    batch_size = cfg["training"]["batch_size"]
    if batch_size % n_data != 0:
        raise ValueError(
            f"batch_size {batch_size} must be divisible by the data-axis "
            f"size {n_data}"
        )
    num_workers = cfg["data"].get("num_workers", 6)
    transport = cfg["data"].get("transport", "rgb")
    train_loader = BatchLoader(
        dataset, train_idx, batch_size, shuffle=True, seed=args.seed,
        num_workers=num_workers, drop_remainder=True, transport=transport,
    )
    val_loader = BatchLoader(
        dataset, val_idx, batch_size, num_workers=num_workers,
        transport=transport,
    )
    print(f"Train: {len(train_idx)}, Val: {len(val_idx)}")
    if len(train_loader) == 0:
        raise ValueError("Not enough training samples for one batch")

    ood_loader = None
    ood_dataset = None
    ood_dir = cfg["data"].get("ood_val_dir")
    if ood_dir and os.path.isdir(ood_dir):
        ood_dataset = ChessDataset(
            ood_dir,
            max_samples=cfg["data"].get("ood_val_max_samples", 2000),
            input_size=input_size, cache_decoded=cache_decoded,
            cache_budget_gb=cache_budget_gb,
        )
        ood_loader = BatchLoader(
            ood_dataset, np.arange(len(ood_dataset)), batch_size,
            num_workers=num_workers, transport=transport,
        )
        print(f"OOD val: {len(ood_dataset)} images from {ood_dir}")

    # --- Device-resident dataset mode (data_device.py) ---
    # When the whole corpus fits in HBM next to the train state, upload it
    # once and run scanned epochs with on-device batch gathers: no per-step
    # H2D traffic. Single-device only (multi-chip keeps the streaming +
    # mesh-sharded path). data.device_cache: auto (default) | true | false.
    from chess_vision_tpu.data_device import DeviceData

    # these keys are absent from the reference YAML schema, so --set passes
    # them through as strings (None-typed coercion) — normalize explicitly
    dc_flag = cfg["data"].get("device_cache", "auto")
    if isinstance(dc_flag, str) and dc_flag.lower() != "auto":
        dc_flag = dc_flag.lower() in ("true", "1", "yes")
    dc_budget = float(cfg["data"].get("device_cache_budget_gb", 6.0))
    est = DeviceData.nbytes_estimate(
        len(dataset) + (len(ood_dataset) if ood_dataset else 0), input_size
    )
    # auto only engages for the ycbcr-plane transports: the cache stores
    # 4:2:0 planes, so silently switching an exact-RGB run would change
    # input numerics; say device_cache=true to force it anyway.
    use_device_cache = (
        dc_flag is True
        or (
            dc_flag == "auto"
            and n_dev == 1
            and transport in ("ycbcr420", "packed")
            and est <= dc_budget * 2**30
        )
    ) and n_dev == 1
    if dc_flag is True and n_dev > 1:
        print(f"NOTE: data.device_cache=true ignored on {n_dev} devices — "
              "the device-resident cache is single-chip only; training on "
              "the streaming mesh-sharded path instead")
    train_dd = val_dd = ood_dd = None
    # scanned epochs (default) vs per-step device-gathered batches through
    # the regular loop — the latter still has zero per-step H2D payload but
    # dispatches each step as its own program (debug / fragile-backend knob)
    # Default: per-step gathers. The fully-scanned epochs are opt-in — they
    # are equivalence-tested on CPU meshes, but on the tunnelled v5e the
    # scanned train program crashed the TPU worker ("kernel fault", twice,
    # b=256 and b=128; suspected Pallas-attention-inside-scan miscompile),
    # while the identical per-step programs run fine. Revisit the default
    # once a scanned run survives on real hardware.
    dc_scan = cfg["data"].get("device_cache_scan", False)
    if not isinstance(dc_scan, bool):
        dc_scan = str(dc_scan).lower() in ("true", "1", "yes")
    # data.device_cache_chunk=K (>1) runs K steps per dispatch (gather +
    # step + metrics in one fori_loop program): amortizes the relay RTT —
    # the dominant per-step cost through the tunnel — without the
    # epoch-length loop that faulted the worker in scan mode.
    dc_chunk = cfg["data"].get("device_cache_chunk", 0)
    dc_chunk = int(dc_chunk) if dc_chunk not in (None, "", "null") else 0
    if use_device_cache:
        mode = ("scanned epochs" if dc_scan
                else f"{dc_chunk}-step chunked gathers" if dc_chunk > 1
                else "per-step gathers")
        print(f"Device cache: on ({est / 2**30:.1f} GB est.) — "
              f"uploading dataset to HBM once; {mode}")

    # --- Class weights ---
    class_weights = None
    if cfg["training"].get("use_class_weights", False):
        _stage("class weights (host count + one tiny H2D)")
        class_weights = compute_class_weights(
            [dataset.samples[i] for i in train_idx]
        )
        print(f"Class weights: {class_weights}")

    # --- Auto remat policy (VERDICT r4 #4) ---
    # model.remat defaults to "auto": run with the least rematerialization
    # that fits HBM next to the train state and any device-resident dataset
    # cache. remat=False measured 637 img/s vs full remat's 518.8 at b=256;
    # the policy makes that the shipped default whenever it fits instead of
    # a microbench-only flag.
    from chess_vision_tpu.models import normalize_remat, resolve_remat

    remat_cfg = normalize_remat(cfg["model"].get("remat", "auto"))
    if remat_cfg == "auto" and cfg["model"].get("arch", "vit") == "vit":
        remat_cfg = resolve_remat(
            max(1, batch_size // n_dev),
            device_cache_bytes=float(est) if use_device_cache else 0.0,
        )
        print(f"model.remat=auto -> {remat_cfg} "
              f"(per-device batch {batch_size // max(n_dev, 1)}, "
              f"device cache {est / 2**30:.1f} GB"
              f"{'' if use_device_cache else ' off'})")
    cfg["model"]["remat"] = remat_cfg

    # --- Model / state ---
    model = build_model(cfg)
    _stage("jitted model init (first device compile of this process)")
    variables = init_model_variables(model, cfg, rng_seed=args.seed)
    _stage("model init done")
    stop_keepalive()  # device work is continuous from here on
    variables, _ = maybe_load_pretrained(variables, cfg)
    n_params = param_count(variables["params"])
    print(f"Parameters: {n_params:,}")

    steps_per_epoch = len(train_loader)
    state, schedule = create_train_state(cfg, variables, steps_per_epoch)

    # Place state on the mesh (batch sharded per step inside shard_batch).
    if tp > 1:
        from chess_vision_tpu.parallel.mesh import tp_tree_sharding

        # same suffix rules shard the AdamW moment trees like their params,
        # so the optimizer update stays fully sharded
        shardings = state.replace(
            params=tp_tree_sharding(mesh, state.params, fsdp=fsdp_flag),
            opt_state=tp_tree_sharding(mesh, state.opt_state, fsdp=fsdp_flag),
            batch_stats=jax.tree.map(
                lambda _: replicated(mesh), state.batch_stats),
            step=replicated(mesh),
        )
    else:
        shardings = state.replace(
            params=param_sharding(
                mesh, state.params,
                mode="fsdp" if fsdp_flag else "replicated"),
            opt_state=jax.tree.map(
                lambda _: replicated(mesh), state.opt_state),
            batch_stats=jax.tree.map(
                lambda _: replicated(mesh), state.batch_stats),
            step=replicated(mesh),
        )
    state = jax.device_put(state, shardings)

    # --- Resume ---
    start_epoch = 0
    best_val_acc = 0.0
    if args.resume:
        ckpt = load_checkpoint(args.resume)
        state = state.replace(params=restore_tree(state.params, ckpt["params"]))
        if args.reset_schedule:
            print(f"Loaded weights from {args.resume}, reset schedule (warm restart)")
        else:
            state = state.replace(
                opt_state=restore_tree(state.opt_state, ckpt["opt_state"]),
                batch_stats=restore_tree(state.batch_stats, ckpt["batch_stats"]),
                step=np.asarray(ckpt["step"], np.int32),
            )
            start_epoch = ckpt["epoch"] + 1
            best_val_acc = ckpt.get("best_val_acc", 0.0)
            print(f"Resumed from epoch {start_epoch}")
        state = jax.device_put(state, shardings)

    # --- Steps ---
    train_step, eval_step = make_steps(
        model, cfg, class_weights, data_cfg["mean"], data_cfg["std"]
    )
    gtrain = geval = None
    if not use_device_cache:
        # streaming path jits the per-batch steps; device-cache paths build
        # their own fused programs (scan chunks or gathered per-step)
        train_step, eval_step = jit_steps(train_step, eval_step)
    elif not dc_scan:
        from chess_vision_tpu.train.loop import (
            make_gathered_chunk_steps,
            make_gathered_steps,
        )

        gtrain, geval = make_gathered_steps(train_step, eval_step)
        gtrain_k = geval_k = None
        if dc_chunk > 1:
            gtrain_k, geval_k = make_gathered_chunk_steps(
                train_step, eval_step, dc_chunk)
    base_rng = jax.random.key(args.seed)

    if use_device_cache:
        train_dd = DeviceData.build(dataset, train_idx,
                                    num_workers=num_workers)
        val_dd = DeviceData.build(dataset, val_idx, num_workers=num_workers)
        if ood_dataset is not None:
            ood_dd = DeviceData.build(
                ood_dataset, np.arange(len(ood_dataset)),
                num_workers=num_workers,
            )

    # --- Logging / checkpointing ---
    from datetime import datetime

    run_name = datetime.now().strftime("%Y%m%d_%H%M%S")
    tb_dir = os.path.join(cfg["logging"]["tensorboard_dir"], run_name)
    logger = MetricLogger(tb_dir)
    save_dir = cfg["checkpointing"]["save_dir"]
    os.makedirs(save_dir, exist_ok=True)
    patience = cfg["checkpointing"].get("early_stopping_patience")
    epochs_without_improvement = 0

    meta_path = write_run_meta(
        save_dir, cfg,
        device=f"{n_dev}x{jax.devices()[0].device_kind}",
        train_size=len(train_idx), val_size=len(val_idx),
        tb_dir=tb_dir, n_params=n_params,
    )
    print(f"Run metadata: {meta_path}")

    # --- Training loop ---
    epochs = cfg["training"]["epochs"]
    epoch = start_epoch
    train_metrics = val_metrics = {}
    for epoch in range(start_epoch, epochs):
        print(f"\nEpoch {epoch + 1}/{epochs}")
        t0 = time.time()

        profiling = args.profile_steps > 0 and epoch == start_epoch
        if profiling:
            try:
                jax.profiler.start_trace(tb_dir)
            except Exception as e:
                print(f"profiler unavailable: {e}")
                profiling = False

        if use_device_cache and dc_scan:
            state, train_metrics = run_train_epoch_scan(
                train_step, state, train_dd, base_rng, batch_size,
                seed=args.seed, epoch=epoch,
                step_log=logger.log_step, schedule=schedule,
            )
        elif use_device_cache and dc_chunk > 1:
            from chess_vision_tpu.train.loop import (
                run_train_epoch_gathered_chunk,
            )

            state, train_metrics = run_train_epoch_gathered_chunk(
                gtrain_k, gtrain, state, train_dd, base_rng, batch_size,
                dc_chunk, seed=args.seed, epoch=epoch,
                step_log=logger.log_step, schedule=schedule,
            )
        elif use_device_cache:
            state, train_metrics = run_train_epoch_gathered(
                gtrain, state, train_dd, base_rng, batch_size,
                seed=args.seed, epoch=epoch,
                step_log=logger.log_step, schedule=schedule,
            )
        else:
            state, train_metrics = run_train_epoch(
                train_step, state, train_loader, mesh, base_rng,
                step_log=logger.log_step, schedule=schedule,
                profile_stop_after=args.profile_steps if profiling else None,
            )
        train_elapsed = time.time() - t0
        if profiling:
            try:
                jax.profiler.stop_trace()
                print(f"profiler trace written to {tb_dir}")
            except Exception:
                pass
        if use_device_cache and dc_scan:
            val_metrics = run_eval_epoch_scan(
                eval_step, state, val_dd, batch_size
            )
            ood_metrics = (
                run_eval_epoch_scan(eval_step, state, ood_dd, batch_size)
                if ood_dd is not None else None
            )
        elif use_device_cache and dc_chunk > 1:
            from chess_vision_tpu.train.loop import (
                run_eval_epoch_gathered_chunk,
            )

            val_metrics = run_eval_epoch_gathered_chunk(
                geval_k, geval, state, val_dd, batch_size, dc_chunk
            )
            ood_metrics = (
                run_eval_epoch_gathered_chunk(
                    geval_k, geval, state, ood_dd, batch_size, dc_chunk)
                if ood_dd is not None else None
            )
        elif use_device_cache:
            val_metrics = run_eval_epoch_gathered(
                geval, state, val_dd, batch_size
            )
            ood_metrics = (
                run_eval_epoch_gathered(geval, state, ood_dd, batch_size)
                if ood_dd is not None else None
            )
        else:
            val_metrics = run_eval_epoch(eval_step, state, val_loader, mesh)
            ood_metrics = (
                run_eval_epoch(eval_step, state, ood_loader, mesh)
                if ood_loader is not None else None
            )

        elapsed = time.time() - t0
        train_imgs = steps_per_epoch * batch_size
        lr = float(schedule(int(state.step)))
        logger.flush_steps()

        for name, m in (("Train", train_metrics), ("Val  ", val_metrics)):
            print(
                f"  {name} — loss: {m['loss']:.4f}, "
                f"sq_acc: {m['square_acc']:.4f}, board_acc: {m['board_acc']:.4f}, "
                f"turn: {m['turn_acc']:.4f}, castling: {m['castling_acc']:.4f}, "
                f"full_fen: {m['full_fen_acc']:.4f}"
            )
        if ood_metrics is not None:
            print(
                f"  OOD   — loss: {ood_metrics['loss']:.4f}, "
                f"sq_acc: {ood_metrics['square_acc']:.4f}, "
                f"board_acc: {ood_metrics['board_acc']:.4f}"
            )
        print(f"  LR: {lr:.2e} | Time: {elapsed:.1f}s "
              f"({train_imgs / max(train_elapsed, 1e-9):.0f} train img/s)")

        logger.log_epoch("train", train_metrics, epoch)
        logger.log_epoch("val", val_metrics, epoch)
        if ood_metrics is not None:
            logger.log_ood(ood_metrics, epoch)

        save_checkpoint(
            os.path.join(save_dir, "latest.ckpt"),
            state.params, state.opt_state, state.batch_stats,
            step=int(state.step), epoch=epoch,
            best_val_acc=best_val_acc, config=cfg,
        )
        if val_metrics["board_acc"] > best_val_acc:
            best_val_acc = val_metrics["board_acc"]
            save_checkpoint(
                os.path.join(save_dir, "best.ckpt"),
                state.params, state.opt_state, state.batch_stats,
                step=int(state.step), epoch=epoch,
                best_val_acc=best_val_acc, config=cfg,
            )
            print(f"  >> New best val board_acc: {best_val_acc:.4f}")
            epochs_without_improvement = 0
        else:
            epochs_without_improvement += 1

        if patience and epochs_without_improvement >= patience:
            print(f"  Early stopping after {patience} epochs without improvement.")
            break

    logger.close()
    update_run_meta(
        meta_path,
        best_val_acc=best_val_acc,
        total_epochs=epoch + 1,
        final_train_metrics=train_metrics,
        final_val_metrics=val_metrics,
    )
    print(f"\nTraining complete. Best val board_acc: {best_val_acc:.4f}")
    print(f"Checkpoints saved to {save_dir}/")


if __name__ == "__main__":
    main()
