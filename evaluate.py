#!/usr/bin/env python
"""Evaluate a checkpoint on a test set (CLI parity with reference
evaluate.py:290-341: config is read from the checkpoint itself; results are
appended to {ckpt_dir}/eval_results.jsonl)."""

from __future__ import annotations

import argparse
import json
import os
from datetime import datetime

import numpy as np


def main():
    from chess_vision_tpu.utils.platform import apply_platform_env

    apply_platform_env()

    from chess_vision_tpu.config import get_data_config
    from chess_vision_tpu.data import BatchLoader, ChessDataset
    from chess_vision_tpu.evaluate import evaluate
    from chess_vision_tpu.models import abstract_variables, build_model
    from chess_vision_tpu.parallel.mesh import make_mesh
    from chess_vision_tpu.utils.checkpoint import load_checkpoint, restore_tree

    parser = argparse.ArgumentParser(description="Evaluate chess model on test set")
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--test-dir", default=None, help="Override test directory")
    parser.add_argument("--manifest", default=None, help="Manifest CSV path")
    parser.add_argument("--max-samples", type=int, default=None)
    parser.add_argument("--batch-size", type=int, default=64)
    args = parser.parse_args()

    ckpt = load_checkpoint(args.checkpoint)
    cfg = ckpt["config"]

    model = build_model(cfg)
    input_size = cfg["model"].get("input_size") or 224
    variables = abstract_variables(model, input_size)
    params = restore_tree(variables["params"], ckpt["params"])
    batch_stats = restore_tree(
        variables.get("batch_stats", {}), ckpt.get("batch_stats", {})
    )

    test_dir = args.test_dir or cfg["data"]["test_dir"]
    dataset = ChessDataset(
        test_dir, max_samples=args.max_samples, manifest=args.manifest,
        input_size=input_size,
    )
    mesh = make_mesh()
    loader = BatchLoader(
        dataset, np.arange(len(dataset)), args.batch_size,
        num_workers=cfg["data"].get("num_workers", 6),
    )
    print(f"Test set: {len(dataset)} images from {test_dir}")

    data_cfg = get_data_config(cfg["model"]["name"])
    metrics = evaluate(
        model, params, batch_stats, dataset, loader, mesh,
        data_cfg["mean"], data_cfg["std"],
    )

    ckpt_dir = os.path.dirname(os.path.abspath(args.checkpoint))
    eval_log = os.path.join(ckpt_dir, "eval_results.jsonl")
    entry = {
        "timestamp": datetime.now().isoformat(),
        "checkpoint": args.checkpoint,
        "test_dir": test_dir,
        "num_samples": len(dataset),
        "metrics": metrics,
    }
    with open(eval_log, "a") as f:
        f.write(json.dumps(entry) + "\n")
    print(f"\nResults appended to {eval_log}")


if __name__ == "__main__":
    main()
