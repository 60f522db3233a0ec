#!/usr/bin/env python
"""bf16 vs int8 (W8A8) accuracy on a trained ChessViT checkpoint.

VERDICT r2 #3: the serving headline runs the fused int8 path, but its accuracy
had only been checked on random weights. This measures both paths on real
held-out data through the exact serving stack (serve.Predictor — native
decode, device preprocess, argmax FEN assembly) and reports the deltas.

Usage:
  python experiments/int8_eval.py --checkpoint /root/ckpt_vit/best.ckpt \
      --test-dir data/test --max-samples 4096 [--mode ycbcr420]

Prints per-path square/board/turn/castling/full-FEN accuracy (turn+castling
legal-masked, reference evaluate.py:106-123 semantics) and the int8-vs-bf16
deltas + prediction agreement.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def metrics_from_fens(pred_fens, labels):
    n = len(pred_fens)
    sq_correct = 0
    board_ok = np.zeros(n, bool)
    turn_ok = np.zeros(n, bool)
    cast_ok = np.zeros(n, bool)
    legal = np.zeros(n, bool)
    from chess_vision_tpu.fen import fen_to_labels

    pred_sq = np.zeros((n, 64), np.int32)
    for i, (fen, lab) in enumerate(zip(pred_fens, labels)):
        parts = fen.split()
        sq = fen_to_labels(parts[0])
        pred_sq[i] = sq
        eq = sq == lab["squares"]
        sq_correct += int(eq.sum())
        board_ok[i] = bool(eq.all())
        turn_ok[i] = (parts[1] == "b") == bool(lab["turn"][0] > 0.5)
        pred_cast = parts[2] if parts[2] != "-" else ""
        true_cast = "".join(
            c for c, f in zip("KQkq", lab["castling"]) if f > 0.5
        )
        cast_ok[i] = pred_cast == true_cast
        legal[i] = lab["legal"][0] > 0.5
    nl = max(int(legal.sum()), 1)
    return {
        "square_acc": sq_correct / (n * 64),
        "board_acc": float(board_ok.mean()),
        "turn_acc": float(turn_ok[legal].mean()) if legal.any() else None,
        "castling_acc": float(cast_ok[legal].mean()) if legal.any() else None,
        "full_fen_acc": float((board_ok & turn_ok & cast_ok)[legal].mean())
        if legal.any() else None,
        "n": n, "n_legal": int(legal.sum()),
    }, pred_sq


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--test-dir", default="data/test")
    ap.add_argument("--max-samples", type=int, default=4096)
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--mode", default="ycbcr420")
    ap.add_argument("--calib", type=int, default=0,
                    help="calibrate per-layer softmax shifts on the first N "
                         "images (0 = adaptive bound shifts)")
    args = ap.parse_args()

    from chess_vision_tpu.utils.platform import apply_platform_env

    apply_platform_env()

    from chess_vision_tpu.data import ChessDataset
    from chess_vision_tpu.serve import Predictor

    ds = ChessDataset(args.test_dir, max_samples=args.max_samples)
    paths = [os.path.join(args.test_dir, s["filename"]) for s in ds.samples]
    labels = [ds.labels_for(i) for i in range(len(ds))]
    print(f"{len(paths)} images from {args.test_dir}", file=sys.stderr)

    results = {}
    preds = {}
    for quant in (None, "int8"):
        name = quant or "bf16"
        t0 = time.time()
        p = Predictor(args.checkpoint, batch_size=args.batch_size,
                      mode=args.mode, quant=quant,
                      calib_paths=paths[:args.calib] if quant else None)
        fens = p.predict_files(paths)
        dt = time.time() - t0
        m, sq = metrics_from_fens(fens, labels)
        m["throughput"] = round(len(paths) / dt, 1)
        results[name] = m
        preds[name] = sq
        print(f"{name}: {json.dumps(m)}", file=sys.stderr)
        del p

    agree = float((preds["bf16"] == preds["int8"]).mean())
    board_agree = float((preds["bf16"] == preds["int8"]).all(axis=1).mean())
    out = {
        "test_dir": args.test_dir,
        "checkpoint": args.checkpoint,
        "bf16": results["bf16"],
        "int8": results["int8"],
        "delta_board_acc": round(
            results["int8"]["board_acc"] - results["bf16"]["board_acc"], 6),
        "delta_square_acc": round(
            results["int8"]["square_acc"] - results["bf16"]["square_acc"], 6),
        "square_agreement": round(agree, 6),
        "board_agreement": round(board_agree, 6),
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
