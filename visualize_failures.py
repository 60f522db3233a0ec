#!/usr/bin/env python
"""Render a grid of the worst-predicted boards (reference visualize_failures.py
parity: scan a test dir, find boards with >=1 wrong square, save an annotated
matplotlib grid of the worst N).

Usage:
    python visualize_failures.py --checkpoint C --test-dir D
        [--max-samples N] [--num-failures 30] [--out failures.png]
"""

from __future__ import annotations

import argparse
import os


def main():
    from chess_vision_tpu.utils.platform import apply_platform_env

    apply_platform_env()

    import numpy as np

    from chess_vision_tpu.config import get_data_config
    from chess_vision_tpu.data import BatchLoader, ChessDataset
    from chess_vision_tpu.evaluate import make_eval_batch_fn
    from chess_vision_tpu.fen import labels_to_fen
    from chess_vision_tpu.models import abstract_variables, build_model
    from chess_vision_tpu.parallel.mesh import make_mesh, shard_batch
    from chess_vision_tpu.utils.checkpoint import load_checkpoint, restore_tree

    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--test-dir", required=True)
    parser.add_argument("--max-samples", type=int, default=None)
    parser.add_argument("--num-failures", type=int, default=30)
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--out", default="failures.png")
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

    dataset = ChessDataset(args.test_dir, max_samples=args.max_samples,
                           input_size=input_size)
    mesh = make_mesh()
    loader = BatchLoader(dataset, np.arange(len(dataset)), args.batch_size)
    data_cfg = get_data_config(cfg["model"]["name"])
    eval_batch = make_eval_batch_fn(model, data_cfg["mean"], data_cfg["std"])

    failures = []  # (num_wrong, idx, true_fen, pred_fen)
    for batch in loader:
        out = eval_batch(params, batch_stats, shard_batch(batch, mesh))
        num_wrong = np.asarray(out["num_wrong"])
        preds = np.asarray(out["preds"])
        for i in range(batch["n_real"]):
            if num_wrong[i] > 0:
                failures.append((
                    int(num_wrong[i]), int(batch["indices"][i]),
                    labels_to_fen(batch["squares"][i]),
                    labels_to_fen(preds[i]),
                ))

    print(f"{len(failures)} failures among {len(dataset)} images")
    if not failures:
        return
    failures.sort(key=lambda f: -f[0])
    worst = failures[: args.num_failures]

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from PIL import Image

    cols = 5
    rows = -(-len(worst) // cols)
    fig, axes = plt.subplots(rows, cols, figsize=(4 * cols, 4.6 * rows))
    axes = np.atleast_2d(axes)
    for ax in axes.flat:
        ax.axis("off")
    for ax, (num_wrong, idx, true_fen, pred_fen) in zip(axes.flat, worst):
        path = os.path.join(dataset.root_dir, dataset.samples[idx]["filename"])
        ax.imshow(Image.open(path))
        ax.set_title(
            f"#{idx}: {num_wrong}/64 wrong\nT: {true_fen}\nP: {pred_fen}",
            fontsize=7,
        )
    fig.tight_layout()
    fig.savefig(args.out, dpi=110)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
