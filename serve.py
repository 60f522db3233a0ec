#!/usr/bin/env python
"""Batched JPEG -> FEN serving CLI (the throughput path; reference predict.py
scaled to streams).

Usage:
    python serve.py --checkpoint C --images dir_or_glob [--batch-size 256]
        [--out fens.txt]
Prints "<filename>\t<fen>" per image (or writes to --out).
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import time


def main():
    from chess_vision_tpu.utils.platform import apply_platform_env

    apply_platform_env()

    from chess_vision_tpu.serve import Predictor

    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--images", required=True,
                        help="directory or glob of board images")
    parser.add_argument("--batch-size", type=int, default=256)
    parser.add_argument("--decode-workers", type=int, default=8)
    parser.add_argument("--mode", choices=["rgb", "ycbcr420"], default="rgb",
                        help="ycbcr420 ships subsampled planes (half the "
                             "host->device bytes; RGB rebuilt on device)")
    parser.add_argument("--quant", choices=["int8"], default=None,
                        help="int8 W8A8 inference (ViT only; 2x MXU peak)")
    parser.add_argument("--calib", type=int, default=8,
                        help="int8 only: calibrate per-layer softmax shifts "
                             "on the first N inputs (0 = adaptive bound "
                             "shifts, no calibration)")
    parser.add_argument("--dp", action="store_true",
                        help="shard the batch over ALL visible devices "
                             "(data-parallel mesh serving; params "
                             "replicated, XLA GSPMD partitions the program)")
    parser.add_argument("--out", default=None)
    args = parser.parse_args()

    if os.path.isdir(args.images):
        paths = sorted(
            os.path.join(args.images, f)
            for f in os.listdir(args.images)
            if f.lower().endswith((".jpg", ".jpeg", ".png"))
        )
    else:
        paths = sorted(glob.glob(args.images))
    if not paths:
        sys.exit(f"no images found at {args.images}")

    mesh = None
    if args.dp:
        import jax

        from chess_vision_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
        print(f"Data-parallel serving over {mesh.devices.size} device(s)",
              file=sys.stderr)

    predictor = Predictor(
        args.checkpoint, batch_size=args.batch_size,
        decode_workers=args.decode_workers, mode=args.mode, quant=args.quant,
        calib_paths=paths[:args.calib] if args.quant == "int8" else None,
        mesh=mesh,
    )
    t0 = time.time()
    fens = predictor.predict_files(paths)
    elapsed = time.time() - t0
    print(
        f"{len(paths)} boards in {elapsed:.2f}s "
        f"({len(paths) / elapsed:.0f} boards/s)",
        file=sys.stderr,
    )

    lines = [f"{os.path.basename(p)}\t{fen}" for p, fen in zip(paths, fens)]
    if args.out:
        with open(args.out, "w") as f:
            f.write("\n".join(lines) + "\n")
        print(f"wrote {args.out}", file=sys.stderr)
    else:
        print("\n".join(lines))


if __name__ == "__main__":
    main()
