"""Dataset generator CLI.

Capability parity with the reference's orchestrator (datagen/generate.js):
  - config mode: --config dataset.yaml with named splits, each mixing
    position sources (game/random) with counts
  - simple CLI mode: --out DIR --count N [--source random|game|mixed]
  - seeded determinism: ALL randomness (positions, styles, flips, highlights)
    is drawn in the main process before fanning out; workers render
    deterministically from their assignments (reference generate.js:52-57)
  - manifest.csv schema matches the reference exactly
    (generate.js:99): filename,fen,legal,turn,castling,en_passant,
    piece_count,has_highlight,style,flipped
  - flipped boards store the flipped FEN so labels always match the image
    (reference render-worker.js:14-24)

Usage:
    python -m chess_vision_tpu.datagen.generate --out data/train --count 1000
    python -m chess_vision_tpu.datagen.generate --config datagen.yaml
"""

from __future__ import annotations

import argparse
import csv
import os
from concurrent.futures import ProcessPoolExecutor

import numpy as np

from chess_vision_tpu.datagen.positions import Position, sample_positions
from chess_vision_tpu.datagen.render import (
    BoardStyle,
    filter_piece_styles,
    random_style,
    render_board,
    save_board,
    set_assets_dir,
)
from chess_vision_tpu.fen import flip_fen

MANIFEST_HEADER = [
    "filename", "fen", "legal", "turn", "castling", "en_passant",
    "piece_count", "has_highlight", "style", "flipped",
]


def _render_chunk(args) -> list[list]:
    out_dir, size, fmt, assets_dir, items = args
    set_assets_dir(assets_dir)  # no-op when inherited via fork
    rows = []
    for index, pos_fields, style_fields, render_seed in items:
        pos = Position(*pos_fields)
        style = BoardStyle(*style_fields)
        placement = pos.placement
        label_placement = flip_fen(placement) if style.flipped else placement
        img = render_board(
            placement, style, size=size,
            rng=np.random.default_rng(render_seed),
        )
        ext = "jpg" if fmt == "jpeg" else "png"
        fname = f"{index:06d}.{ext}"
        save_board(img, os.path.join(out_dir, fname), fmt=fmt)
        label_fen = f"{label_placement} {pos.turn} {pos.castling} {pos.en_passant}"
        rows.append([
            fname, label_fen, int(pos.legal), pos.turn, pos.castling,
            pos.en_passant, pos.piece_count,
            int(style.highlight is not None), style.piece_style,
            int(style.flipped),
        ])
    return rows


def generate_split(
    out_dir: str,
    sources: list[tuple[str, int]],
    size: int = 256,
    seed: int = 42,
    fmt: str = "jpeg",
    highlight_pct: float = 0.6,
    flip_pct: float = 0.3,
    texture_pct: float = 0.5,
    workers: int | None = None,
    assets_dir: str | None = None,
    start_index: int = 0,
    style_patterns: list[str] | None = None,
    spline_pct: float = 0.0,
    spline_families: int = 0,
    geom_jitter: float = 0.0,
) -> int:
    """Generate one split. sources = [("random", n), ("game", m), ...].

    start_index > 0 appends to an existing split: filenames continue from
    that index and new manifest rows are appended to manifest.csv (enables
    growing a corpus in place, e.g. 50k -> 150k, without regenerating)."""
    # Discover image piece sets / board textures BEFORE pre-assignment so
    # the style pool is fixed in the main process (determinism discipline).
    set_assets_dir(assets_dir)
    # Optional style-holdout pool (fnmatch patterns), fixed in the main
    # process like the rest of the pre-assignment state.
    style_pool = filter_piece_styles(style_patterns)
    rng = np.random.default_rng(seed)

    positions: list[Position] = []
    for entry in sources:
        source, count = entry[0], entry[1]
        extra = entry[2] if len(entry) > 2 else {}
        positions.extend(
            sample_positions(rng, count, source=source,
                             pgn_path=extra.get("path"),
                             policy=extra.get("policy", "human"))
        )
    order = rng.permutation(len(positions))
    positions = [positions[i] for i in order]

    # Pre-assign everything random in the main process (determinism).
    assignments = []
    for i, pos in enumerate(positions):
        style = random_style(rng, highlight_pct=highlight_pct,
                             flip_pct=flip_pct, texture_pct=texture_pct,
                             last_move=pos.last_move, styles=style_pool,
                             spline_pct=spline_pct,
                             spline_families=spline_families,
                             geom_jitter=geom_jitter)
        render_seed = int(rng.integers(0, 2**31 - 1))
        pos_fields = (pos.placement, pos.turn, pos.castling, pos.en_passant,
                      pos.legal)
        style_fields = (style.piece_style, style.light, style.dark,
                        style.flipped, style.highlight, style.jitter,
                        style.scale, style.texture, style.extras)
        assignments.append(
            (start_index + i, pos_fields, style_fields, render_seed))

    os.makedirs(out_dir, exist_ok=True)
    # Render order is free (each item carries its index + render_seed and
    # rows are sorted by filename below), so group same-style items for
    # sprite-cache locality — procedural spline families are expensive to
    # rasterize the first time and cheap after.
    assignments.sort(key=lambda a: a[2][0])
    workers = workers or os.cpu_count() or 4
    n_chunks = min(workers * 4, max(1, len(assignments)))
    stride = (len(assignments) + n_chunks - 1) // n_chunks
    chunks = [assignments[i * stride:(i + 1) * stride] for i in range(n_chunks)]
    tasks = [(out_dir, size, fmt, assets_dir, chunk) for chunk in chunks if chunk]

    rows: list[list] = []
    if workers > 1 and len(assignments) > 64:
        with ProcessPoolExecutor(max_workers=workers) as pool:
            for chunk_rows in pool.map(_render_chunk, tasks):
                rows.extend(chunk_rows)
    else:
        for task in tasks:
            rows.extend(_render_chunk(task))

    rows.sort(key=lambda r: r[0])
    manifest = os.path.join(out_dir, "manifest.csv")
    append = start_index > 0 and os.path.exists(manifest)
    with open(manifest, "a" if append else "w", newline="") as f:
        writer = csv.writer(f)
        if not append:
            writer.writerow(MANIFEST_HEADER)
        writer.writerows(rows)
    return len(rows)


def run_from_config(path: str) -> None:
    import yaml

    with open(path) as f:
        cfg = yaml.safe_load(f)
    rendering = cfg.get("rendering", {})
    seed = rendering.get("seed", 42)
    size = rendering.get("size", 256)
    fmt = rendering.get("format", "jpeg")
    highlight_pct = rendering.get("highlight_pct", 0.6)
    flip_pct = rendering.get("flip_pct", 0.3)
    texture_pct = rendering.get("texture_pct", 0.5)
    spline_pct = rendering.get("spline_pct", 0.0)
    spline_families = rendering.get("spline_families", 0)
    geom_jitter = rendering.get("geom_jitter", 0.0)
    assets_dir = rendering.get("assets_dir")
    if assets_dir and not os.path.isabs(assets_dir):
        assets_dir = os.path.join(os.path.dirname(os.path.abspath(path)),
                                  assets_dir)

    for name, split in cfg["splits"].items():
        sources = []
        for source in split.get("sources", []):
            extra = {k: v for k, v in source.items()
                     if k not in ("type", "count")}
            sources.append((source["type"], source["count"], extra))
        out_dir = split["dir"]
        # Per-split seed (so a test split does not replay the train split's
        # position stream) and per-split assets_dir (style-holdout pools
        # live outside the main assets tree, e.g. assets/holdout).
        split_seed = split.get("seed", seed)
        split_assets = split.get("assets_dir", assets_dir)
        if split_assets and not os.path.isabs(split_assets):
            split_assets = os.path.join(
                os.path.dirname(os.path.abspath(path)), split_assets)
        n = generate_split(
            out_dir, sources, size=size, seed=split_seed, fmt=fmt,
            highlight_pct=highlight_pct, flip_pct=flip_pct,
            texture_pct=texture_pct, assets_dir=split_assets,
            start_index=split.get("start_index", 0),
            style_patterns=split.get("styles") or rendering.get("styles"),
            spline_pct=split.get("spline_pct", spline_pct),
            spline_families=split.get("spline_families", spline_families),
            geom_jitter=split.get("geom_jitter", geom_jitter),
        )
        print(f"split {name}: {n} images -> {out_dir}")


def main():
    parser = argparse.ArgumentParser(description="Generate synthetic chess boards")
    parser.add_argument("--config", default=None, help="YAML config with splits")
    parser.add_argument("--out", default=None, help="Output directory (simple mode)")
    parser.add_argument("--count", type=int, default=1000)
    parser.add_argument("--source", default="mixed",
                        choices=["random", "game", "mixed"])
    parser.add_argument("--size", type=int, default=256)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--format", default="jpeg", choices=["jpeg", "png"])
    parser.add_argument("--workers", type=int, default=None)
    parser.add_argument("--assets-dir", default=None,
                        help="Directory with pieces/<style>/ image sets and "
                             "boards/ textures (auto-discovered)")
    parser.add_argument("--start-index", type=int, default=0,
                        help="Append mode: continue filenames from this "
                             "index and append to the existing manifest")
    parser.add_argument("--styles", default=None,
                        help="Comma-separated fnmatch patterns restricting "
                             "the piece-style pool (e.g. 'img:geo_*') — "
                             "for style-holdout OOD splits")
    args = parser.parse_args()

    if args.config:
        run_from_config(args.config)
        return
    if not args.out:
        parser.error("--out is required without --config")

    if args.source == "mixed":
        n_game = int(args.count * 0.75)
        sources = [("game", n_game), ("random", args.count - n_game)]
    else:
        sources = [(args.source, args.count)]
    n = generate_split(
        args.out, sources, size=args.size, seed=args.seed, fmt=args.format,
        workers=args.workers, assets_dir=args.assets_dir,
        start_index=args.start_index,
        style_patterns=args.styles.split(",") if args.styles else None,
    )
    print(f"{n} images -> {args.out}")


if __name__ == "__main__":
    main()
