"""Visual-QA preview grids (reference datagen/preview_*.js parity):
labeled grids of all piece styles, board palettes, and random cohesive
palettes, for eyeballing the generator's output space.

Usage:
    python -m chess_vision_tpu.datagen.preview --out previews/
"""

from __future__ import annotations

import argparse
import os

import numpy as np
from PIL import Image, ImageDraw

from chess_vision_tpu.datagen.render import (
    _FIXED_PALETTES,
    TEXTURE_KINDS,
    BoardStyle,
    _random_palette,
    available_piece_styles,
    available_textures,
    render_board,
    set_assets_dir,
)

_DEMO = "rnbqkbnr/pppppppp/8/8/3P4/8/PPP1PPPP/RNBQKBNR"


def _grid(images_labels, cols, cell=200, pad=26):
    rows = -(-len(images_labels) // cols)
    out = Image.new("RGB", (cols * cell, rows * (cell + pad)), "white")
    draw = ImageDraw.Draw(out)
    for i, (img, label) in enumerate(images_labels):
        r, c = divmod(i, cols)
        out.paste(img.resize((cell, cell)), (c * cell, r * (cell + pad)))
        draw.text((c * cell + 4, r * (cell + pad) + cell + 4), label,
                  fill="black")
    return out


def preview_styles(out_path: str):
    items = []
    for name in available_piece_styles():  # fonts + discovered image sets
        style = BoardStyle(piece_style=name)
        items.append((render_board(_DEMO, style, 256), name))
    _grid(items, cols=4).save(out_path)


def preview_palettes(out_path: str, n_random: int = 12):
    rng = np.random.default_rng(42)
    items = []
    for i, (light, dark) in enumerate(_FIXED_PALETTES):
        style = BoardStyle(light=light, dark=dark)
        items.append((render_board(_DEMO, style, 256), f"fixed {i}"))
    for i in range(n_random):
        light, dark = _random_palette(rng)
        style = BoardStyle(light=light, dark=dark)
        items.append((render_board(_DEMO, style, 256), f"random {i}"))
    _grid(items, cols=4).save(out_path)


def preview_textures(out_path: str, per_kind: int = 4):
    items = []
    for kind in TEXTURE_KINDS:
        for i in range(per_kind):
            style = BoardStyle(texture=(kind, 1000 + i))
            items.append((render_board(_DEMO, style, 256), f"{kind} {i}"))
    for fname in available_textures():
        style = BoardStyle(texture=("img", fname))
        items.append((render_board(_DEMO, style, 256), fname))
    _grid(items, cols=4).save(out_path)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="previews")
    parser.add_argument("--assets-dir", default="assets",
                        help="image asset root (missing dir = fonts only)")
    args = parser.parse_args()
    set_assets_dir(args.assets_dir)
    os.makedirs(args.out, exist_ok=True)
    preview_styles(os.path.join(args.out, "style_preview.png"))
    preview_palettes(os.path.join(args.out, "palette_preview.png"))
    preview_textures(os.path.join(args.out, "texture_preview.png"))
    print(f"previews -> {args.out}/")


if __name__ == "__main__":
    main()
