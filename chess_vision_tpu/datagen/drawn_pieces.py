"""Drawn-silhouette piece sets: geometry built from primitives, not fonts.

synth_pieces.py widens the style pool with raster *effects*, but all of its
sets inherit their silhouettes from the same four chess fonts — narrower
shape diversity than the reference's 26 independently designed sets
(reference datagen/render.js:17-30; its experiment history ties OOD board
accuracy to style-pool breadth, experiments/EXPERIMENTS.md:102-110). This
module draws piece silhouettes from scratch out of ellipse/polygon/rect
primitives under per-family shape grammars (proportions, crenel counts,
head shapes, profile polygons), so each family contributes genuinely new
geometry. Output directories follow the same 12-PNG contract as downloaded
sets and are auto-discovered by the renderer (render.py discover_assets).

Usage:
    python -m chess_vision_tpu.datagen.drawn_pieces --out assets/pieces
"""

from __future__ import annotations

import argparse
import os

from PIL import Image, ImageDraw

SPRITE = 80
_SS = 4  # supersampling factor for crisp downsampled edges
KINDS = ("K", "Q", "R", "B", "N", "P")


# ---------------------------------------------------------------------------
# Shape grammar: every family is a dict of proportions consumed by the
# per-piece silhouette builders below. Coordinates are normalized: x in
# [0, 1] (0.5 = axis of symmetry), y in [0, 1] (1 = board surface).
# ---------------------------------------------------------------------------

FAMILIES = {
    # plump, everything built from stacked round forms
    "geo_round": dict(trunk=0.34, base_w=0.78, base_h=0.12, head=0.30,
                      taper=0.55, round=True, crenels=3, crown=5,
                      knight_skew=0.0, slim=0.0),
    # sharp low-poly: polygons only, hard taper
    "geo_angular": dict(trunk=0.30, base_w=0.72, base_h=0.10, head=0.26,
                        taper=0.35, round=False, crenels=4, crown=4,
                        knight_skew=0.12, slim=0.0),
    # tall, thin modernist forms
    "geo_slim": dict(trunk=0.20, base_w=0.52, base_h=0.08, head=0.20,
                     taper=0.70, round=True, crenels=2, crown=3,
                     knight_skew=-0.06, slim=0.22),
    # wide, chunky, toy-like
    "geo_blocky": dict(trunk=0.46, base_w=0.92, base_h=0.16, head=0.36,
                       taper=0.85, round=False, crenels=3, crown=4,
                       knight_skew=0.06, slim=-0.08),
}


def _canvas():
    px = SPRITE * _SS
    img = Image.new("L", (px, px), 0)
    return img, ImageDraw.Draw(img), px


def _xy(px, x, y):
    return (x * px, y * px)


def _base(d, px, g, top_y):
    """Plinth: ellipse or box + a short tapering collar up to top_y."""
    bw, bh = g["base_w"], g["base_h"]
    x0, x1 = 0.5 - bw / 2, 0.5 + bw / 2
    y1, y0 = 0.97, 0.97 - bh
    if g["round"]:
        d.ellipse([_xy(px, x0, y0), _xy(px, x1, y1)], fill=255)
        d.rectangle([_xy(px, x0, (y0 + y1) / 2), _xy(px, x1, y1 - 0.01)],
                    fill=255)
    else:
        d.rectangle([_xy(px, x0, y0), _xy(px, x1, y1)], fill=255)
    tw = g["trunk"]
    d.polygon([_xy(px, 0.5 - bw / 2 + 0.04, y0),
               _xy(px, 0.5 + bw / 2 - 0.04, y0),
               _xy(px, 0.5 + tw / 2, top_y),
               _xy(px, 0.5 - tw / 2, top_y)], fill=255)


def _trunk(d, px, g, y_top, y_bot, w_top=None):
    """Tapering column between two heights."""
    wb = g["trunk"]
    wt = w_top if w_top is not None else wb * g["taper"]
    d.polygon([_xy(px, 0.5 - wb / 2, y_bot), _xy(px, 0.5 + wb / 2, y_bot),
               _xy(px, 0.5 + wt / 2, y_top), _xy(px, 0.5 - wt / 2, y_top)],
              fill=255)


def _pawn(d, px, g):
    top = 0.34 - g["slim"] * 0.1
    _base(d, px, g, 0.72)
    _trunk(d, px, g, 0.50, 0.74)
    r = g["head"] / 2
    if g["round"]:
        d.ellipse([_xy(px, 0.5 - r, top), _xy(px, 0.5 + r, top + 2 * r)],
                  fill=255)
    else:
        cy = top + r
        d.polygon([_xy(px, 0.5, top), _xy(px, 0.5 + r, cy),
                   _xy(px, 0.5, top + 2 * r), _xy(px, 0.5 - r, cy)],
                  fill=255)
    # collar between head and trunk
    d.ellipse([_xy(px, 0.5 - r * 1.2, 0.47), _xy(px, 0.5 + r * 1.2, 0.55)],
              fill=255)


def _rook(d, px, g):
    top = 0.20 - g["slim"] * 0.08
    _base(d, px, g, 0.70)
    _trunk(d, px, g, 0.34, 0.72, w_top=g["trunk"] * 0.9)
    bw = g["trunk"] * 1.5
    d.rectangle([_xy(px, 0.5 - bw / 2, 0.30), _xy(px, 0.5 + bw / 2, 0.38)],
                fill=255)
    # crenellated top block
    n = g["crenels"]
    total = bw
    tooth = total / (2 * n - 1)
    for i in range(n):
        x0 = 0.5 - total / 2 + i * 2 * tooth
        d.rectangle([_xy(px, x0, top), _xy(px, x0 + tooth, 0.33)], fill=255)
    d.rectangle([_xy(px, 0.5 - total / 2, top + 0.07),
                 _xy(px, 0.5 + total / 2, 0.33)], fill=255)


def _bishop(d, px, g):
    top = 0.22 - g["slim"] * 0.08
    _base(d, px, g, 0.70)
    _trunk(d, px, g, 0.48, 0.72)
    w = g["head"]
    if g["round"]:
        # mitre: tall ellipse with a diagonal slit
        d.ellipse([_xy(px, 0.5 - w / 2, top + 0.05),
                   _xy(px, 0.5 + w / 2, 0.52)], fill=255)
        d.line([_xy(px, 0.5 - w * 0.1, top + 0.10),
                _xy(px, 0.5 + w * 0.45, top + 0.28)],
               fill=0, width=max(2, px // 40))
    else:
        d.polygon([_xy(px, 0.5, top + 0.02),
                   _xy(px, 0.5 + w / 2, 0.40),
                   _xy(px, 0.5 + w * 0.30, 0.52),
                   _xy(px, 0.5 - w * 0.30, 0.52),
                   _xy(px, 0.5 - w / 2, 0.40)], fill=255)
        d.line([_xy(px, 0.5 - w * 0.05, top + 0.12),
                _xy(px, 0.5 + w * 0.4, top + 0.30)],
               fill=0, width=max(2, px // 40))
    r = w * 0.18
    d.ellipse([_xy(px, 0.5 - r, top - 2 * r + 0.02),
               _xy(px, 0.5 + r, top + 0.02)], fill=255)


# horse-head profile, hand-placed in normalized coords (x, y), y=1 bottom
_KNIGHT_PROFILE = [
    (0.24, 0.92), (0.26, 0.70), (0.30, 0.55), (0.26, 0.44), (0.24, 0.33),
    (0.32, 0.22), (0.40, 0.15), (0.42, 0.08), (0.48, 0.16), (0.56, 0.10),
    (0.58, 0.20), (0.70, 0.28), (0.76, 0.38), (0.74, 0.46), (0.62, 0.46),
    (0.54, 0.42), (0.50, 0.48), (0.60, 0.58), (0.68, 0.74), (0.72, 0.92),
]


def _knight(d, px, g):
    _base(d, px, g, 0.90)
    skew = g["knight_skew"]
    slim = g["slim"]
    pts = []
    for x, y in _KNIGHT_PROFILE:
        xx = 0.5 + (x - 0.5) * (1.0 - slim * 0.8) + skew * (1.0 - y)
        yy = 0.10 + (y - 0.08) * 0.88
        pts.append(_xy(px, xx, yy))
    d.polygon(pts, fill=255)
    if not g["round"]:
        # facet the profile: cut a notch under the jaw
        d.polygon([_xy(px, 0.52, 0.50), _xy(px, 0.62, 0.52),
                   _xy(px, 0.56, 0.60)], fill=0)


def _coronet(d, px, g, top, n, ball=True):
    w = g["head"] * 1.6
    y0 = top + 0.14
    for i in range(n):
        t = i / max(n - 1, 1)
        x = 0.5 - w / 2 + w * t
        peak_y = top + abs(t - 0.5) * 0.06
        d.polygon([_xy(px, x - 0.035, y0), _xy(px, x + 0.035, y0),
                   _xy(px, x, peak_y)], fill=255)
        if ball and g["round"]:
            r = 0.022
            d.ellipse([_xy(px, x - r, peak_y - 2 * r),
                       _xy(px, x + r, peak_y)], fill=255)
    d.rectangle([_xy(px, 0.5 - w / 2, y0 - 0.02),
                 _xy(px, 0.5 + w / 2, y0 + 0.05)], fill=255)


def _queen(d, px, g):
    top = 0.16 - g["slim"] * 0.06
    _base(d, px, g, 0.70)
    _trunk(d, px, g, 0.34, 0.72)
    d.ellipse([_xy(px, 0.5 - g["trunk"] * 0.8, 0.32),
               _xy(px, 0.5 + g["trunk"] * 0.8, 0.42)], fill=255)
    _coronet(d, px, g, top, g["crown"])


def _king(d, px, g):
    top = 0.20 - g["slim"] * 0.06
    _base(d, px, g, 0.70)
    _trunk(d, px, g, 0.34, 0.72)
    d.ellipse([_xy(px, 0.5 - g["trunk"] * 0.8, 0.32),
               _xy(px, 0.5 + g["trunk"] * 0.8, 0.42)], fill=255)
    _coronet(d, px, g, top + 0.05, max(g["crown"] - 1, 2), ball=False)
    # cross
    cw = max(2, px // 26)
    d.line([_xy(px, 0.5, top - 0.12), _xy(px, 0.5, top + 0.04)],
           fill=255, width=cw)
    d.line([_xy(px, 0.44, top - 0.05), _xy(px, 0.56, top - 0.05)],
           fill=255, width=cw)


_BUILDERS = {"P": _pawn, "R": _rook, "B": _bishop, "N": _knight,
             "Q": _queen, "K": _king}


def silhouette(kind: str, family: str) -> Image.Image:
    img, d, px = _canvas()
    _BUILDERS[kind](d, px, FAMILIES[family])
    return img.resize((SPRITE, SPRITE), Image.LANCZOS)


# ---------------------------------------------------------------------------
# Finishes (mask -> RGBA sprite). Kept simple: the shape is the point here.
# ---------------------------------------------------------------------------

def _finish_flat(mask, white):
    from chess_vision_tpu.datagen.synth_pieces import _colorize

    body = (242, 240, 233) if white else (45, 42, 40)
    edge = (35, 32, 30) if white else (225, 222, 214)
    grown = mask.filter(__import__("PIL.ImageFilter", fromlist=["MaxFilter"])
                        .MaxFilter(3))
    out = _colorize(grown, edge)
    out.alpha_composite(_colorize(mask, body))
    return out


def _finish_duotone(mask, white):
    from chess_vision_tpu.datagen.synth_pieces import (
        _colorize,
        _vertical_gradient,
    )

    top = (250, 246, 235) if white else (95, 90, 88)
    bot = (196, 188, 170) if white else (18, 16, 15)
    grad = _vertical_gradient(mask.size[0], top, bot).convert("RGBA")
    grad.putalpha(mask)
    edge = (40, 36, 32) if white else (210, 205, 196)
    grown = mask.filter(__import__("PIL.ImageFilter", fromlist=["MaxFilter"])
                        .MaxFilter(3))
    out = _colorize(grown, edge)
    out.alpha_composite(grad)
    return out


FINISHES = {"": _finish_flat, "_duo": _finish_duotone}

# each (family, finish) pair is one style directory; finishes alternate so
# the set count stays focused on geometric variety
STYLE_DIRS = {
    "geo_round": "",
    "geo_round_duo": "_duo",
    "geo_angular": "",
    "geo_angular_duo": "_duo",
    "geo_slim": "",
    "geo_blocky": "",
    "geo_blocky_duo": "_duo",
    "geo_slim_duo": "_duo",
}


def synthesize(out_dir: str, styles: list[str] | None = None) -> int:
    names = styles or list(STYLE_DIRS)
    for name in names:
        suffix = STYLE_DIRS[name]
        family = name[: len(name) - len(suffix)] if suffix else name
        finish = FINISHES[suffix]
        d = os.path.join(out_dir, name)
        os.makedirs(d, exist_ok=True)
        for kind in KINDS:
            mask = silhouette(kind, family)
            for white in (True, False):
                sprite = finish(mask, white)
                code = ("w" if white else "b") + kind
                sprite.save(os.path.join(d, f"{code}.png"))
    return len(names)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", default="assets/pieces")
    parser.add_argument("--styles", nargs="*", default=None,
                        help=f"subset of {list(STYLE_DIRS)}")
    args = parser.parse_args()
    n = synthesize(args.out, args.styles)
    print(f"{n} drawn piece sets -> {args.out}")


if __name__ == "__main__":
    main()
