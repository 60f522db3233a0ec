"""Lathe-profile piece sets: silhouettes revolved from radius profiles.

Reserved as the *style-holdout* pool for shape-OOD evaluation. The first
holdout (the geo_* drawn families) measured the 10-epoch ViT at 0.39% board
accuracy on unseen silhouettes (experiments/logs/eval_vit_r3_geo_ood.log);
folding those families into the 150k training corpus consumes them, so the
post-retrain OOD measurement needs fresh geometry the model has still never
seen. These sets must therefore stay OUT of training splits — generate
holdout evals with `--styles 'img:lathe_*'` and training splits with a
pattern that excludes them.

Construction is deliberately a different grammar from drawn_pieces.py's
stacked primitives: each piece is a solid of revolution — a piecewise
radius profile r(y) interpolated over control points and mirrored about the
vertical axis, the way real turned (lathed) Staunton pieces are made — with
the few non-rotational features (rook crenellations, bishop slit, king
cross, the knight's head) cut or drawn afterwards. Same 12-PNG directory
contract as every other set (render.py discover_assets).

Usage:
    python -m chess_vision_tpu.datagen.lathe_pieces --out assets/pieces
"""

from __future__ import annotations

import argparse
import os

import numpy as np
from PIL import Image, ImageDraw

SPRITE = 80
_SS = 4  # supersample, downsampled with LANCZOS for clean edges
KINDS = ("K", "Q", "R", "B", "N", "P")


# ---------------------------------------------------------------------------
# Revolution profiles. Control points are (y, r) with y in [0, 1] (1 = board
# surface) and r the half-width in [0, 0.5]. Between control points the
# radius is linearly interpolated; "rings" insert the sharp collar bumps a
# lathe gouge leaves. Families scale/skip elements of a shared vocabulary.
# ---------------------------------------------------------------------------

FAMILIES = {
    # full Staunton vocabulary: ogee base, double collar rings, fat turnings
    "lathe_classic": dict(base_r=0.40, base_lip=0.06, stem_r=0.095,
                          rings=2, ring_r=0.16, ring_h=0.035,
                          head_scale=1.00, squash=0.0),
    # straight-taper contemporary turning: single ring, slim stem, narrow
    # base, slightly flattened heads
    "lathe_modern": dict(base_r=0.33, base_lip=0.02, stem_r=0.065,
                         rings=1, ring_r=0.115, ring_h=0.05,
                         head_scale=0.82, squash=0.12),
}


def _base_profile(g, top: float) -> list[tuple[float, float]]:
    """Plinth + ogee shoulder + stem start, from the board surface up to
    `top` (the y where the piece-specific upper profile takes over)."""
    br, lip = g["base_r"], g["base_lip"]
    pts = [
        (0.97, br),                       # foot
        (0.97 - 0.030, br),               # vertical foot edge
        (0.97 - 0.045, br - lip),         # lip undercut
        (0.97 - 0.075, br - lip),         # lower torus
        (0.97 - 0.130, g["stem_r"] * 1.9),  # ogee sweep into the stem
        (top, g["stem_r"]),
    ]
    return pts


def _rings(g, y: float) -> list[tuple[float, float]]:
    """Collar rings stacked upward from y (sharp lathe bumps)."""
    pts = []
    for i in range(g["rings"]):
        y0 = y - i * (g["ring_h"] + 0.02)
        pts += [(y0, g["stem_r"]),
                (y0 - g["ring_h"] / 2, g["ring_r"]),
                (y0 - g["ring_h"], g["stem_r"])]
    return pts


def _revolve(pts: list[tuple[float, float]], px: int) -> np.ndarray:
    """Rasterize the solid of revolution of a (y, r) polyline: for every
    pixel row, half-width = interp(r over y); filled about x = 0.5."""
    pts = sorted(pts, key=lambda p: p[0])
    ys = np.array([p[0] for p in pts])
    rs = np.array([p[1] for p in pts])
    yy = (np.arange(px) + 0.5) / px
    r = np.interp(yy, ys, rs, left=0.0, right=0.0)
    # outside the profile's y-range the radius is 0 (empty rows)
    r[(yy < ys[0]) | (yy > ys[-1])] = 0.0
    xx = np.abs((np.arange(px) + 0.5) / px - 0.5)
    return (xx[None, :] <= r[:, None]).astype(np.uint8) * 255


def _mask_from(pts, px) -> tuple[Image.Image, ImageDraw.ImageDraw]:
    img = Image.fromarray(_revolve(pts, px), "L")
    return img, ImageDraw.Draw(img)


def _xy(px, x, y):
    return (x * px, y * px)


def _pawn(g, px):
    top = 0.30 + g["squash"] * 0.05
    hr = 0.145 * g["head_scale"]
    pts = _base_profile(g, 0.68) + _rings(g, 0.66)
    pts += [(0.62, g["stem_r"]),
            (0.60, g["ring_r"] * 1.1),          # cap under the head
            (0.58, g["stem_r"] * 0.9)]
    # ball head as profile arc: sample a circle into (y, r) points
    cy = top + hr
    for t in np.linspace(-1, 1, 9):
        pts.append((cy + t * hr, hr * float(np.sqrt(1 - t * t)) + 1e-4))
    img, _ = _mask_from(pts, px)
    return img


def _rook(g, px):
    top = 0.26 + g["squash"] * 0.06
    cr = 0.22 * g["head_scale"]
    pts = _base_profile(g, 0.55) + _rings(g, 0.53)
    pts += [(0.42, g["stem_r"] * 1.2),
            (0.40, cr), (top, cr * 0.96)]        # near-cylindrical turret
    img, d = _mask_from(pts, px)
    # crenellations: cut notches out of the turret rim
    n = 3
    span = 2 * cr * 0.96
    notch = span / (2 * n + 1)
    for i in range(n):
        x0 = 0.5 - span / 2 + (2 * i + 1) * notch
        d.rectangle([_xy(px, x0, top - 0.01), _xy(px, x0 + notch, top + 0.06)],
                    fill=0)
    return img


def _bishop(g, px):
    top = 0.24 + g["squash"] * 0.06
    w = 0.14 * g["head_scale"]
    pts = _base_profile(g, 0.56) + _rings(g, 0.54)
    pts += [(0.46, g["stem_r"]), (0.44, g["ring_r"]), (0.42, g["stem_r"])]
    # mitre: teardrop profile (widest below the middle, tapering to a point)
    cy0, cy1 = top, 0.42
    for t in np.linspace(0, 1, 9):
        y = cy0 + t * (cy1 - cy0)
        pts.append((y, w * float(np.sin(t ** 0.7 * np.pi * 0.92)) + 1e-4))
    # finial ball
    for t in np.linspace(-1, 1, 7):
        pts.append((top - 0.045 + t * 0.035,
                    0.035 * float(np.sqrt(1 - t * t)) + 1e-4))
    img, d = _mask_from(pts, px)
    d.line([_xy(px, 0.47, top + 0.05), _xy(px, 0.5 + w * 0.9, top + 0.11)],
           fill=0, width=max(2, px // 36))
    return img


def _queen(g, px):
    top = 0.18 + g["squash"] * 0.05
    cw = 0.17 * g["head_scale"]
    pts = _base_profile(g, 0.52) + _rings(g, 0.50)
    pts += [(0.40, g["stem_r"] * 1.1),
            (0.37, g["ring_r"] * 1.25),          # wide shoulder disc
            (0.34, g["stem_r"]),
            (0.30, cw * 0.5),
            (top + 0.06, cw),                     # flaring cup crown
            (top + 0.045, cw * 0.78)]
    img, d = _mask_from(pts, px)
    # crown points: triangular cuts into the cup rim
    n = 4
    span = 2 * cw
    for i in range(n):
        x = 0.5 - span / 2 + span * (i + 0.5) / n
        d.polygon([_xy(px, x - span / (2 * n) * 0.8, top + 0.045),
                   _xy(px, x + span / (2 * n) * 0.8, top + 0.045),
                   _xy(px, x, top + 0.10)], fill=0)
    # orb
    d.ellipse([_xy(px, 0.5 - 0.028, top - 0.015),
               _xy(px, 0.5 + 0.028, top + 0.041)], fill=255)
    return img


def _king(g, px):
    top = 0.20 + g["squash"] * 0.05
    cw = 0.16 * g["head_scale"]
    pts = _base_profile(g, 0.52) + _rings(g, 0.50)
    pts += [(0.40, g["stem_r"] * 1.1),
            (0.37, g["ring_r"] * 1.25),
            (0.34, g["stem_r"]),
            (0.30, cw * 0.55),
            (top + 0.05, cw * 0.95),              # closed dome crown
            (top + 0.01, cw * 0.45)]
    img, d = _mask_from(pts, px)
    cwid = max(2, px // 28)
    d.line([_xy(px, 0.5, top - 0.105), _xy(px, 0.5, top + 0.02)],
           fill=255, width=cwid)
    d.line([_xy(px, 0.450, top - 0.055), _xy(px, 0.550, top - 0.055)],
           fill=255, width=cwid)
    return img


# Knight: not a solid of revolution on any real set either — hand-placed
# horse profile, intentionally different pose from drawn_pieces (arched
# neck, lowered muzzle, clipped mane wedge) so the holdout stays novel.
_HORSE = [
    (0.30, 0.92), (0.28, 0.76), (0.30, 0.60), (0.35, 0.46), (0.33, 0.34),
    (0.38, 0.24), (0.46, 0.19), (0.47, 0.12), (0.53, 0.18), (0.60, 0.16),
    (0.62, 0.24), (0.66, 0.30), (0.78, 0.36), (0.80, 0.44), (0.68, 0.43),
    (0.60, 0.39), (0.56, 0.44), (0.62, 0.55), (0.70, 0.70), (0.74, 0.92),
]


def _knight(g, px):
    pts = _base_profile(g, 0.90)
    img, d = _mask_from(pts, px)
    sc = 0.9 + g["head_scale"] * 0.1
    body = [_xy(px, 0.5 + (x - 0.52) * sc, 0.08 + (y - 0.08) * 0.88)
            for x, y in _HORSE]
    d.polygon(body, fill=255)
    # mane: serrated wedge cuts along the back of the neck
    for i in range(3):
        y0 = 0.40 + i * 0.13
        d.polygon([_xy(px, 0.67, y0), _xy(px, 0.74, y0 + 0.045),
                   _xy(px, 0.66, y0 + 0.09)], fill=0)
    return img


_BUILDERS = {"P": _pawn, "R": _rook, "B": _bishop, "N": _knight,
             "Q": _queen, "K": _king}


def silhouette(kind: str, family: str) -> Image.Image:
    px = SPRITE * _SS
    img = _BUILDERS[kind](FAMILIES[family], px)
    return img.resize((SPRITE, SPRITE), Image.LANCZOS)


# ---------------------------------------------------------------------------
# Finishes. "satin" is new (sheen band over a vertical duotone); flat
# reuses the drawn_pieces edge-outline finish for visual consistency.
# ---------------------------------------------------------------------------

def _finish_satin(mask, white):
    from chess_vision_tpu.datagen.synth_pieces import (
        _colorize,
        _vertical_gradient,
    )

    top = (252, 249, 240) if white else (88, 82, 78)
    bot = (188, 178, 158) if white else (14, 12, 11)
    grad = _vertical_gradient(mask.size[0], top, bot).convert("RGBA")
    grad.putalpha(mask)
    # specular sheen: a soft vertical band left of the axis, as on polished
    # turned wood
    px = mask.size[0]
    sheen = Image.new("L", mask.size, 0)
    sd = ImageDraw.Draw(sheen)
    sd.rectangle([px * 0.34, 0, px * 0.44, px], fill=70)
    from PIL import ImageFilter

    sheen = sheen.filter(ImageFilter.GaussianBlur(px * 0.03))
    sheen = Image.composite(sheen, Image.new("L", mask.size, 0), mask)
    white_layer = Image.new("RGBA", mask.size, (255, 255, 255, 0))
    white_layer.putalpha(sheen)
    edge = (38, 34, 30) if white else (214, 208, 198)
    grown = mask.filter(ImageFilter.MaxFilter(3))
    out = _colorize(grown, edge)
    out.alpha_composite(grad)
    out.alpha_composite(white_layer)
    return out


def _finish_flat(mask, white):
    from chess_vision_tpu.datagen.drawn_pieces import (
        _finish_flat as drawn_flat,
    )

    return drawn_flat(mask, white)


FINISHES = {"": _finish_flat, "_satin": _finish_satin}

STYLE_DIRS = {
    "lathe_classic": "",
    "lathe_classic_satin": "_satin",
    "lathe_modern": "",
    "lathe_modern_satin": "_satin",
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
    print(f"{n} lathe piece sets -> {args.out}")


if __name__ == "__main__":
    main()
