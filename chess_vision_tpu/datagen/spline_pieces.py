"""Spline-profile piece sets: a third, continuously parameterized grammar.

Round-3 finding (experiments/EXPERIMENTS.md runs 08/10): folding a new
family pool into training fixes shape-OOD *for that pool* (geo board acc
0.0039 -> 0.9824) but board accuracy on yet-unseen geometry (the lathe
holdout) stays 0.0000 — a few dozen fixed silhouette families leave the
silhouette space too sparsely sampled to interpolate novel shapes. The
reference buys this robustness with 26 human-curated sets + pretrained
backbones (reference datagen/render.js:17-23, experiments/
EXPERIMENT_RUNS.md:32-35); with timm weights absent offline our lever is
distributional breadth.

This module is that lever: instead of a handful of hand-tuned families it
defines a *continuous* grammar — every piece is a solid of revolution whose
radius profile is a Catmull-Rom spline through parameter-sampled control
points (base flare, stem curvature, collar rings as bump composites), with
the non-rotational features (rook crenellations, bishop mitre slit, queen
crown points, king cross, a fully parameterized knight skeleton) cut or
drawn afterwards, and the finish (tones, gradient, sheen, outline width)
sampled too. A single integer seeds a whole family, so the generator can
draw thousands of distinct, internally consistent piece sets
("spline:<id>" styles) instead of reusing a fixed pool.

It is deliberately a different construction from both existing grammars:
drawn_pieces.py stacks hard ellipse/polygon primitives; lathe_pieces.py
revolves piecewise-LINEAR profiles from a fixed vocabulary of two
hand-tuned families. Here the profile is smooth-interpolated and every
proportion is a random variable. The lathe sets remain the shape-OOD
holdout and stay out of all training pools.

Usage:
    python -m chess_vision_tpu.datagen.spline_pieces --out assets/pieces
    (bakes the 16 fixed preview families; procedural families need no
    baking — render.py generates them on the fly from the style string)
"""

from __future__ import annotations

import argparse
import functools
import os

import numpy as np
from PIL import Image, ImageDraw, ImageFilter

SPRITE = 80
_SS = 4  # supersampling factor
KINDS = ("K", "Q", "R", "B", "N", "P")

# seed namespace separation: fixed named families vs procedural ids
_FIXED_SEED_BASE = 7_700_000
_PROC_SEED_BASE = 11_000_000


# ---------------------------------------------------------------------------
# Spline machinery
# ---------------------------------------------------------------------------

def _catmull_rom(pts: np.ndarray, samples_per_seg: int = 24) -> np.ndarray:
    """Uniform Catmull-Rom through pts (N,2), endpoints duplicated."""
    p = np.concatenate([pts[:1], pts, pts[-1:]], axis=0)
    out = []
    for i in range(len(p) - 3):
        p0, p1, p2, p3 = p[i], p[i + 1], p[i + 2], p[i + 3]
        t = np.linspace(0.0, 1.0, samples_per_seg, endpoint=False)[:, None]
        out.append(
            0.5 * ((2 * p1)
                   + (-p0 + p2) * t
                   + (2 * p0 - 5 * p1 + 4 * p2 - p3) * t ** 2
                   + (-p0 + 3 * p1 - 3 * p2 + p3) * t ** 3)
        )
    out.append(pts[-1:])
    return np.concatenate(out, axis=0)


def _profile_radius(ctrl: list[tuple[float, float]], px: int) -> np.ndarray:
    """Smooth r(y) over pixel rows from (y, r) control points."""
    curve = _catmull_rom(np.asarray(ctrl, np.float64))
    order = np.argsort(curve[:, 0], kind="stable")
    ys, rs = curve[order, 0], np.maximum(curve[order, 1], 0.0)
    yy = (np.arange(px) + 0.5) / px
    r = np.interp(yy, ys, rs, left=0.0, right=0.0)
    r[(yy < ys[0]) | (yy > ys[-1])] = 0.0
    return r


def _bump(px: int, y0: float, h: float, r: float, sharp: bool) -> np.ndarray:
    """Collar-ring bump profile r(y): triangular (sharp) or cosine (round)."""
    yy = (np.arange(px) + 0.5) / px
    t = np.clip(1.0 - np.abs(yy - y0) / (h / 2), 0.0, 1.0)
    if not sharp:
        t = 0.5 - 0.5 * np.cos(np.pi * t)
    return t * r


def _raster(r: np.ndarray, px: int, squash_x: float = 1.0) -> np.ndarray:
    xx = np.abs((np.arange(px) + 0.5) / px - 0.5)
    return (xx[None, :] <= r[:, None] * squash_x).astype(np.uint8) * 255


def _smooth_closed(pts: np.ndarray, samples_per_seg: int = 16) -> np.ndarray:
    """Closed Catmull-Rom loop (for the knight outline)."""
    p = np.concatenate([pts[-1:], pts, pts[:2]], axis=0)
    out = []
    for i in range(len(p) - 3):
        p0, p1, p2, p3 = p[i], p[i + 1], p[i + 2], p[i + 3]
        t = np.linspace(0.0, 1.0, samples_per_seg, endpoint=False)[:, None]
        out.append(
            0.5 * ((2 * p1)
                   + (-p0 + p2) * t
                   + (2 * p0 - 5 * p1 + 4 * p2 - p3) * t ** 2
                   + (-p0 + 3 * p1 - 3 * p2 + p3) * t ** 3)
        )
    return np.concatenate(out, axis=0)


# ---------------------------------------------------------------------------
# Family parameter sampling: one rng draw -> a full internally consistent set
# ---------------------------------------------------------------------------

def sample_params(rng: np.random.Generator) -> dict:
    g = dict(
        # plinth
        base_r=float(rng.uniform(0.27, 0.43)),
        base_h=float(rng.uniform(0.05, 0.11)),
        base_lip=float(rng.uniform(0.0, 0.07)),
        # stem
        stem_r=float(rng.uniform(0.05, 0.11)),
        stem_bow=float(rng.uniform(0.75, 1.45)),   # <1 concave, >1 convex
        shoulder=float(rng.uniform(1.3, 2.2)),     # ogee sweep width factor
        # collar rings
        rings=int(rng.integers(0, 4)),
        ring_r=float(rng.uniform(1.35, 2.3)),      # x stem_r
        ring_h=float(rng.uniform(0.025, 0.055)),
        ring_sharp=bool(rng.random() < 0.5),
        # global
        squash=float(rng.uniform(0.88, 1.12)),     # vertical scale
        width=float(rng.uniform(0.85, 1.15)),      # horizontal scale
        # per-kind head vocabulary
        pawn_head=["ball", "cone", "dome"][int(rng.integers(0, 3))],
        pawn_head_r=float(rng.uniform(0.105, 0.185)),
        rook_r=float(rng.uniform(0.15, 0.26)),
        rook_taper=float(rng.uniform(0.78, 1.0)),
        crenels=int(rng.integers(2, 6)),
        crenel_depth=float(rng.uniform(0.045, 0.09)),
        mitre_w=float(rng.uniform(0.10, 0.17)),
        mitre_h=float(rng.uniform(0.20, 0.30)),
        slit_angle=float(rng.uniform(0.35, 1.0)),  # slope of the mitre cut
        finial_r=float(rng.uniform(0.018, 0.05)),
        crown_w=float(rng.uniform(0.13, 0.21)),
        crown_pts=int(rng.integers(3, 7)),
        orb_r=float(rng.uniform(0.02, 0.038)),
        cross_h=float(rng.uniform(0.09, 0.15)),
        cross_w=float(rng.uniform(0.028, 0.05)),
        # knight skeleton
        kn_neck=float(rng.uniform(0.55, 0.80)),    # back-of-neck arch x
        kn_muzzle=float(rng.uniform(0.16, 0.30)),  # muzzle length
        kn_droop=float(rng.uniform(-0.04, 0.10)),  # muzzle droop
        kn_ear=float(rng.uniform(0.04, 0.10)),
        kn_ears=int(rng.integers(1, 3)),
        kn_mane=int(rng.integers(0, 5)),
        kn_chest=float(rng.uniform(0.24, 0.34)),   # chest forward x
        # finish
        f_grad=bool(rng.random() < 0.6),
        f_sheen=bool(rng.random() < 0.35),
        f_stroke=int(rng.integers(0, 3)),          # outline width (px @80)
        f_wtone=int(rng.integers(0, 5)),
        f_btone=int(rng.integers(0, 5)),
    )
    return g


_WHITE_TONES = [
    ((250, 247, 238), (196, 186, 166)),
    ((245, 240, 245), (180, 172, 186)),
    ((255, 248, 225), (205, 180, 130)),
    ((240, 240, 236), (168, 170, 168)),
    ((250, 235, 228), (198, 158, 142)),
]
_BLACK_TONES = [
    ((92, 86, 82), (16, 13, 12)),
    ((70, 74, 92), (10, 12, 22)),
    ((96, 70, 52), (24, 14, 8)),
    ((80, 80, 80), (18, 18, 18)),
    ((66, 88, 74), (10, 20, 14)),
]


# ---------------------------------------------------------------------------
# Per-kind silhouette builders (mask = L image at px = SPRITE*_SS)
# ---------------------------------------------------------------------------

def _base_stem(g: dict, top: float, top_r: float | None = None) -> list:
    """Control points from the foot up to `top` where the head takes over."""
    br, lip, sr = g["base_r"], g["base_lip"], g["stem_r"]
    tr = sr if top_r is None else top_r
    foot = 0.965
    pts = [
        (foot, br * 0.90),
        (foot - 0.015, br),
        (foot - g["base_h"] * 0.6, br - lip),
        (foot - g["base_h"], sr * g["shoulder"]),
    ]
    # stem with a bowed midpoint (concave or convex turning)
    mid = (foot - g["base_h"] + top) / 2
    pts.append((mid, sr * g["stem_bow"] * 0.85))
    pts.append((top, tr))
    return pts


def _apply_rings(r: np.ndarray, g: dict, y: float, px: int) -> np.ndarray:
    for i in range(g["rings"]):
        y0 = y - i * (g["ring_h"] + 0.018)
        r = np.maximum(
            r, _bump(px, y0, g["ring_h"], g["stem_r"] * g["ring_r"],
                     g["ring_sharp"]))
    return r


def _head_arc(cy: float, r: float, n: int = 9, rmin: float = 1e-4) -> list:
    return [(cy + t * r, r * float(np.sqrt(max(0.0, 1 - t * t))) + rmin)
            for t in np.linspace(-1, 1, n)]


def _mask_of(pts: list, g: dict, px: int,
             rings_at: float | None = None) -> tuple[Image.Image, ImageDraw.ImageDraw]:
    r = _profile_radius(pts, px)
    if rings_at is not None:
        r = _apply_rings(r, g, rings_at, px)
    img = Image.fromarray(_raster(r, px, g["width"]), "L")
    return img, ImageDraw.Draw(img)


def _xy(px, x, y):
    return (x * px, y * px)


def _pawn(g, px):
    hr = g["pawn_head_r"]
    top = 0.36 - hr
    pts = _base_stem(g, 0.62)
    pts += [(0.56, g["stem_r"] * 1.6), (0.52, g["stem_r"] * 0.95)]
    if g["pawn_head"] == "ball":
        pts += _head_arc(top + hr, hr)
    elif g["pawn_head"] == "cone":
        pts += [(top + 2 * hr, hr * 1.05), (top + hr, hr * 0.6),
                (top, 0.012)]
    else:  # dome
        pts += [(top + 2 * hr, hr * 1.1), (top + hr * 0.7, hr * 0.85),
                (top, 0.02)]
    img, _ = _mask_of(pts, g, px, rings_at=0.585)
    return img


def _rook(g, px):
    rr = g["rook_r"]
    top = 0.235
    pts = _base_stem(g, 0.50)
    pts += [(0.42, g["stem_r"] * 1.3),
            (0.38, rr), (top + 0.01, rr * g["rook_taper"]),
            (top, rr * g["rook_taper"])]
    img, d = _mask_of(pts, g, px, rings_at=0.475)
    n = g["crenels"]
    span = 2 * rr * g["rook_taper"] * g["width"]
    notch = span / (2 * n + 1)
    for i in range(n):
        x0 = 0.5 - span / 2 + (2 * i + 1) * notch
        d.rectangle([_xy(px, x0, top - 0.01),
                     _xy(px, x0 + notch, top + g["crenel_depth"])], fill=0)
    return img


def _bishop(g, px):
    w, h = g["mitre_w"], g["mitre_h"]
    top = 0.175 + (0.30 - h) * 0.5
    pts = _base_stem(g, 0.52)
    pts += [(0.46, g["stem_r"] * 1.5), (0.42, g["stem_r"])]
    # teardrop mitre: widest just below mid-height, tapering to the tip
    base_y, tip_y = top + h, top + 0.02
    for t in np.linspace(0.0, 1.0, 9):
        y = base_y + t * (tip_y - base_y)
        pts.append((y, w * float(np.sin((1 - t * 0.94) ** 0.8 * np.pi * 0.88))
                    + 1e-4))
    pts += _head_arc(tip_y - g["finial_r"], g["finial_r"], n=7)
    img, d = _mask_of(pts, g, px, rings_at=0.495)
    d.line([_xy(px, 0.5 - w * 0.25, top + h * 0.55),
            _xy(px, 0.5 + w * 0.9 * g["width"],
                top + h * 0.55 - g["slit_angle"] * w)],
           fill=0, width=max(2, px // 38))
    return img


def _queen(g, px):
    cw = g["crown_w"]
    top = 0.155
    pts = _base_stem(g, 0.48)
    pts += [(0.40, g["stem_r"] * 1.35),
            (0.36, g["stem_r"] * g["ring_r"] * 0.9),
            (0.32, g["stem_r"] * 0.95),
            (0.26, cw * 0.55),
            (top + 0.055, cw),
            (top + 0.045, cw * 0.8)]
    img, d = _mask_of(pts, g, px, rings_at=0.455)
    n = g["crown_pts"]
    span = 2 * cw * g["width"]
    for i in range(n):
        x = 0.5 - span / 2 + span * (i + 0.5) / n
        d.polygon([_xy(px, x - span / (2 * n) * 0.85, top + 0.045),
                   _xy(px, x + span / (2 * n) * 0.85, top + 0.045),
                   _xy(px, x, top + 0.105)], fill=0)
    r = g["orb_r"]
    d.ellipse([_xy(px, 0.5 - r, top - 2 * r + 0.012),
               _xy(px, 0.5 + r, top + 0.012)], fill=255)
    return img


def _king(g, px):
    cw = g["crown_w"] * 0.94
    top = 0.19
    pts = _base_stem(g, 0.48)
    pts += [(0.40, g["stem_r"] * 1.35),
            (0.36, g["stem_r"] * g["ring_r"] * 0.9),
            (0.32, g["stem_r"] * 0.95),
            (0.26, cw * 0.6),
            (top + 0.05, cw * 0.95),
            (top + 0.005, cw * 0.4)]
    img, d = _mask_of(pts, g, px, rings_at=0.455)
    cwid = max(2, int(px * g["cross_w"]))
    ch = g["cross_h"]
    d.line([_xy(px, 0.5, top - ch), _xy(px, 0.5, top + 0.025)],
           fill=255, width=cwid)
    d.line([_xy(px, 0.5 - ch * 0.42, top - ch * 0.52),
            _xy(px, 0.5 + ch * 0.42, top - ch * 0.52)],
           fill=255, width=cwid)
    return img


def _knight(g, px):
    # plinth from the revolution grammar
    pts = _base_stem(g, 0.88)
    r = _profile_radius(pts, px)
    img = Image.fromarray(_raster(r, px, g["width"]), "L")
    d = ImageDraw.Draw(img)
    # parameterized skeleton: chest -> muzzle -> ears -> neck arch -> rump
    chest, muz, droop = g["kn_chest"], g["kn_muzzle"], g["kn_droop"]
    neck, ear = g["kn_neck"], g["kn_ear"]
    ctrl = [
        (0.50 - chest * 0.55, 0.90),             # front foot of the body
        (0.50 - chest, 0.62),                    # chest
        (0.50 - chest * 0.9, 0.44),              # throat
        (0.50 - chest - muz * 0.55, 0.34 + droop),   # under-muzzle
        (0.50 - chest - muz, 0.26 + droop),      # muzzle tip
        (0.50 - chest - muz * 0.8, 0.20 + droop),    # nose bridge
        (0.50 - chest * 0.55, 0.16),             # forehead
    ]
    # ears (sharp: inserted into the smooth outline as tall thin wedges)
    ex = 0.50 - chest * 0.35
    for e in range(g["kn_ears"]):
        ctrl += [(ex + e * ear * 1.2, 0.145),
                 (ex + e * ear * 1.2 + ear * 0.5, 0.145 - ear * 1.6),
                 (ex + e * ear * 1.2 + ear, 0.15)]
    ctrl += [
        (neck, 0.24),                            # crest of the neck
        (neck + 0.08, 0.46),                     # back of the neck
        (neck + 0.13, 0.70),                     # rump
        (neck + 0.14, 0.90),                     # rear foot of the body
    ]
    body = _smooth_closed(np.asarray(ctrl, np.float64))
    d.polygon([_xy(px, float(x), float(y)) for x, y in body], fill=255)
    # mane: serrated cuts along the back of the neck
    for i in range(g["kn_mane"]):
        y0 = 0.30 + i * 0.14
        bx = neck + 0.055 + i * 0.02
        d.polygon([_xy(px, bx, y0), _xy(px, bx + 0.065, y0 + 0.05),
                   _xy(px, bx - 0.01, y0 + 0.095)], fill=0)
    return img


_BUILDERS = {"P": _pawn, "R": _rook, "B": _bishop, "N": _knight,
             "Q": _queen, "K": _king}


def silhouette(kind: str, g: dict) -> Image.Image:
    px = SPRITE * _SS
    img = _BUILDERS[kind](g, px)
    if abs(g["squash"] - 1.0) > 1e-3:
        # vertical aspect scaling about the board surface (y = 0.97)
        new_h = int(px * g["squash"])
        scaled = img.resize((px, new_h), Image.LANCZOS)
        out = Image.new("L", (px, px), 0)
        out.paste(scaled, (0, int(0.97 * px) - int(0.97 * new_h)))
        img = out
    return img.resize((SPRITE, SPRITE), Image.LANCZOS)


# ---------------------------------------------------------------------------
# Finish (parameter-sampled)
# ---------------------------------------------------------------------------

def _finish(mask: Image.Image, white: bool, g: dict) -> Image.Image:
    from chess_vision_tpu.datagen.synth_pieces import (
        _colorize,
        _vertical_gradient,
    )

    top, bot = (_WHITE_TONES[g["f_wtone"]] if white
                else _BLACK_TONES[g["f_btone"]])
    if g["f_grad"]:
        body = _vertical_gradient(mask.size[0], top, bot).convert("RGBA")
        body.putalpha(mask)
    else:
        mixed = tuple((a + b) // 2 for a, b in zip(top, bot))
        body = _colorize(mask, mixed)
    out = Image.new("RGBA", mask.size, (0, 0, 0, 0))
    if g["f_stroke"] > 0:
        edge = (36, 32, 28) if white else (216, 210, 200)
        grown = mask.filter(ImageFilter.MaxFilter(2 * g["f_stroke"] + 1))
        out.alpha_composite(_colorize(grown, edge))
    out.alpha_composite(body)
    if g["f_sheen"]:
        px = mask.size[0]
        sheen = Image.new("L", mask.size, 0)
        sd = ImageDraw.Draw(sheen)
        sd.rectangle([px * 0.35, 0, px * 0.45, px], fill=65)
        sheen = sheen.filter(ImageFilter.GaussianBlur(px * 0.03))
        sheen = Image.composite(sheen, Image.new("L", mask.size, 0), mask)
        hi = Image.new("RGBA", mask.size, (255, 255, 255, 0))
        hi.putalpha(sheen)
        out.alpha_composite(hi)
    return out


def render_set(g: dict) -> dict[str, Image.Image]:
    """All 12 sprites of one family."""
    out = {}
    for kind in KINDS:
        mask = silhouette(kind, g)
        for white in (True, False):
            out[("w" if white else "b") + kind] = _finish(mask, white, g)
    return out


# ---------------------------------------------------------------------------
# Procedural families: one int -> one family (used by render.py "spline:<id>")
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=512)
def _family_params(family_id: int) -> tuple:
    rng = np.random.default_rng(_PROC_SEED_BASE + int(family_id))
    return tuple(sorted(sample_params(rng).items()))


@functools.lru_cache(maxsize=3072)
def _base_sprite(family_id: int, code: str) -> Image.Image:
    """Finished sprite at the native SPRITE size. The supersampled
    silhouette rasterization dominates cost, so this is the cache layer
    that matters; per-board pixel sizes resize from here (cheap).
    The generator sorts render order by style for locality, so a few
    thousand entries cover a corpus pass without thrashing."""
    g = dict(_family_params(family_id))
    mask = silhouette(code[1], g)
    return _finish(mask, code[0] == "w", g)


@functools.lru_cache(maxsize=4096)
def procedural_sprite(family_id: int, code: str, px: int) -> Image.Image:
    """Sprite of piece `code` ('wK'..'bP') from procedural family_id,
    resized to px. Deterministic in (family_id, code, px)."""
    sprite = _base_sprite(family_id, code)
    if px != SPRITE:
        sprite = sprite.resize((px, px), Image.LANCZOS)
    return sprite


# ---------------------------------------------------------------------------
# Fixed named families (baked to disk for previews + pool parity)
# ---------------------------------------------------------------------------

N_FIXED = 16
STYLE_DIRS = {f"spline_{i:02d}": i for i in range(N_FIXED)}


def synthesize(out_dir: str, styles: list[str] | None = None) -> int:
    names = styles or list(STYLE_DIRS)
    for name in names:
        rng = np.random.default_rng(_FIXED_SEED_BASE + STYLE_DIRS[name])
        g = sample_params(rng)
        d = os.path.join(out_dir, name)
        os.makedirs(d, exist_ok=True)
        for code, sprite in render_set(g).items():
            sprite.save(os.path.join(d, f"{code}.png"))
    return len(names)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", default="assets/pieces")
    parser.add_argument("--styles", nargs="*", default=None,
                        help=f"subset of {list(STYLE_DIRS)}")
    args = parser.parse_args()
    n = synthesize(args.out, args.styles)
    print(f"{n} spline piece sets -> {args.out}")


if __name__ == "__main__":
    main()
