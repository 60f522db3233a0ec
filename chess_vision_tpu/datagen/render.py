"""Synthetic chess board rendering (PIL).

Python replacement for the reference's Node/@napi-rs/canvas renderer
(datagen/render.js): board = colored squares (fixed classic palettes or
random cohesive palettes), pieces = image-based sets auto-discovered from an
assets directory (reference render.js:17-23) with font-glyph styles as the
always-available fallback, board backgrounds = image textures from
assets/boards (render.js:26-30) or procedural fields, optional
last-move-style highlight overlay, optional flipped orientation (labels
corrected by the caller via flip_fen, mirroring render-worker.js:14-24),
JPEG q90 output.

All randomness is taken from an explicit numpy Generator so the caller can
pre-assign styles deterministically before fanning out to workers
(reference generate.js:52-57 determinism discipline).
"""

from __future__ import annotations

import colorsys
import os
from dataclasses import dataclass, field

import numpy as np
from PIL import Image, ImageDraw, ImageFilter, ImageFont

from chess_vision_tpu.fen import fen_to_labels

_FONT_DIR = "/usr/share/fonts/truetype/dejavu"
# Only the DejaVu Sans/Mono families ship real chess glyphs (Serif renders
# tofu boxes — verified by rendering, not bbox checks).
_FONTS = {
    "sans": f"{_FONT_DIR}/DejaVuSans.ttf",
    "sans_bold": f"{_FONT_DIR}/DejaVuSans-Bold.ttf",
    "mono": f"{_FONT_DIR}/DejaVuSansMono.ttf",
    "mono_bold": f"{_FONT_DIR}/DejaVuSansMono-Bold.ttf",
}

# Outline glyphs U+2654-2659 (white) and filled U+265A-265F (black). Rendering
# the *filled* glyph with configurable fill + stroke gives solid pieces in any
# color; the outline glyph gives a line-art look.
_FILLED = {"K": "♚", "Q": "♛", "R": "♜", "B": "♝", "N": "♞", "P": "♟"}
_OUTLINE = {"K": "♔", "Q": "♕", "R": "♖", "B": "♗", "N": "♘", "P": "♙"}

# Classic fixed board palettes (light, dark), mirroring the reference's fixed
# palette set (render.js:109-124 has 4 fixed palettes + random mode).
_FIXED_PALETTES = [
    ((240, 217, 181), (181, 136, 99)),   # lichess brown
    ((238, 238, 210), (118, 150, 86)),   # chess.com green
    ((222, 227, 230), (140, 162, 173)),  # blue-gray
    ((255, 255, 221), (134, 166, 102)),  # yellow-green
]

_HIGHLIGHT_COLORS = [
    (255, 255, 0, 110), (155, 199, 0, 120), (0, 180, 255, 100),
    (255, 120, 0, 110), (255, 0, 90, 90),
]

PIECE_STYLE_NAMES = [
    f"{font}_{scheme}"
    for font in _FONTS
    for scheme in ("classic", "solid", "outline")
]


TEXTURE_KINDS = ("wood", "marble", "noise")


# --- Image assets (reference render.js:17-30 auto-discovery parity) --------
#
# assets/pieces/<style>/ : a piece set = any directory whose image files
#   cover all 12 pieces. Accepted basenames (case-insensitive): "wK"/"bP"
#   (our download_assets naming) or "WhiteKing"/"BlackPawn" (the reference's
#   chess-fen2img naming). Styles are exposed as "img:<dirname>".
# assets/boards/ : any jpg/jpeg/png file is a board texture, exposed in
#   BoardStyle.texture as ("img", filename).

_PIECE_CODES = ["wK", "wQ", "wR", "wB", "wN", "wP",
                "bK", "bQ", "bR", "bB", "bN", "bP"]
_LONG_NAMES = {"king": "K", "queen": "Q", "rook": "R", "bishop": "B",
               "knight": "N", "pawn": "P"}
_IMG_EXTS = (".png", ".jpg", ".jpeg")


def _piece_code_from_stem(stem: str) -> str | None:
    s = stem.lower()
    if len(s) == 2 and s[0] in "wb" and s[1] in "kqrbnp":
        return s[0] + s[1].upper()
    for color in ("white", "black"):
        if s.startswith(color) and s[len(color):] in _LONG_NAMES:
            return color[0] + _LONG_NAMES[s[len(color):]]
    return None


def discover_assets(assets_dir: str) -> tuple[dict, list]:
    """Scan an assets directory. Returns (piece_sets, textures):
    piece_sets: {style_name: {piece_code: abs_path}} (only complete sets),
    textures: sorted list of absolute texture file paths."""
    piece_sets: dict = {}
    piece_root = os.path.join(assets_dir, "pieces")
    if os.path.isdir(piece_root):
        for d in sorted(os.listdir(piece_root)):
            set_dir = os.path.join(piece_root, d)
            if not os.path.isdir(set_dir):
                continue
            found: dict = {}
            for f in os.listdir(set_dir):
                stem, ext = os.path.splitext(f)
                if ext.lower() not in _IMG_EXTS:
                    continue
                code = _piece_code_from_stem(stem)
                if code:
                    found[code] = os.path.join(set_dir, f)
            if all(c in found for c in _PIECE_CODES):
                piece_sets[d] = found
    board_root = os.path.join(assets_dir, "boards")
    textures = []
    if os.path.isdir(board_root):
        textures = sorted(
            os.path.join(board_root, f)
            for f in os.listdir(board_root)
            if os.path.splitext(f)[1].lower() in _IMG_EXTS
        )
    return piece_sets, textures


_ASSETS: dict = {"dir": None, "piece_sets": {}, "textures": []}


def set_assets_dir(assets_dir: str | None) -> None:
    """Point the renderer at an assets directory (idempotent; None clears).
    Called by the generator in the main process (so style pre-assignment
    sees the discovered pools) and again in each render worker."""
    if assets_dir == _ASSETS["dir"]:
        return
    _ASSETS["dir"] = assets_dir
    _ASSETS["piece_sets"], _ASSETS["textures"] = (
        discover_assets(assets_dir) if assets_dir else ({}, [])
    )
    _piece_img_cache.clear()
    _texture_img_cache.clear()


def available_piece_styles() -> list[str]:
    """Font styles + discovered image sets (the reference's PIECE_STYLES)."""
    return PIECE_STYLE_NAMES + [f"img:{n}" for n in sorted(_ASSETS["piece_sets"])]


def available_textures() -> list[str]:
    return [os.path.basename(p) for p in _ASSETS["textures"]]


@dataclass
class BoardStyle:
    piece_style: str = "sans_classic"
    light: tuple = (240, 217, 181)
    dark: tuple = (181, 136, 99)
    flipped: bool = False
    highlight: tuple | None = None   # (sq_a, sq_b, color_idx) or None
    jitter: float = 0.0              # piece placement jitter in fraction of square
    scale: float = 0.78              # glyph size relative to square
    texture: tuple | None = None     # (kind, seed) procedural background texture
    extras: dict = field(default_factory=dict)


def _make_texture(kind: str, seed: int, size: int) -> np.ndarray:
    """Procedural background texture, (size, size, 3) float in [0,1].

    Replaces the reference's 23 downloaded board-texture images
    (render.js:26-30) with offline-generated wood/marble/noise fields.
    """
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:size, 0:size].astype(np.float32) / size
    if kind == "wood":
        freq = 6 + 10 * rng.random()
        warp = np.sin(2 * np.pi * (y * (1 + rng.random()) + rng.random()))
        grain = 0.5 + 0.5 * np.sin(2 * np.pi * freq * (x + 0.08 * warp))
        base = np.array([0.55, 0.38, 0.22]) + 0.2 * rng.random(3)
        tex = base[None, None] * (0.8 + 0.25 * grain[..., None])
    elif kind == "marble":
        phase = rng.random() * 6.28
        veins = np.abs(np.sin(2 * np.pi * (x + y) * (2 + 3 * rng.random()) + phase
                              + 2.0 * np.sin(2 * np.pi * y * 3)))
        base = np.array([0.85, 0.84, 0.82]) - 0.1 * rng.random(3)
        tex = base[None, None] * (0.75 + 0.25 * veins[..., None])
    else:  # noise
        small = rng.random((size // 16, size // 16, 3)).astype(np.float32)
        img = Image.fromarray((small * 255).astype(np.uint8)).resize(
            (size, size), Image.BILINEAR
        )
        tex = 0.55 + 0.4 * (np.asarray(img, np.float32) / 255.0)
    return np.clip(tex, 0.0, 1.0)


def _random_palette(rng: np.random.Generator) -> tuple[tuple, tuple]:
    """Cohesive random palette: shared hue, light + dark lightness split."""
    h = rng.random()
    s = 0.15 + 0.5 * rng.random()
    light_l = 0.75 + 0.15 * rng.random()
    dark_l = 0.35 + 0.2 * rng.random()
    to_rgb = lambda l: tuple(  # noqa: E731
        int(255 * v) for v in colorsys.hls_to_rgb(h, l, s)
    )
    return to_rgb(light_l), to_rgb(dark_l)


def filter_piece_styles(patterns: list[str] | None) -> list[str]:
    """Restrict the style pool with fnmatch patterns (e.g. ["img:geo_*"]).

    Enables style-holdout OOD splits: train on one pool, test on styles the
    model never saw — the offline analogue of the reference's Kaggle OOD
    evaluation (its pieces are drawn by renderers absent from training)."""
    import fnmatch

    styles = available_piece_styles()
    if not patterns:
        return styles
    keep = [s for s in styles
            if any(fnmatch.fnmatch(s, p) for p in patterns)]
    if not keep:
        raise ValueError(
            f"style filter {patterns} matches none of {styles}")
    return keep


def random_style(
    rng: np.random.Generator,
    highlight_pct: float = 0.6,
    flip_pct: float = 0.3,
    texture_pct: float = 0.5,
    last_move: tuple | None = None,
    styles: list[str] | None = None,
    spline_pct: float = 0.0,
    spline_families: int = 0,
    geom_jitter: float = 0.0,
) -> BoardStyle:
    """Sample a board style. Beyond the reference's knobs (render.js
    randomStyle, :127-150) two round-4 breadth levers:

    - spline_pct/spline_families: with probability spline_pct the piece
      style is a procedurally sampled "spline:<id>" family (id uniform in
      [0, spline_families)) from the continuous spline-revolution grammar
      (spline_pieces.py) instead of a fixed pool member — thousands of
      distinct silhouette families instead of dozens.
    - geom_jitter: per-board piece-geometry jitter — anisotropic scale,
      shear, and outline-width delta applied to every sprite at paste time,
      so even a repeated family never shows the exact same silhouette.
    """
    if styles is None:
        styles = available_piece_styles()
    if spline_families > 0 and rng.random() < spline_pct:
        piece_style = f"spline:{int(rng.integers(0, spline_families))}"
    else:
        piece_style = styles[int(rng.integers(0, len(styles)))]
    if rng.random() < 0.5:
        light, dark = _FIXED_PALETTES[int(rng.integers(0, len(_FIXED_PALETTES)))]
    else:
        light, dark = _random_palette(rng)
    # Highlight marks the REAL last move (reference render.js:204-208 uses
    # item.lastMove) — it is what makes side-to-move visually inferable.
    # Positions without a move history (random source) get no highlight.
    highlight = None
    if last_move is not None and rng.random() < highlight_pct:
        highlight = (int(last_move[0]), int(last_move[1]),
                     int(rng.integers(0, len(_HIGHLIGHT_COLORS))))
    # Image textures take precedence when discovered (the reference only
    # falls back to flat colors when boards/ is empty, render.js:135-142);
    # procedural textures remain the offline fallback.
    texture = None
    if rng.random() < texture_pct:
        files = _ASSETS["textures"]
        if files:
            texture = ("img", os.path.basename(
                files[int(rng.integers(0, len(files)))]
            ))
        else:
            kind = TEXTURE_KINDS[int(rng.integers(0, len(TEXTURE_KINDS)))]
            texture = (kind, int(rng.integers(0, 2**31 - 1)))
    extras = {}
    if geom_jitter > 0:
        g = geom_jitter
        extras["geom"] = (
            float(1.0 + (rng.random() - 0.5) * 2 * g),        # x scale
            float(1.0 + (rng.random() - 0.5) * 2 * g),        # y scale
            float((rng.random() - 0.5) * g),                  # shear
            int(rng.integers(0, 3)) if rng.random() < 0.4 else 0,  # stroke px
        )
    return BoardStyle(
        piece_style=piece_style,
        light=light,
        dark=dark,
        flipped=bool(rng.random() < flip_pct),
        highlight=highlight,
        jitter=float(rng.random() * 0.04),
        scale=float(0.72 + rng.random() * 0.12),
        texture=texture,
        extras=extras,
    )


_font_cache: dict = {}
_piece_img_cache: dict = {}
_texture_img_cache: dict = {}


def _get_font(path: str, px: int):
    key = (path, px)
    if key not in _font_cache:
        _font_cache[key] = ImageFont.truetype(path, px)
    return _font_cache[key]


def _get_piece_image(style_name: str, code: str, px: int) -> Image.Image:
    key = (style_name, code, px)
    if key not in _piece_img_cache:
        sets = _ASSETS["piece_sets"]
        if style_name not in sets:
            raise FileNotFoundError(
                f"piece set {style_name!r} not found under "
                f"{_ASSETS['dir']!r} (call set_assets_dir first)"
            )
        img = Image.open(sets[style_name][code]).convert("RGBA")
        _piece_img_cache[key] = img.resize((px, px), Image.LANCZOS)
    return _piece_img_cache[key]


_geom_cache: dict = {}


def _geom_transform(sprite: Image.Image, sx: float, sy: float,
                    shear: float, stroke: int) -> Image.Image:
    """Per-board piece-geometry jitter: anisotropic scale + shear about the
    sprite's bottom-center (pieces stay seated on the square), plus an
    optional re-outline (alpha dilation composited as a contrasting edge).
    Deterministic in its arguments; cached per (sprite, params) because the
    same transform applies to all pieces of one board."""
    key = (id(sprite), round(sx, 4), round(sy, 4), round(shear, 4), stroke)
    hit = _geom_cache.get(key)
    if hit is not None:
        return hit
    w, h = sprite.size
    out = sprite
    if abs(sx - 1) > 1e-3 or abs(sy - 1) > 1e-3 or abs(shear) > 1e-3:
        # inverse-map coefficients for Image.transform(AFFINE): maps output
        # (x, y) -> input (a x + b y + c, d x + e y + f); anchor bottom-center
        a, e = 1.0 / sx, 1.0 / sy
        b = -shear / sx
        c = (w / 2) * (1 - a) - b * h
        f = h * (1 - e)
        out = sprite.transform((w, h), Image.AFFINE, (a, b, c, 0.0, e, f),
                               resample=Image.BILINEAR)
    if stroke > 0:
        alpha = out.getchannel("A")
        grown = alpha.filter(ImageFilter.MaxFilter(2 * stroke + 1))
        edge = Image.new("RGBA", out.size, (24, 22, 20, 255))
        edge.putalpha(grown)
        merged = edge
        merged.alpha_composite(out)
        out = merged
    if len(_geom_cache) > 4096:
        _geom_cache.clear()
    _geom_cache[key] = out
    return out


def _get_texture_image(filename: str, size: int) -> Image.Image:
    key = (filename, size)
    if key not in _texture_img_cache:
        path = next(
            (p for p in _ASSETS["textures"]
             if os.path.basename(p) == filename), None
        )
        if path is None:
            raise FileNotFoundError(
                f"board texture {filename!r} not found under {_ASSETS['dir']!r}"
            )
        img = Image.open(path).convert("RGB")
        _texture_img_cache[key] = img.resize((size, size), Image.BILINEAR)
    return _texture_img_cache[key]


def render_board(
    placement_fen: str,
    style: BoardStyle,
    size: int = 256,
    rng: np.random.Generator | None = None,
) -> Image.Image:
    """Render a placement FEN. If style.flipped, the *image* is flipped —
    callers must store flip_fen(placement_fen) as the label."""
    rng = rng or np.random.default_rng(0)
    sq_px = size / 8.0
    img = Image.new("RGB", (size, size), style.light)
    draw = ImageDraw.Draw(img, "RGBA")

    if style.texture is not None:
        kind, tex_arg = style.texture
        if kind == "img":
            img.paste(_get_texture_image(tex_arg, size))
        else:
            tex = _make_texture(kind, int(tex_arg), size)
            img.paste(Image.fromarray((tex * 255).astype(np.uint8)))
        square_alpha = 190  # squares tint the texture instead of covering it
    else:
        square_alpha = 255

    for r in range(8):
        for c in range(8):
            color = style.light if (r + c) % 2 == 0 else style.dark
            draw.rectangle(
                [c * sq_px, r * sq_px, (c + 1) * sq_px + 1, (r + 1) * sq_px + 1],
                fill=tuple(color) + (square_alpha,),
            )

    if style.highlight is not None:
        a, b, color_idx = style.highlight
        for s in (a, b):
            if style.flipped:
                s = 63 - s  # highlights follow the board orientation
            r, c = divmod(s, 8)
            draw.rectangle(
                [c * sq_px, r * sq_px, (c + 1) * sq_px + 1, (r + 1) * sq_px + 1],
                fill=_HIGHLIGHT_COLORS[color_idx],
            )

    image_set = None
    spline_family = None
    if style.piece_style.startswith("img:"):
        image_set = style.piece_style[4:]
        # piece sprites are drawn near square size; scale jitters +-8%
        piece_px = max(8, min(int(sq_px), int(sq_px * style.scale / 0.78)))
    elif style.piece_style.startswith("spline:"):
        spline_family = int(style.piece_style[7:])
        piece_px = max(8, min(int(sq_px), int(sq_px * style.scale / 0.78)))
    else:
        font_name, scheme = style.piece_style.rsplit("_", 1)
        font_px = max(8, int(sq_px * style.scale / 0.75))
        font = _get_font(_FONTS[font_name], font_px)
    stroke = max(1, round(size / 256))

    labels = fen_to_labels(placement_fen)
    board = labels.reshape(8, 8)
    if style.flipped:
        board = board[::-1, ::-1]

    from chess_vision_tpu.fen import INDEX_TO_PIECE

    for r in range(8):
        for c in range(8):
            cls = int(board[r, c])
            if cls == 0:
                continue
            piece = INDEX_TO_PIECE[cls]
            is_white = piece.isupper()
            kind = piece.upper()

            if image_set is not None or spline_family is not None:
                jx = (rng.random() - 0.5) * 2 * style.jitter * sq_px
                jy = (rng.random() - 0.5) * 2 * style.jitter * sq_px
                code = ("w" if is_white else "b") + kind
                if spline_family is not None:
                    from chess_vision_tpu.datagen.spline_pieces import (
                        procedural_sprite,
                    )

                    sprite = procedural_sprite(spline_family, code, piece_px)
                else:
                    sprite = _get_piece_image(image_set, code, piece_px)
                geom = style.extras.get("geom") if style.extras else None
                if geom is not None:
                    sprite = _geom_transform(sprite, *geom)
                x0 = int((c + 0.5) * sq_px - sprite.width / 2 + jx)
                y0 = int((r + 0.5) * sq_px - sprite.height / 2 + jy)
                img.paste(sprite, (x0, y0), sprite)
                continue

            if scheme == "outline":
                # white = hollow line-art glyph drawn dark; black = solid dark
                glyph = _OUTLINE[kind] if is_white else _FILLED[kind]
                fill = (25, 25, 25)
                stroke_fill = (230, 230, 230)
                sw = 0 if is_white else stroke
            elif scheme == "solid":
                glyph = _FILLED[kind]
                fill = (235, 235, 235) if is_white else (30, 30, 30)
                stroke_fill = (30, 30, 30) if is_white else (235, 235, 235)
                sw = stroke
            else:  # classic: filled glyph, white pieces white w/ dark stroke
                glyph = _FILLED[kind]
                fill = (255, 255, 255) if is_white else (0, 0, 0)
                stroke_fill = (0, 0, 0) if is_white else (90, 90, 90)
                sw = stroke if is_white else 0

            jx = (rng.random() - 0.5) * 2 * style.jitter * sq_px
            jy = (rng.random() - 0.5) * 2 * style.jitter * sq_px
            cx = (c + 0.5) * sq_px + jx
            cy = (r + 0.5) * sq_px + jy
            draw.text(
                (cx, cy), glyph, font=font, fill=fill, anchor="mm",
                stroke_width=sw, stroke_fill=stroke_fill,
            )
    return img


def save_board(img: Image.Image, path: str, fmt: str = "jpeg", quality: int = 90):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    if fmt == "jpeg":
        img.save(path, "JPEG", quality=quality)
    else:
        img.save(path, "PNG")
