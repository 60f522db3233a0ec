"""Synthesize image-based piece sets offline.

The reference's OOD robustness is driven by piece-style diversity (26 image
sets; its own history shows style count driving OOD board accuracy,
reference experiments/EXPERIMENTS.md:102-110). This environment has no
network for the lichess downloads, so this module bakes additional *image*
piece sets to disk by rendering the chess font glyphs through distinct
raster effect pipelines (gradient fills, drop shadows, bevels, pixel-art,
two-tone inversions). The output directories are auto-discovered by the
renderer exactly like downloaded sets (render.py discover_assets), so they
widen the style pool for both training data and previews.

Usage:
    python -m chess_vision_tpu.datagen.synth_pieces --out assets/pieces
"""

from __future__ import annotations

import argparse
import os

from PIL import Image, ImageDraw, ImageFilter, ImageFont

from chess_vision_tpu.datagen.render import _FILLED, _FONTS, _OUTLINE

SPRITE = 80  # match the reference's rasterized piece size
_CODES = {"K": "K", "Q": "Q", "R": "R", "B": "B", "N": "N", "P": "P"}


def _glyph_mask(kind: str, font_path: str, px: int, outline: bool = False,
                stroke: int = 0) -> Image.Image:
    """Glyph alpha mask rendered oversized then fitted into px x px."""
    big = px * 4
    img = Image.new("L", (big, big), 0)
    draw = ImageDraw.Draw(img)
    font = ImageFont.truetype(font_path, int(big * 0.78))
    glyph = (_OUTLINE if outline else _FILLED)[kind]
    draw.text((big / 2, big / 2), glyph, font=font, fill=255, anchor="mm",
              stroke_width=stroke * 4, stroke_fill=255)
    return img.resize((px, px), Image.LANCZOS)


def _vertical_gradient(px: int, top: tuple, bottom: tuple) -> Image.Image:
    g = Image.new("RGB", (1, px))
    for y in range(px):
        t = y / max(px - 1, 1)
        g.putpixel((0, y), tuple(
            int(a + (b - a) * t) for a, b in zip(top, bottom)
        ))
    return g.resize((px, px))


def _colorize(mask: Image.Image, color: tuple) -> Image.Image:
    img = Image.new("RGBA", mask.size, tuple(color) + (0,))
    img.putalpha(mask)
    return img


def _sprite_flat(kind, font, white, px=SPRITE):
    body = (245, 245, 240) if white else (40, 38, 36)
    edge = (30, 30, 30) if white else (215, 215, 215)
    out = _colorize(_glyph_mask(kind, font, px, stroke=1), edge)
    out.alpha_composite(_colorize(_glyph_mask(kind, font, px), body))
    return out


def _sprite_gradient(kind, font, white, px=SPRITE):
    mask = _glyph_mask(kind, font, px)
    grad = (_vertical_gradient(px, (255, 250, 230), (180, 160, 120)) if white
            else _vertical_gradient(px, (110, 110, 125), (20, 20, 30)))
    body = grad.convert("RGBA")
    body.putalpha(mask)
    edge = _colorize(_glyph_mask(kind, font, px, stroke=1),
                     (25, 25, 25) if white else (200, 200, 205))
    edge.alpha_composite(body)
    return edge


def _sprite_shadow(kind, font, white, px=SPRITE):
    mask = _glyph_mask(kind, font, px)
    shadow = _colorize(mask, (0, 0, 0)).filter(ImageFilter.GaussianBlur(2))
    out = Image.new("RGBA", (px, px), (0, 0, 0, 0))
    out.alpha_composite(shadow, (3, 3))
    body = (250, 245, 235) if white else (55, 45, 40)
    out.alpha_composite(_colorize(_glyph_mask(kind, font, px, stroke=1),
                                  (20, 20, 20) if white else (230, 225, 215)))
    out.alpha_composite(_colorize(mask, body))
    return out


def _sprite_pixel(kind, font, white, px=SPRITE):
    small = 20
    mask = _glyph_mask(kind, font, small)
    mask = mask.point(lambda a: 255 if a > 110 else 0)
    body = (235, 235, 235) if white else (35, 35, 35)
    sprite = _colorize(mask, body)
    # 1px contrasting pixel outline for board contrast
    edge_mask = mask.filter(ImageFilter.MaxFilter(3)).point(
        lambda a: 255 if a > 0 else 0
    )
    edge = _colorize(edge_mask, (20, 20, 20) if white else (220, 220, 220))
    edge.alpha_composite(sprite)
    return edge.resize((px, px), Image.NEAREST)


def _sprite_bevel(kind, font, white, px=SPRITE):
    mask = _glyph_mask(kind, font, px)
    base = (210, 205, 190) if white else (70, 65, 70)
    out = Image.new("RGBA", (px, px), (0, 0, 0, 0))
    hi = _colorize(mask, (255, 255, 255))
    lo = _colorize(mask, (0, 0, 0))
    out.alpha_composite(lo, (2, 2))
    out.alpha_composite(hi, (-1, -1))
    out.alpha_composite(_colorize(mask, base))
    return out


def _sprite_hollow(kind, font, white, px=SPRITE):
    # line-art look from the outline glyphs; black pieces inverted-filled
    if white:
        return _colorize(_glyph_mask(kind, font, px, outline=True),
                         (25, 25, 25))
    out = _colorize(_glyph_mask(kind, font, px, stroke=1), (240, 240, 240))
    out.alpha_composite(_colorize(_glyph_mask(kind, font, px), (25, 25, 25)))
    return out


def _sprite_tinted(kind, font, white, px=SPRITE, tint=(188, 142, 60)):
    mask = _glyph_mask(kind, font, px)
    body = tuple(min(255, c + 50) for c in tint) if white else tuple(
        max(0, c - 110) for c in tint
    )
    edge = (30, 25, 15) if white else (235, 225, 205)
    out = _colorize(_glyph_mask(kind, font, px, stroke=1), edge)
    out.alpha_composite(_colorize(mask, body))
    return out


# style name -> (effect fn, font key)
SYNTH_STYLES = {
    "synth_flat": (_sprite_flat, "sans"),
    "synth_flat_mono": (_sprite_flat, "mono"),
    "synth_gradient": (_sprite_gradient, "sans"),
    "synth_gradient_bold": (_sprite_gradient, "sans_bold"),
    "synth_shadow": (_sprite_shadow, "sans"),
    "synth_shadow_mono": (_sprite_shadow, "mono_bold"),
    "synth_pixel": (_sprite_pixel, "sans"),
    "synth_pixel_bold": (_sprite_pixel, "sans_bold"),
    "synth_bevel": (_sprite_bevel, "sans"),
    "synth_bevel_mono": (_sprite_bevel, "mono"),
    "synth_hollow": (_sprite_hollow, "sans"),
    "synth_hollow_bold": (_sprite_hollow, "sans_bold"),
    "synth_bronze": (_sprite_tinted, "sans"),
    "synth_bronze_mono": (_sprite_tinted, "mono_bold"),
}


def synthesize(out_dir: str, styles: list[str] | None = None) -> int:
    names = styles or list(SYNTH_STYLES)
    for name in names:
        fn, font_key = SYNTH_STYLES[name]
        d = os.path.join(out_dir, name)
        os.makedirs(d, exist_ok=True)
        for kind in _CODES:
            for white in (True, False):
                sprite = fn(kind, _FONTS[font_key], white)
                code = ("w" if white else "b") + kind
                sprite.save(os.path.join(d, f"{code}.png"))
    return len(names)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", default="assets/pieces")
    parser.add_argument("--styles", nargs="*", default=None,
                        help=f"subset of {list(SYNTH_STYLES)}")
    args = parser.parse_args()
    n = synthesize(args.out, args.styles)
    print(f"{n} piece sets -> {args.out}")


if __name__ == "__main__":
    main()
