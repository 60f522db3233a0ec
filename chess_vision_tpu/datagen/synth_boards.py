"""Synthesize board-texture images offline.

The reference ships 23 downloaded board textures and uses any file in
``assets/boards/`` as a full-board background (reference render.js:26-30,
135-142). Offline there is nothing to download, so this module bakes a set
of procedural texture *images* to disk — wood grains, marbles, paper,
fabric weave, stone, brushed metal, and gradient washes — which the
renderer then discovers and consumes through the exact same image-texture
path as downloaded assets (render.discover_assets / _get_texture_image).

This complements the renderer's built-in 3 procedural texture *kinds*
(render._make_texture): those are the zero-asset fallback; these are
persistent, reproducible image assets that widen visual diversity the way
the reference's texture pool does (style diversity is load-bearing for OOD
robustness, reference experiments/EXPERIMENTS.md:102-110).

Usage:
    python -m chess_vision_tpu.datagen.synth_boards --out assets/boards
"""

from __future__ import annotations

import argparse
import os
import zlib

import numpy as np
from PIL import Image, ImageFilter


def _fbm(rng: np.random.Generator, size: int, octaves: int = 4,
         base_cells: int = 4) -> np.ndarray:
    """Fractal value noise in [0,1]: sum of bilinear-upsampled random grids."""
    out = np.zeros((size, size), np.float32)
    amp, total = 1.0, 0.0
    for o in range(octaves):
        cells = base_cells * (2 ** o)
        if cells >= size:
            break
        grid = rng.random((cells, cells)).astype(np.float32)
        img = Image.fromarray((grid * 255).astype(np.uint8)).resize(
            (size, size), Image.BILINEAR
        )
        out += amp * (np.asarray(img, np.float32) / 255.0)
        total += amp
        amp *= 0.5
    return out / max(total, 1e-9)


def _coords(size: int):
    y, x = np.mgrid[0:size, 0:size].astype(np.float32) / size
    return y, x


def _tex_wood(rng, size):
    """Planked wood: warped grain rings + per-plank tone + seam lines."""
    y, x = _coords(size)
    base = np.array([0.42, 0.27, 0.14]) + 0.25 * rng.random(3)
    warp = _fbm(rng, size, octaves=3) - 0.5
    freq = 10 + 14 * rng.random()
    grain = 0.5 + 0.5 * np.sin(2 * np.pi * (freq * x + 2.5 * warp))
    n_planks = int(4 + rng.integers(0, 4))
    plank = np.floor(y * n_planks)
    tone = 0.85 + 0.3 * rng.random(n_planks + 1)[plank.astype(int)]
    seam = np.abs(y * n_planks - np.round(y * n_planks)) < 0.01
    tex = base[None, None] * (0.75 + 0.3 * grain)[..., None] * tone[..., None]
    tex[seam] *= 0.55
    return tex


def _tex_marble(rng, size):
    """Veined marble: turbulence-displaced sine sheets on a light base."""
    y, x = _coords(size)
    turb = _fbm(rng, size, octaves=5)
    phase = rng.random() * 6.28
    veins = np.abs(np.sin(2 * np.pi * (x * (1.5 + 2 * rng.random())
                                       + 4.0 * turb) + phase))
    tint = 0.06 * rng.random(3)
    base = np.array([0.88, 0.87, 0.85]) - tint
    dark = np.array([0.45, 0.43, 0.46]) + tint
    w = np.power(veins, 3.0 + 2 * rng.random())[..., None]
    return base[None, None] * w + dark[None, None] * (1 - w) * 0.35 + \
        base[None, None] * (1 - w) * 0.65


def _tex_paper(rng, size):
    """Aged paper: low-contrast mottling + faint fiber speckle + vignette."""
    y, x = _coords(size)
    mottle = _fbm(rng, size, octaves=4, base_cells=3)
    speck = rng.random((size, size)).astype(np.float32)
    base = np.array([0.88, 0.82, 0.68]) + 0.08 * rng.random(3) - 0.04
    field = 0.88 + 0.1 * mottle + 0.04 * (speck - 0.5)
    r = np.hypot(x - 0.5, y - 0.5)
    vignette = 1.0 - 0.25 * np.clip(r - 0.3, 0, 1) ** 2
    return base[None, None] * (field * vignette)[..., None]


def _tex_fabric(rng, size):
    """Woven cloth: crossed warp/weft sinusoids + thread noise."""
    y, x = _coords(size)
    freq = 48 + 32 * rng.random()
    warp = 0.5 + 0.5 * np.sin(2 * np.pi * freq * x)
    weft = 0.5 + 0.5 * np.sin(2 * np.pi * freq * y + 1.1)
    weave = np.maximum(warp, weft)
    noise = _fbm(rng, size, octaves=3, base_cells=8)
    hue = rng.random(3)
    base = 0.25 + 0.5 * hue
    field = 0.7 + 0.22 * weave + 0.1 * (noise - 0.5)
    return base[None, None] * field[..., None]


def _tex_stone(rng, size):
    """Granite: high-octave noise with sparse dark flecks."""
    field = _fbm(rng, size, octaves=6, base_cells=6)
    flecks = (rng.random((size, size)) < 0.01).astype(np.float32)
    flecks = np.asarray(
        Image.fromarray((flecks * 255).astype(np.uint8)).filter(
            ImageFilter.MaxFilter(3)
        ),
        np.float32,
    ) / 255.0
    grey = 0.45 + 0.25 * rng.random()
    base = np.array([grey, grey, grey]) + 0.05 * (rng.random(3) - 0.5)
    tex = base[None, None] * (0.75 + 0.35 * field)[..., None]
    return tex * (1.0 - 0.5 * flecks[..., None])


def _tex_metal(rng, size):
    """Brushed metal: direction-blurred streak noise + broad sheen."""
    y, x = _coords(size)
    streaks = rng.random((size, size)).astype(np.float32)
    img = Image.fromarray((streaks * 255).astype(np.uint8))
    horizontal = rng.random() < 0.5
    for _ in range(3):
        img = img.filter(ImageFilter.BoxBlur((9, 0) if horizontal else (0, 9)))
    streaks = np.asarray(img, np.float32) / 255.0
    sheen = 0.5 + 0.5 * np.sin(
        2 * np.pi * ((x + y) * (0.6 + 0.5 * rng.random()) + rng.random())
    )
    grey = np.array([0.62, 0.64, 0.68]) + 0.08 * (rng.random(3) - 0.5)
    field = 0.75 + 0.18 * (streaks - 0.5) + 0.12 * (sheen - 0.5)
    return grey[None, None] * field[..., None]


def _tex_gradient(rng, size):
    """Two-tone diagonal wash with soft cloud modulation."""
    y, x = _coords(size)
    ang = rng.random() * 2 * np.pi
    t = np.clip((np.cos(ang) * x + np.sin(ang) * y + 1) / 2, 0, 1)
    c1 = 0.25 + 0.6 * rng.random(3)
    c2 = 0.25 + 0.6 * rng.random(3)
    clouds = _fbm(rng, size, octaves=4)
    tex = c1[None, None] * t[..., None] + c2[None, None] * (1 - t[..., None])
    return tex * (0.85 + 0.2 * clouds[..., None])


# family name -> (render fn, variants)
SYNTH_TEXTURES = {
    "wood": (_tex_wood, 4),
    "marble": (_tex_marble, 3),
    "paper": (_tex_paper, 3),
    "fabric": (_tex_fabric, 3),
    "stone": (_tex_stone, 3),
    "metal": (_tex_metal, 2),
    "gradient": (_tex_gradient, 2),
}


def synthesize(out_dir: str, size: int = 512, seed: int = 7,
               families: list[str] | None = None) -> int:
    """Write synth_<family><i>.jpg textures; returns file count."""
    os.makedirs(out_dir, exist_ok=True)
    names = families or list(SYNTH_TEXTURES)
    count = 0
    for name in names:
        fn, variants = SYNTH_TEXTURES[name]
        for i in range(variants):
            # stable per-family offset (builtin hash is per-process salted)
            fam = zlib.crc32(name.encode()) % 997
            rng = np.random.default_rng(seed * 1000 + fam + i)
            tex = np.clip(fn(rng, size), 0.0, 1.0)
            img = Image.fromarray((tex * 255).astype(np.uint8))
            img.save(os.path.join(out_dir, f"synth_{name}{i}.jpg"),
                     quality=92)
            count += 1
    return count


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", default="assets/boards")
    parser.add_argument("--size", type=int, default=512)
    parser.add_argument("--seed", type=int, default=7)
    parser.add_argument("--families", nargs="*", default=None,
                        help=f"subset of {list(SYNTH_TEXTURES)}")
    args = parser.parse_args()
    n = synthesize(args.out, args.size, args.seed, args.families)
    print(f"{n} board textures -> {args.out}")


if __name__ == "__main__":
    main()
