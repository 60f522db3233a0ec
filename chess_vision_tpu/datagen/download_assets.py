"""Asset/PGN downloaders (capability parity with the reference's
datagen/download_pieces.js, download_boards.js, download_pgn.sh).

The reference augments its 12 bundled piece styles with 14 lichess piece sets,
24 lichess board textures, and Lichess monthly PGN databases. This module
provides the same acquisition paths for network-enabled environments; the
framework itself does not require them (the renderer has 12 built-in font
styles + procedural textures, and the `game` position source replaces PGN
replay with self-play).

NOTE: this development environment has zero egress, so these downloads are
untested here; they are straightforward HTTP fetches kept dependency-free.

Usage:
    python -m chess_vision_tpu.datagen.download_assets pieces --out assets/pieces
    python -m chess_vision_tpu.datagen.download_assets boards --out assets/boards
    python -m chess_vision_tpu.datagen.download_assets pgn --month 2024-01 --out games.pgn.zst
"""

from __future__ import annotations

import argparse
import os
import sys
import urllib.request

LICHESS_PIECE_SETS = [
    "cburnett", "merida", "alpha", "pirouetti", "chessnut", "chess7",
    "reillycraig", "companion", "riohacha", "kosal", "leipzig", "fantasy",
    "spatial", "celtic",
]
PIECE_CODES = ["wK", "wQ", "wR", "wB", "wN", "wP", "bK", "bQ", "bR", "bB",
               "bN", "bP"]
PIECE_URL = "https://raw.githubusercontent.com/lichess-org/lila/master/public/piece/{set}/{code}.svg"
PGN_URL = "https://database.lichess.org/standard/lichess_db_standard_rated_{month}.pgn.zst"
BOARD_URL = "https://raw.githubusercontent.com/lichess-org/lila/master/public/images/board/{name}"
# The reference downloads 24 textures (download_boards.js:20-45); we skip its
# one SVG entry (newspaper.svg) since the PIL renderer consumes raster files.
LICHESS_BOARDS = [
    "wood.jpg", "wood2.jpg", "wood3.jpg", "wood4.jpg",
    "blue-marble.jpg", "blue2.jpg", "blue3.jpg", "blue.png", "brown.png",
    "canvas2.jpg", "green-plastic.png", "green.png", "grey.jpg",
    "leather.jpg", "maple.jpg", "maple2.jpg", "marble.jpg", "metal.jpg",
    "ncf-board.png", "olive.jpg", "pink-pyramid.png", "purple-diag.png",
    "purple.png",
]
PIECE_PNG_SIZE = 80  # match the reference's rasterized piece size


def _fetch(url: str, dest: str) -> None:
    print(f"  {url} -> {dest}")
    urllib.request.urlretrieve(url, dest)


def _rasterize_svgs(set_dir: str) -> bool:
    """SVG -> PNG at PIECE_PNG_SIZE if a rasterizer is importable (the
    renderer consumes PNGs; the reference rasterizes via node-canvas)."""
    try:
        import cairosvg
    except ImportError:
        return False
    for f in os.listdir(set_dir):
        if f.endswith(".svg"):
            svg = os.path.join(set_dir, f)
            cairosvg.svg2png(
                url=svg, write_to=svg[:-4] + ".png",
                output_width=PIECE_PNG_SIZE, output_height=PIECE_PNG_SIZE,
            )
    return True


def download_pieces(out_dir: str) -> None:
    rasterized = True
    for set_name in LICHESS_PIECE_SETS:
        d = os.path.join(out_dir, set_name)
        os.makedirs(d, exist_ok=True)
        for code in PIECE_CODES:
            _fetch(PIECE_URL.format(set=set_name, code=code),
                   os.path.join(d, f"{code}.svg"))
        rasterized = _rasterize_svgs(d) and rasterized
    if not rasterized:
        print("NOTE: no SVG rasterizer available (pip install cairosvg) — "
              "convert the SVGs to PNGs before rendering; the renderer "
              "auto-discovers any directory with 12 piece PNGs.")


def download_boards(out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for name in LICHESS_BOARDS:
        _fetch(BOARD_URL.format(name=name), os.path.join(out_dir, name))


def download_pgn(month: str, out: str) -> None:
    _fetch(PGN_URL.format(month=month), out)
    print("decompress with: zstd -d", out)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="what", required=True)
    p = sub.add_parser("pieces")
    p.add_argument("--out", default="assets/pieces")
    p = sub.add_parser("boards")
    p.add_argument("--out", default="assets/boards")
    p = sub.add_parser("pgn")
    p.add_argument("--month", required=True, help="e.g. 2024-01")
    p.add_argument("--out", default=None)
    args = parser.parse_args()

    try:
        if args.what == "pieces":
            download_pieces(args.out)
        elif args.what == "boards":
            download_boards(args.out)
        elif args.what == "pgn":
            download_pgn(args.month, args.out or f"lichess_{args.month}.pgn.zst")
    except OSError as e:
        sys.exit(f"download failed (no network?): {e}")


if __name__ == "__main__":
    main()
