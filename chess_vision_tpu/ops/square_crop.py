"""Overlapping per-square crop + resize as batched matmuls (MXU-native).

The reference's ChessSquareCNN crops 64 overlapping windows per board with a
Python loop of slices and then bilinearly resizes them
(reference models/square.py:43-74: crop = int(sq*overlap) window, replicate
pad (crop-sq)//2, F.interpolate bilinear align_corners=False). A literal port
would be 64 gathers; on TPU the whole crop+resize is one *fixed linear map*
per output pixel, so we precompute two small selection-times-interpolation
matrices and apply them as einsums:

    out[b, sr, sc, i, j, c] = sum_{h,w} R[sr, i, h] * padded[b, h, w, c] * C[sc, j, w]

where R[sr] = (bilinear 64<-crop resize matrix) @ (row-window selector for
square-row sr), and likewise C for columns. XLA maps both contractions onto
the MXU; there are no gathers and no dynamic shapes.

Index math matches the reference exactly: integer crop size, integer pad,
half-pixel-centers bilinear (align_corners=False), replicate padding.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def _resize_matrix(out_size: int, in_size: int) -> np.ndarray:
    """(out_size, in_size) bilinear interpolation matrix, half-pixel centers.

    Matches torch F.interpolate(mode="bilinear", align_corners=False) and
    jax.image.resize(method="linear") for upsampling.
    """
    mat = np.zeros((out_size, in_size), dtype=np.float32)
    if out_size == in_size:
        np.fill_diagonal(mat, 1.0)
        return mat
    scale = in_size / out_size
    for i in range(out_size):
        src = (i + 0.5) * scale - 0.5
        src = min(max(src, 0.0), in_size - 1)
        lo = int(np.floor(src))
        hi = min(lo + 1, in_size - 1)
        frac = src - lo
        mat[i, lo] += 1.0 - frac
        mat[i, hi] += frac
    return mat


@functools.lru_cache(maxsize=8)
def _crop_matrices(
    img_size: int, overlap: float, out_size: int
) -> tuple[np.ndarray, int]:
    """Per-square-row combined (8, out_size, padded_size) crop+resize matrix.

    Rows and columns use the same matrix (square geometry). Returns the matrix
    and the pad amount.
    """
    sq = img_size // 8
    crop = int(sq * overlap)
    pad = (crop - sq) // 2
    padded = img_size + 2 * pad
    resize = _resize_matrix(out_size, crop)  # (out, crop)
    combined = np.zeros((8, out_size, padded), dtype=np.float32)
    for r in range(8):
        start = r * sq  # window [start, start+crop) in padded coords
        combined[r, :, start : start + crop] = resize
    return combined, pad


def crop_squares(
    images: jnp.ndarray,
    overlap: float = 1.5,
    out_size: int = 64,
) -> jnp.ndarray:
    """Crop 64 overlapping squares per board and resize each.

    Args:
        images: (B, H, H, C) NHWC board images.
        overlap: crop window = overlap * square size (1.5 = half-square
            neighbor context on each side).
        out_size: output crop resolution.

    Returns:
        (B, 64, out_size, out_size, C) crops in square order
        (index 0 = a8-region top-left ... 63 = h1-region bottom-right),
        matching the reference's row-major crop order.
    """
    B, H, W, C = images.shape
    if H != W:
        raise ValueError(f"Expected square images, got {H}x{W}")
    mat_np, pad = _crop_matrices(H, overlap, out_size)
    mat = jnp.asarray(mat_np, dtype=images.dtype)

    padded = jnp.pad(
        images, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge"
    )
    # Full matmul precision when fed float32: interpolation must not be
    # degraded to bf16 passes on TPU (parity-sensitive path).
    prec = "highest" if images.dtype == jnp.float32 else "default"
    # rows: (8r, out_size i, padded h) x (b, h, w, c) -> (b, r, i, w, c)
    t = jnp.einsum("rih,bhwc->briwc", mat, padded, precision=prec)
    # cols: (b, r, i, w, c) x (8s, out_size j, padded w) -> (b, r, s, i, j, c)
    out = jnp.einsum("briwc,sjw->brsijc", t, mat, precision=prec)
    return out.reshape(B, 64, out_size, out_size, C)
