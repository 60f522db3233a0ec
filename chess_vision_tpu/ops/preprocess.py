"""Fused device-side preprocessing: uint8 NHWC -> normalized model dtype.

The serving/eval input path (dequantize + mean/std normalize) is pure
HBM-bandwidth: read 1 byte/element, write 2 (bf16). The Pallas kernel fuses
both into one pass laid out for the VPU:

  - the (B, H, W, C) image is viewed as a (B*H, W*C) matrix (last dim W*C is
    a multiple of 128 lanes for the standard 256px/3ch inputs),
  - per-column scale/bias vectors (1/(255*std_c), -mean_c/std_c, tiled per
    channel) turn the normalize into one fused multiply-add,
  - uint8 loads per (block_rows, W*C) tile -> f32 compute -> model-dtype
    store.

`preprocess_u8` dispatches to the kernel when shapes are TPU-tileable and
falls back to the identical XLA expression otherwise (CPU tests, odd sizes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _norm_vectors(mean, std, width: int, channels: int):
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)
    scale = np.tile(1.0 / (255.0 * std), width)   # (W*C,)
    bias = np.tile(-mean / std, width)            # (W*C,)
    return scale[None, :], bias[None, :]


def _kernel(x_ref, scale_ref, bias_ref, o_ref):
    # Mosaic has no direct uint8->f32 cast; hop through int32.
    x = x_ref[:].astype(jnp.int32).astype(jnp.float32)
    o_ref[:] = (x * scale_ref[:] + bias_ref[:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("mean", "std", "out_dtype"))
def _preprocess_pallas(images_u8, mean, std, out_dtype):
    B, H, W, C = images_u8.shape
    rows, cols = B * H, W * C
    x = images_u8.reshape(rows, cols)
    scale, bias = _norm_vectors(mean, std, W, C)

    block_rows = 256
    while rows % block_rows:
        block_rows //= 2

    out = pl.pallas_call(
        _kernel,
        grid=(rows // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, cols), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cols), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cols), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, cols), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, cols), out_dtype),
    )(x, jnp.asarray(scale), jnp.asarray(bias))
    return out.reshape(B, H, W, C)


def _preprocess_xla(images_u8, mean, std, out_dtype):
    mean = jnp.asarray(mean, jnp.float32) * 255.0
    std = jnp.asarray(std, jnp.float32) * 255.0
    x = (images_u8.astype(jnp.float32) - mean) / std
    return x.astype(out_dtype)


def ycbcr420_to_rgb(
    y: jnp.ndarray, cb: jnp.ndarray, cr: jnp.ndarray
) -> jnp.ndarray:
    """Subsampled JPEG planes -> RGB float in [0, 255], entirely on device.

    Inputs: Y (B, S, S) uint8, Cb/Cr (B, S/2, S/2) uint8 as produced by
    native.decode_ycbcr420. Chroma is bilinearly upsampled (half-pixel
    centers, the same triangle filter libjpeg's fancy upsampler uses) and
    converted with the JFIF full-range BT.601 matrix. Shipping planes
    instead of RGB halves host->device bytes — the transfer bottleneck for
    both serving and training input.
    """
    r, g, b = _ycbcr420_rgb_planes(y, cb, cr)
    return jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 255.0)


def _ycbcr420_rgb_planes(y, cb, cr):
    B, S, _ = y.shape
    yf = y.astype(jnp.float32)
    up = lambda c: jax.image.resize(  # noqa: E731
        c.astype(jnp.float32), (B, S, S), method="linear"
    )
    cbf = up(cb) - 128.0
    crf = up(cr) - 128.0
    r = yf + 1.402 * crf
    g = yf - 0.344136 * cbf - 0.714136 * crf
    b = yf + 1.772 * cbf
    return r, g, b


def ycbcr420_to_rgb_planar(
    y: jnp.ndarray, cb: jnp.ndarray, cr: jnp.ndarray
) -> jnp.ndarray:
    """Same as ycbcr420_to_rgb but channel-planar (B, 3, S, S) output.

    The training augmentations run channel-planar so their elementwise math
    fills the TPU's 128 vector lanes (minor dim = width, not C=3); producing
    planes directly avoids an NHWC round-trip. Values are bitwise identical
    to ycbcr420_to_rgb up to the stack axis."""
    r, g, b = _ycbcr420_rgb_planes(y, cb, cr)
    return jnp.clip(jnp.stack([r, g, b], axis=1), 0.0, 255.0)


def ycbcr420_to_normalized(
    y: jnp.ndarray,
    cb: jnp.ndarray,
    cr: jnp.ndarray,
    mean,
    std,
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Planes -> mean/std-normalized RGB in one device program (serving)."""
    rgb = ycbcr420_to_rgb(y, cb, cr)
    mean = jnp.asarray(mean, jnp.float32) * 255.0
    std = jnp.asarray(std, jnp.float32) * 255.0
    return ((rgb - mean) / std).astype(out_dtype)


def preprocess_u8(
    images_u8: jnp.ndarray,
    mean,
    std,
    out_dtype=jnp.bfloat16,
    use_pallas: bool | None = None,
) -> jnp.ndarray:
    """uint8 (B,H,W,C) -> normalized (B,H,W,C) in out_dtype."""
    B, H, W, C = images_u8.shape
    if use_pallas is None:
        use_pallas = (
            jax.default_backend() not in ("cpu",) and (W * C) % 128 == 0
        )
    if use_pallas:
        return _preprocess_pallas(images_u8, tuple(mean), tuple(std), out_dtype)
    return _preprocess_xla(images_u8, mean, std, out_dtype)
