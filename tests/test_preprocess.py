"""Tests for the fused preprocessing op (Pallas kernel logic via interpret
mode on CPU + the XLA fallback)."""

import jax
import jax.numpy as jnp
import numpy as np

from chess_vision_tpu.ops import preprocess as pp


def _interp_pallas(images_u8, mean, std, out_dtype):
    """Run the kernel in interpreter mode (CPU-safe) with the same wiring."""
    from jax.experimental import pallas as pl

    B, H, W, C = images_u8.shape
    rows, cols = B * H, W * C
    x = images_u8.reshape(rows, cols)
    scale, bias = pp._norm_vectors(mean, std, W, C)
    block_rows = 64
    out = pl.pallas_call(
        pp._kernel,
        grid=(rows // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, cols), lambda i: (i, 0)),
            pl.BlockSpec((1, cols), lambda i: (0, 0)),
            pl.BlockSpec((1, cols), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_rows, cols), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, cols), out_dtype),
        interpret=True,
    )(x, jnp.asarray(scale), jnp.asarray(bias))
    return out.reshape(B, H, W, C)


def test_kernel_matches_xla(rng):
    x = jnp.asarray(rng.integers(0, 256, (2, 64, 64, 3)).astype(np.uint8))
    mean, std = (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)
    a = np.asarray(_interp_pallas(x, mean, std, jnp.float32))
    b = np.asarray(pp._preprocess_xla(x, mean, std, jnp.float32))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_matches_totensor_normalize_semantics(rng):
    """The whole op == ToTensor (u8/255) + Normalize ((x-mean)/std), the
    reference's eval transform tail (dataset.py:173-174)."""
    img = rng.integers(0, 256, (32, 32, 3)).astype(np.uint8)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    ref = (img.astype(np.float32) / 255.0 - mean) / std
    ours = np.asarray(
        pp.preprocess_u8(
            jnp.asarray(img)[None], tuple(mean), tuple(std), jnp.float32
        )
    )[0]
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_cpu_dispatch_uses_fallback(rng):
    x = jnp.asarray(rng.integers(0, 256, (1, 32, 32, 3)).astype(np.uint8))
    out = pp.preprocess_u8(x, (0.5,) * 3, (0.5,) * 3)  # auto: CPU -> XLA
    assert out.dtype == jnp.bfloat16
    assert out.shape == x.shape
