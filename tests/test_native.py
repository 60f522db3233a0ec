"""Tests for the native (C++/libjpeg) decode+resize fast path."""

import io

import numpy as np
import pytest
from PIL import Image

from chess_vision_tpu import native


def _jpeg_bytes(arr: np.ndarray, quality: int = 90) -> bytes:
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "JPEG", quality=quality)
    return buf.getvalue()


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native decoder unavailable (no g++/libjpeg)")
    return True


def test_same_size_decode_is_bit_exact_vs_pil(lib_ok, rng):
    arr = rng.integers(0, 256, (256, 256, 3)).astype(np.uint8)
    data = _jpeg_bytes(arr)
    ours = native.decode_resize_jpeg(data, 256)
    ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("src,dst", [(256, 128), (400, 256), (256, 200)])
def test_resize_matches_pil_bilinear(lib_ok, rng, src, dst):
    arr = rng.integers(0, 256, (src, src, 3)).astype(np.uint8)
    data = _jpeg_bytes(arr)
    ours = native.decode_resize_jpeg(data, dst).astype(int)
    ref = np.asarray(
        Image.open(io.BytesIO(data)).convert("RGB").resize((dst, dst),
                                                           Image.BILINEAR)
    ).astype(int)
    # triangle filter matches PIL up to rounding (PIL uses 8-bit fixed point)
    assert np.abs(ours - ref).max() <= 2


def test_grayscale_jpeg(lib_ok, rng):
    arr = rng.integers(0, 256, (128, 128)).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr, "L").save(buf, "JPEG", quality=95)
    out = native.decode_resize_jpeg(buf.getvalue(), 64)
    assert out.shape == (64, 64, 3)
    # channels identical
    np.testing.assert_array_equal(out[..., 0], out[..., 1])


def test_corrupt_data_returns_none(lib_ok):
    assert native.decode_resize_jpeg(b"not a jpeg", 64) is None


def test_decode_file_non_jpeg_returns_none(tmp_path, lib_ok, rng):
    path = tmp_path / "x.png"
    Image.fromarray(
        rng.integers(0, 256, (32, 32, 3)).astype(np.uint8)
    ).save(path)
    assert native.decode_file(str(path), 32) is None  # PNG -> PIL fallback
