"""Parity tests for the matmul-based square-crop op against a direct torch
implementation of the reference semantics (models/square.py:43-74):
replicate pad, 64 overlapping slices, bilinear resize align_corners=False.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from chess_vision_tpu.ops.square_crop import crop_squares


def torch_reference_crops(images_nchw, overlap, out_size):
    """Direct torch implementation of the reference crop semantics (oracle)."""
    B, C, H, W = images_nchw.shape
    sq = H // 8
    crop = int(sq * overlap)
    pad = (crop - sq) // 2
    padded = F.pad(images_nchw, [pad, pad, pad, pad], mode="replicate")
    crops = []
    for row in range(8):
        for col in range(8):
            y, x = row * sq, col * sq
            crops.append(padded[:, :, y : y + crop, x : x + crop])
    crops = torch.stack(crops, dim=1).reshape(B * 64, C, crop, crop)
    if crop != out_size:
        crops = F.interpolate(
            crops, size=out_size, mode="bilinear", align_corners=False
        )
    return crops


@pytest.mark.parametrize(
    "size,overlap,out_size",
    [(256, 1.5, 64), (256, 1.0, 32), (128, 1.5, 64), (256, 2.0, 48)],
)
def test_crop_parity_vs_torch(size, overlap, out_size):
    rng = np.random.default_rng(7)
    imgs = rng.normal(size=(2, size, size, 3)).astype(np.float32)

    ours = np.asarray(crop_squares(jnp.asarray(imgs), overlap, out_size))
    ours = ours.reshape(2 * 64, out_size, out_size, 3)

    ref = torch_reference_crops(
        torch.from_numpy(imgs).permute(0, 3, 1, 2), overlap, out_size
    )
    ref = ref.permute(0, 2, 3, 1).numpy()

    # fp32 accumulation-order noise between one fused contraction and torch's
    # two-tap separable evaluation; on unit-scale image data 1e-4 abs is far
    # below any meaningful signal.
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_crop_order_is_row_major():
    """Square 0 must cover the top-left (a8) region, square 63 bottom-right."""
    img = np.zeros((1, 256, 256, 3), np.float32)
    img[0, :32, :32] = 1.0  # a8 square painted white
    crops = np.asarray(crop_squares(jnp.asarray(img), 1.5, 64))
    assert crops[0, 0].mean() > 0.3       # a8 crop sees the paint
    assert crops[0, 63].mean() == 0.0     # h1 crop does not
    # immediate right neighbor (b8) sees a little through the overlap
    assert 0.0 < crops[0, 1].mean() < crops[0, 0].mean()


def test_crop_rejects_non_square():
    with pytest.raises(ValueError):
        crop_squares(jnp.zeros((1, 128, 256, 3)))
