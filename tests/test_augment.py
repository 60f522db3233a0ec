"""Device-side augmentation pipeline tests."""

import jax
import jax.numpy as jnp
import numpy as np

from chess_vision_tpu.augment import (
    _adjust_brightness,
    _adjust_contrast,
    _adjust_hue,
    _adjust_saturation,
    _gaussian_blur,
    _grayscale,
    _hsv_to_rgb,
    _rgb_to_hsv,
    augment_batch,
    normalize,
)


def test_augment_batch_deterministic_and_bounded(rng):
    imgs = rng.integers(0, 256, (4, 32, 32, 3)).astype(np.uint8)
    a = np.asarray(augment_batch(jnp.asarray(imgs), jax.random.key(3)))
    b = np.asarray(augment_batch(jnp.asarray(imgs), jax.random.key(3)))
    c = np.asarray(augment_batch(jnp.asarray(imgs), jax.random.key(4)))
    np.testing.assert_array_equal(a, b)      # same key -> same output
    assert not np.array_equal(a, c)          # different key -> different
    assert a.min() >= 0.0 and a.max() <= 1.0
    # per-image independence: different images get different jitter
    assert not np.allclose(a[0] - imgs[0] / 255.0, a[1] - imgs[1] / 255.0)


def test_hsv_roundtrip(rng):
    img = jnp.asarray(rng.random((16, 16, 3)).astype(np.float32))
    h, s, v = _rgb_to_hsv(img)
    back = _hsv_to_rgb(h, s, v)
    np.testing.assert_allclose(np.asarray(back), np.asarray(img), atol=1e-5)


def test_hue_shift_zero_is_identity(rng):
    img = jnp.asarray(rng.random((8, 8, 3)).astype(np.float32))
    out = _adjust_hue(img, 0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_brightness_contrast_saturation_factors():
    img = jnp.full((4, 4, 3), 0.5)
    np.testing.assert_allclose(np.asarray(_adjust_brightness(img, 1.0)), 0.5)
    np.testing.assert_allclose(
        np.asarray(_adjust_brightness(img, 0.5)), 0.25
    )
    # contrast/saturation with factor 1 are identity
    np.testing.assert_allclose(np.asarray(_adjust_contrast(img, 1.0)), 0.5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(_adjust_saturation(img, 1.0)), 0.5,
                               atol=1e-6)


def test_grayscale_weights_and_blur_preserves_mean():
    # own seeded rng (order-independent); mean preservation under reflect
    # padding is approximate — the boundary reweighting shifts a random
    # 16x16 image's mean by O(1e-3), so the bound is 5e-3, and the real
    # oracle check is test_blur_matches_torch_conv below
    rng = np.random.default_rng(7)
    img = jnp.asarray(rng.random((16, 16, 3)).astype(np.float32))
    g = np.asarray(_grayscale(img))
    expected = (
        0.2989 * np.asarray(img)[..., 0]
        + 0.587 * np.asarray(img)[..., 1]
        + 0.114 * np.asarray(img)[..., 2]
    )
    np.testing.assert_allclose(g[..., 0], expected, atol=1e-5)
    np.testing.assert_array_equal(g[..., 0], g[..., 1])

    blurred = np.asarray(_gaussian_blur(img, 1.0))
    assert blurred.shape == img.shape
    # blur reduces variance but (with reflect padding) preserves the mean
    np.testing.assert_allclose(blurred.mean(), np.asarray(img).mean(), atol=5e-3)
    assert blurred.std() < np.asarray(img).std()


def test_blur_matches_torch_conv(rng):
    import torch
    import torch.nn.functional as F

    from chess_vision_tpu.augment import _gaussian_kernel_1d

    img = rng.random((16, 16, 3)).astype(np.float32)
    sigma = 0.9
    ours = np.asarray(_gaussian_blur(jnp.asarray(img), sigma))

    k1 = np.asarray(_gaussian_kernel_1d(sigma))
    k2 = np.outer(k1, k1)
    t = torch.from_numpy(img).permute(2, 0, 1)[None]
    t = F.pad(t, (2, 2, 2, 2), mode="reflect")
    weight = torch.from_numpy(k2.astype(np.float32))[None, None].repeat(3, 1, 1, 1)
    ref = F.conv2d(t, weight, groups=3)[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_normalize():
    img = jnp.full((2, 4, 4, 3), 0.5)
    out = np.asarray(normalize(img, (0.5, 0.5, 0.5), (0.5, 0.5, 0.5)))
    np.testing.assert_allclose(out, 0.0)


def test_batched_jitter_matches_single_image_oracle(rng):
    """_augment_batch_impl (16 batched passes) must reproduce the vmapped
    single-image pipeline (_augment_one with the 24-branch switch) — same
    keys, same draws, same math."""
    from chess_vision_tpu.augment import _augment_batch_impl, _augment_one

    imgs = rng.integers(0, 256, (6, 32, 32, 3)).astype(np.uint8)
    imgs = jnp.asarray(imgs, jnp.float32) / 255.0
    keys = jax.random.split(jax.random.key(11), imgs.shape[0])
    fast = np.asarray(_augment_batch_impl(imgs, keys, 0.0, 0.0))
    oracle = np.asarray(
        jax.vmap(lambda im, k: _augment_one(im, k, 0.0, 0.0))(imgs, keys)
    )
    np.testing.assert_allclose(fast, oracle, atol=1e-6)


# --- torchvision-parity invariants (VERDICT r3 #8) --------------------------
# torchvision is absent offline, so these pin the *measurable invariants* of
# the reference recipe (reference dataset.py:165-175) against independent
# oracles (colorsys, scipy, analytic distributions). The exact
# torchvision-diff commands for when it appears are in PARITY.md §5.


def test_hue_shift_matches_colorsys_dense():
    """_adjust_hue == colorsys H-rotation on a dense RGB grid.

    torchvision's F.adjust_hue is defined as RGB->HSV, h += shift (mod 1),
    HSV->RGB — the same contract colorsys implements."""
    import colorsys
    import itertools

    vals = np.linspace(0.0, 1.0, 7)
    grid = np.array(list(itertools.product(vals, vals, vals)),
                    np.float32).reshape(-1, 1, 3)
    for shift in (-0.1, -0.037, 0.05, 0.1):
        ours = np.asarray(_adjust_hue(jnp.asarray(grid), shift))
        ref = np.array([
            colorsys.hsv_to_rgb((colorsys.rgb_to_hsv(*px)[0] + shift) % 1.0,
                                *colorsys.rgb_to_hsv(*px)[1:])
            for px in grid.reshape(-1, 3)
        ], np.float32).reshape(grid.shape)
        np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_blur_matches_scipy_reference(rng):
    """5-tap Gaussian blur == scipy correlate with the analytic kernel,
    reflect padding (torchvision GaussianBlur semantics: truncated,
    renormalized kernel; 'reflect' == scipy 'mirror')."""
    from scipy.ndimage import correlate

    img = rng.random((17, 23, 3)).astype(np.float32)
    for sigma in (0.1, 0.6, 1.5):
        x = np.arange(5, dtype=np.float64) - 2.0
        k1 = np.exp(-0.5 * (x / sigma) ** 2)
        k1 /= k1.sum()
        k2 = np.outer(k1, k1)
        ref = np.stack([
            correlate(img[..., c], k2, mode="mirror") for c in range(3)
        ], axis=-1)
        ours = np.asarray(_gaussian_blur(jnp.asarray(img), sigma))
        np.testing.assert_allclose(ours, ref, atol=3e-6)


def test_jitter_param_distributions():
    """ColorJitter(0.3, 0.3, 0.3, 0.1) parameter semantics: factors uniform
    on [0.7, 1.3] (brightness/contrast/saturation), hue on [-0.1, 0.1],
    op order uniform over all 4! permutations, every op applied exactly
    once per image (torchvision ColorJitter.get_params contract)."""
    from chess_vision_tpu.augment import _PERMS, _color_jitter_params

    assert len(_PERMS) == 24
    assert sorted(map(tuple, {tuple(sorted(p)) for p in _PERMS})) == [
        (0, 1, 2, 3)]
    keys = jax.random.split(jax.random.PRNGKey(7), 4000)
    fb, fc, fs, fh, which = jax.vmap(_color_jitter_params)(keys)
    for f, lo, hi in ((fb, 0.7, 1.3), (fc, 0.7, 1.3), (fs, 0.7, 1.3),
                      (fh, -0.1, 0.1)):
        f = np.asarray(f)
        assert f.min() >= lo and f.max() <= hi
        np.testing.assert_allclose(f.mean(), (lo + hi) / 2, atol=0.01)
        # uniformity: quartile occupancy within 3 sigma of n/4
        qs = np.histogram(f, bins=4, range=(lo, hi))[0]
        assert (np.abs(qs - 1000) < 3 * np.sqrt(1000 * 0.75)).all(), qs
    counts = np.bincount(np.asarray(which), minlength=24)
    assert counts.min() > 0
    assert (np.abs(counts - len(keys) / 24)
            < 5 * np.sqrt(len(keys) / 24)).all(), counts
