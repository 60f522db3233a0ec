"""Device-side training augmentations (the TPU-native input path).

The reference augments on CPU dataloader workers with torchvision
(reference dataset.py:165-175): ColorJitter(brightness=contrast=saturation=0.3,
hue=0.1) -> RandomGrayscale(p=0.1) -> GaussianBlur(k=5, sigma 0.1-1.5, p=0.2)
-> Normalize. Here the same statistical recipe runs *on device*, jitted and
fused into the train step: uint8 batches stream to HBM and a single compiled
program does jitter/grayscale/blur/normalize — no CPU worker fleet, and
augmentation randomness is jax.random key-threaded (reproducible, unlike the
reference's unseeded torch transforms).

Deliberately NO horizontal flip / random crop: both are label-destroying for
chess boards (reference dataset.py:149-155).

torchvision parity notes:
  - ColorJitter applies all four adjustments in a random order; factors are
    U[0.7,1.3] (brightness/contrast/saturation) and U[-0.1,0.1] (hue).
  - adjust_contrast blends with the mean of the grayscale image;
    adjust_saturation blends with the grayscale image; both clamp to [0,1].
  - Grayscale uses ITU-R 601 weights (0.2989, 0.587, 0.114).
  - GaussianBlur uses a 5x5 separable kernel with reflect padding.
"""

from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp
import numpy as np

# numpy (not jnp) on purpose: a module-level jnp constant would initialize
# the default jax backend at import time, before CLIs can force a platform
# via utils.platform.apply_platform_env().
_GRAY = np.asarray([0.2989, 0.587, 0.114], np.float32)

# torchvision ColorJitter ranges for the reference's (0.3, 0.3, 0.3, 0.1).
_BRIGHTNESS = (0.7, 1.3)
_CONTRAST = (0.7, 1.3)
_SATURATION = (0.7, 1.3)
_HUE = (-0.1, 0.1)

_PERMS = list(itertools.permutations(range(4)))  # 24 orderings of the 4 ops


def _grayscale(img):
    g = jnp.tensordot(img, _GRAY, axes=[[-1], [0]])
    return g[..., None] * jnp.ones((3,), img.dtype)


def _adjust_brightness(img, f):
    return jnp.clip(img * f, 0.0, 1.0)


def _adjust_contrast(img, f):
    mean = jnp.mean(jnp.tensordot(img, _GRAY, axes=[[-1], [0]]))
    return jnp.clip(f * img + (1.0 - f) * mean, 0.0, 1.0)


def _adjust_saturation(img, f):
    g = _grayscale(img)
    return jnp.clip(f * img + (1.0 - f) * g, 0.0, 1.0)


def _rgb_to_hsv(img):
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    deltac = maxc - minc
    s = jnp.where(maxc > 0, deltac / jnp.maximum(maxc, 1e-12), 0.0)
    dsafe = jnp.maximum(deltac, 1e-12)
    rc = (maxc - r) / dsafe
    gc = (maxc - g) / dsafe
    bc = (maxc - b) / dsafe
    h = jnp.where(
        maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = jnp.where(deltac > 0, h, 0.0)
    h = (h / 6.0) % 1.0
    return h, s, v


def _hsv_to_rgb(h, s, v):
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - f * s)
    t = v * (1.0 - (1.0 - f) * s)
    i = i.astype(jnp.int32) % 6
    r = jnp.choose(i, [v, q, p, p, t, v], mode="clip")
    g = jnp.choose(i, [t, v, v, q, p, p], mode="clip")
    b = jnp.choose(i, [p, p, t, v, v, q], mode="clip")
    return jnp.stack([r, g, b], axis=-1)


def _adjust_hue(img, shift):
    h, s, v = _rgb_to_hsv(img)
    return jnp.clip(_hsv_to_rgb((h + shift) % 1.0, s, v), 0.0, 1.0)


def _gaussian_kernel_1d(sigma, size: int = 5):
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def _gaussian_blur(img, sigma, size: int = 5):
    """5x5 Gaussian blur with reflect padding (torchvision parity), HWC input.

    Implemented as one depthwise conv (kernel is the separable outer product);
    the Gaussian is symmetric so correlation == convolution.
    """
    k1 = _gaussian_kernel_1d(sigma, size)
    k2 = jnp.outer(k1, k1)
    pad = size // 2
    x = jnp.pad(img, ((pad, pad), (pad, pad), (0, 0)), mode="reflect")[None]
    kernel = jnp.tile(k2[:, :, None, None], (1, 1, 1, 3))  # HWIO depthwise
    out = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=3,
    )
    return out[0]


def _color_jitter_params(key):
    """Per-image factor/order draws — EXACTLY the splits and distributions
    of the original per-image implementation (key-compatible)."""
    kb, kc, ks, kh, kperm = jax.random.split(key, 5)
    fb = jax.random.uniform(kb, (), minval=_BRIGHTNESS[0], maxval=_BRIGHTNESS[1])
    fc = jax.random.uniform(kc, (), minval=_CONTRAST[0], maxval=_CONTRAST[1])
    fs = jax.random.uniform(ks, (), minval=_SATURATION[0], maxval=_SATURATION[1])
    fh = jax.random.uniform(kh, (), minval=_HUE[0], maxval=_HUE[1])
    which = jax.random.randint(kperm, (), 0, len(_PERMS))
    return fb, fc, fs, fh, which


def _color_jitter(img, key):
    """Single-image color jitter (random op order) — reference semantics.

    NOTE: do not vmap this directly in hot paths — a vmapped lax.switch
    executes ALL 24 order-branches per image (measured as the dominant cost
    of the train step and the largest HLO temps). augment_batch uses the
    position-wise batched formulation below; this stays as the readable
    single-image oracle that tests compare against.
    """
    fb, fc, fs, fh, which = _color_jitter_params(key)
    ops = (
        lambda im: _adjust_brightness(im, fb),
        lambda im: _adjust_contrast(im, fc),
        lambda im: _adjust_saturation(im, fs),
        lambda im: _adjust_hue(im, fh),
    )

    def make_branch(perm):
        def branch(im):
            for idx in perm:
                im = ops[idx](im)
            return im
        return branch

    branches = [make_branch(p) for p in _PERMS]
    return jax.lax.switch(which, branches, img)


def _channel_permutation(img, key):
    """Random RGB channel permutation (reference dataset.py:123-132 —
    defined there but unused in the final recipe; available via config)."""
    perm = jax.random.permutation(key, 3)
    return img[..., perm]


def _invert(img):
    """Pixel inversion 1-x (reference dataset.py:135-143 — defined but unused
    in the final recipe; available via config)."""
    return 1.0 - img


def _augment_rest_one(img, key, channel_perm_p: float = 0.0,
                      invert_p: float = 0.0):
    """Everything after color jitter, single image; `key` is the full
    per-image key (the jitter sub-key is consumed by _color_jitter_batch_p
    with identical splitting)."""
    kj, kg_p, kb_p, kb_s, kc_p, kc, ki_p = jax.random.split(key, 7)
    del kj  # consumed by the batched jitter stage
    img = jnp.where(
        jax.random.uniform(kg_p) < 0.1, _grayscale(img), img
    )
    sigma = jax.random.uniform(kb_s, (), minval=0.1, maxval=1.5)
    img = jnp.where(
        jax.random.uniform(kb_p) < 0.2, _gaussian_blur(img, sigma), img
    )
    if channel_perm_p > 0.0:
        img = jnp.where(
            jax.random.uniform(kc_p) < channel_perm_p,
            _channel_permutation(img, kc), img,
        )
    if invert_p > 0.0:
        img = jnp.where(jax.random.uniform(ki_p) < invert_p, _invert(img), img)
    return img


def _augment_one(img, key, channel_perm_p: float = 0.0, invert_p: float = 0.0):
    """img: (H, W, 3) float32 in [0,1]. Single-image oracle (tests); hot
    paths use the batched pipeline in _augment_batch_impl."""
    kj = jax.random.split(key, 7)[0]
    img = _color_jitter(img, kj)
    return _augment_rest_one(img, key, channel_perm_p, invert_p)


# ---------------------------------------------------------------------------
# Planar (channel-major) batched pipeline — the hot path.
#
# Augmentation is elementwise math, and on TPU the minor-most axis maps onto
# the VPU's 128 vector lanes: NHWC tensors (minor dim C=3) run every
# jitter/HSV/blur op at 3/128 lane utilization. Measured on the v5e, that
# made augmentation 84% of the whole ViT-B train step
# (experiments/microbench.py train_bisect: 67 -> 408 img/s without aug).
# The batched pipeline therefore runs channel-planar (B, 3, H, W) — minor
# dim W fills the lanes — with the SAME per-pixel formulas and the SAME
# per-image RNG draws as the single-image oracle above; equivalence is
# asserted in tests/test_augment.py. The oracles stay NHWC for readability.
# ---------------------------------------------------------------------------


def _gray_p(x):
    """(B, 3, H, W) -> (B, 1, H, W) ITU-R 601 luma."""
    return (
        _GRAY[0] * x[:, 0] + _GRAY[1] * x[:, 1] + _GRAY[2] * x[:, 2]
    )[:, None]


def _rgb_to_hsv_p(x):
    """(B, 3, H, W) -> h, s, v each (B, H, W); same math as _rgb_to_hsv."""
    r, g, b = x[:, 0], x[:, 1], x[:, 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    deltac = maxc - minc
    s = jnp.where(maxc > 0, deltac / jnp.maximum(maxc, 1e-12), 0.0)
    dsafe = jnp.maximum(deltac, 1e-12)
    rc = (maxc - r) / dsafe
    gc = (maxc - g) / dsafe
    bc = (maxc - b) / dsafe
    h = jnp.where(
        maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = jnp.where(deltac > 0, h, 0.0)
    h = (h / 6.0) % 1.0
    return h, s, v


def _select6(i, opts):
    """Elementwise 6-way select (jnp.choose semantics for i in [0, 5])."""
    out = opts[5]
    for k in range(4, -1, -1):
        out = jnp.where(i == k, opts[k], out)
    return out


def _hsv_to_rgb_p(h, s, v):
    """h, s, v (B, H, W) -> (B, 3, H, W); same math as _hsv_to_rgb."""
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - f * s)
    t = v * (1.0 - (1.0 - f) * s)
    i = i.astype(jnp.int32) % 6
    r = _select6(i, (v, q, p, p, t, v))
    g = _select6(i, (t, v, v, q, p, p))
    b = _select6(i, (p, p, t, v, v, q))
    return jnp.stack([r, g, b], axis=1)


def _color_jitter_batch_p(x, keys):
    """Planar batched random-order color jitter: for each of the 4 order
    positions, apply all 4 adjustments to the whole batch and per-image
    select the one this image's permutation puts there (16 batched passes,
    identical draws to the _color_jitter oracle)."""
    fb, fc, fs, fh, which = jax.vmap(_color_jitter_params)(keys)
    order = jnp.take(
        jnp.asarray(np.asarray(_PERMS, np.int32)), which, axis=0
    )  # (B, 4)
    c1 = lambda f: f[:, None, None, None]  # noqa: E731  (B,)->(B,1,1,1)

    def bright(im):
        return jnp.clip(im * c1(fb), 0.0, 1.0)

    def contrast(im):
        mean = jnp.mean(_gray_p(im), axis=(1, 2, 3))[:, None, None, None]
        return jnp.clip(c1(fc) * im + (1.0 - c1(fc)) * mean, 0.0, 1.0)

    def saturation(im):
        g = _gray_p(im)
        return jnp.clip(c1(fs) * im + (1.0 - c1(fs)) * g, 0.0, 1.0)

    def hue(im):
        h, s, v = _rgb_to_hsv_p(im)
        return jnp.clip(
            _hsv_to_rgb_p((h + fh[:, None, None]) % 1.0, s, v), 0.0, 1.0
        )

    for j in range(4):
        opid = order[:, j][:, None, None, None]
        b_, c_, s_, h_ = bright(x), contrast(x), saturation(x), hue(x)
        x = jnp.where(
            opid == 0, b_,
            jnp.where(opid == 1, c_, jnp.where(opid == 2, s_, h_)),
        )
    return x


def _gaussian_blur_batch_p(x, sigmas, size: int = 5):
    """Per-image-sigma separable 5-tap blur, planar: each pass is `size`
    slice-scale-adds over (B, 3, H, W) — full-lane elementwise work, no conv.
    Reflect padding; the Gaussian outer-product kernel is separable, so two
    1D passes equal the oracle's 5x5 conv up to f32 reassociation."""
    pad = size // 2
    B, C, H, W = x.shape
    k1 = jax.vmap(lambda s: _gaussian_kernel_1d(s, size))(sigmas)  # (B, k)
    c1 = lambda v: v[:, None, None, None]  # noqa: E731

    xp = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (0, 0)), mode="reflect")
    y = sum(
        c1(k1[:, i]) * jax.lax.slice_in_dim(xp, i, i + H, axis=2)
        for i in range(size)
    )
    yp = jnp.pad(y, ((0, 0), (0, 0), (0, 0), (pad, pad)), mode="reflect")
    return sum(
        c1(k1[:, i]) * jax.lax.slice_in_dim(yp, i, i + W, axis=3)
        for i in range(size)
    )


def _rest_params(key):
    """Per-image post-jitter draws — identical splits/orders to
    _augment_rest_one (key-compatible)."""
    kj, kg_p, kb_p, kb_s, kc_p, kc, ki_p = jax.random.split(key, 7)
    del kj
    return (
        jax.random.uniform(kg_p),
        jax.random.uniform(kb_p),
        jax.random.uniform(kb_s, (), minval=0.1, maxval=1.5),
        jax.random.uniform(kc_p),
        jax.random.permutation(kc, 3),
        jax.random.uniform(ki_p),
    )


def _augment_batch_impl_p(x, keys, channel_perm_p: float, invert_p: float):
    """Fully batched augmentation pipeline on planar (B, 3, H, W) input:
    batched color jitter, then batched grayscale/blur/extras with per-image
    selects. Same per-image draws and op order as vmap(_augment_one)."""
    kj = jax.vmap(lambda k: jax.random.split(k, 7)[0])(keys)
    x = _color_jitter_batch_p(x, kj)

    pg, pb, sigma, pc, cperm, pi = jax.vmap(_rest_params)(keys)
    c1 = lambda v: v[:, None, None, None]  # noqa: E731

    x = jnp.where(c1(pg) < 0.1, jnp.broadcast_to(_gray_p(x), x.shape), x)
    x = jnp.where(c1(pb) < 0.2, _gaussian_blur_batch_p(x, sigma), x)
    if channel_perm_p > 0.0:
        permuted = jnp.take_along_axis(x, cperm[:, :, None, None], axis=1)
        x = jnp.where(c1(pc) < channel_perm_p, permuted, x)
    if invert_p > 0.0:
        x = jnp.where(c1(pi) < invert_p, 1.0 - x, x)
    return x


def _augment_batch_impl(imgs, keys, channel_perm_p: float, invert_p: float):
    """NHWC wrapper over the planar pipeline (kept as the tested interface;
    hot callers build planar input directly and skip both transposes)."""
    x = imgs.transpose(0, 3, 1, 2)
    x = _augment_batch_impl_p(x, keys, channel_perm_p, invert_p)
    return x.transpose(0, 2, 3, 1)


def augment_batch(
    images_u8: jnp.ndarray, key,
    channel_perm_p: float = 0.0, invert_p: float = 0.0,
) -> jnp.ndarray:
    """(B, H, W, 3) uint8 -> augmented float32 in [0,1]."""
    imgs = images_u8.astype(jnp.float32) / 255.0
    keys = jax.random.split(key, imgs.shape[0])
    return _augment_batch_impl(imgs, keys, channel_perm_p, invert_p)


def normalize(images: jnp.ndarray, mean, std, dtype=jnp.float32) -> jnp.ndarray:
    """float [0,1] -> channel-normalized, in the model's compute layout."""
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return ((images - mean) / std).astype(dtype)


def preprocess_train(images_u8, key, mean, std, dtype=jnp.float32):
    return normalize(augment_batch(images_u8, key), mean, std, dtype)


def preprocess_eval(images_u8, mean, std, dtype=jnp.float32):
    return normalize(images_u8.astype(jnp.float32) / 255.0, mean, std, dtype)


def _batch_rgb01(batch: dict) -> jnp.ndarray:
    """Device-side reconstruction of [0,1] RGB from a loader batch that used
    either the RGB or the YCbCr-4:2:0 transport (data.BatchLoader)."""
    if "image" in batch:
        return batch["image"].astype(jnp.float32) / 255.0
    from chess_vision_tpu.ops.preprocess import ycbcr420_to_rgb

    return ycbcr420_to_rgb(batch["y"], batch["cb"], batch["cr"]) / 255.0


def _batch_rgb01_planar(batch: dict) -> jnp.ndarray:
    """Like _batch_rgb01 but channel-planar (B, 3, H, W) for the augment hot
    path; the YCbCr transport builds planes natively (no NHWC round-trip)."""
    if "image" in batch:
        return batch["image"].transpose(0, 3, 1, 2).astype(jnp.float32) / 255.0
    from chess_vision_tpu.ops.preprocess import ycbcr420_to_rgb_planar

    return ycbcr420_to_rgb_planar(batch["y"], batch["cb"], batch["cr"]) / 255.0


def preprocess_train_batch(batch, key, mean, std, dtype=jnp.float32,
                           channel_perm_p: float = 0.0, invert_p: float = 0.0):
    """Train-batch preprocessing, planar end-to-end: reconstruct/augment/
    normalize at (B, 3, H, W) and transpose to the model's NHWC once at the
    very end (a single layout pass instead of lane-starved elementwise
    chains — see the planar-pipeline note above)."""
    x = _batch_rgb01_planar(batch)
    keys = jax.random.split(key, x.shape[0])
    x = _augment_batch_impl_p(x, keys, channel_perm_p, invert_p)
    mean = jnp.asarray(mean, jnp.float32)[None, :, None, None]
    std = jnp.asarray(std, jnp.float32)[None, :, None, None]
    x = ((x - mean) / std).astype(dtype)
    return x.transpose(0, 2, 3, 1)


def preprocess_eval_batch(batch, mean, std, dtype=jnp.float32):
    return normalize(_batch_rgb01(batch), mean, std, dtype)
