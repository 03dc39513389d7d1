"""Batched on-device data augmentation for verifier training.

Parity: salve/utils/transform.py + salve/train_utils.py:63-160. The
reference ran 26 per-image transform classes in 15 DataLoader worker
processes; here the whole pipeline is ONE jitted batched function on the
VPU, with tuple-consistent randomness exactly as the reference:

  * resize        — applied per image (ResizePair/.../Sextuplet)
  * photometric   — per image INDEPENDENTLY (PhotometricShiftQuadruplet)
  * random crop   — SAME offset for every image of a tuple (CropPair:373)
  * random h/v flip — SAME decision for every image of a tuple (:509)
  * normalize     — ImageNet mean/std in [0,255] scale

Train batches are (B, n_imgs, H, W, 3) float32 in [0,255].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# ImageNet mean/std in [0,255] scale (salve/utils/normalization_utils.py:13).
IMAGENET_MEAN = jnp.array([0.485 * 255, 0.456 * 255, 0.406 * 255])
IMAGENET_STD = jnp.array([0.229 * 255, 0.224 * 255, 0.225 * 255])

# ColorJitter ranges (salve/utils/transform.py:659-663).
BRIGHTNESS_JITTER = 0.5
CONTRAST_JITTER = 0.5
SATURATION_JITTER = 0.5
HUE_JITTER = 0.05


def resize_batch(imgs: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear resize of a (B, N, H, W, 3) batch."""
    b, n = imgs.shape[:2]
    return jax.image.resize(
        imgs, (b, n, out_h, out_w, 3), method="linear"
    )


def normalize_batch(imgs: jnp.ndarray) -> jnp.ndarray:
    """ImageNet normalization ([0,255] inputs)."""
    return (imgs - IMAGENET_MEAN) / IMAGENET_STD


def _rgb_to_gray(img: jnp.ndarray) -> jnp.ndarray:
    return (
        0.299 * img[..., 0:1] + 0.587 * img[..., 1:2] + 0.114 * img[..., 2:3]
    )


def photometric_shift(key: jax.Array, imgs: jnp.ndarray) -> jnp.ndarray:
    """Brightness/contrast/saturation/hue jitter, independent per image.

    imgs: (B, N, H, W, 3) in [0,255].
    """
    b, n = imgs.shape[:2]
    kb, kc, ks, kh = jax.random.split(key, 4)
    shape = (b, n, 1, 1, 1)
    brightness = jax.random.uniform(
        kb, shape, minval=1 - BRIGHTNESS_JITTER, maxval=1 + BRIGHTNESS_JITTER
    )
    contrast = jax.random.uniform(
        kc, shape, minval=1 - CONTRAST_JITTER, maxval=1 + CONTRAST_JITTER
    )
    saturation = jax.random.uniform(
        ks, shape, minval=1 - SATURATION_JITTER, maxval=1 + SATURATION_JITTER
    )
    hue = jax.random.uniform(kh, shape, minval=-HUE_JITTER, maxval=HUE_JITTER)

    out = imgs * brightness
    mean_gray = jnp.mean(_rgb_to_gray(out), axis=(2, 3), keepdims=True)
    out = (out - mean_gray) * contrast + mean_gray
    gray = _rgb_to_gray(out)
    out = (out - gray) * saturation + gray

    # Cheap hue rotation in YIQ space (hue_jitter is tiny: +/-0.05 turns).
    theta = hue * 2 * jnp.pi
    cos_t, sin_t = jnp.cos(theta)[..., 0], jnp.sin(theta)[..., 0]
    y = _rgb_to_gray(out)[..., 0]
    i = 0.596 * out[..., 0] - 0.274 * out[..., 1] - 0.322 * out[..., 2]
    q = 0.211 * out[..., 0] - 0.523 * out[..., 1] + 0.312 * out[..., 2]
    i, q = cos_t * i - sin_t * q, sin_t * i + cos_t * q
    r = y + 0.956 * i + 0.621 * q
    g = y - 0.272 * i - 0.647 * q
    bch = y - 1.106 * i + 1.703 * q
    out = jnp.stack([r, g, bch], axis=-1)
    return jnp.clip(out, 0.0, 255.0)


def _crop_batch(imgs: jnp.ndarray, off_h, off_w, crop_h: int, crop_w: int):
    """Random crop of a (B,N,H,W,3) batch at per-example offsets.

    Two take_along_axis gathers (contiguous row window, then column window)
    instead of a vmapped dynamic_slice: the vmap lowers to a per-element
    gather that costs ~900 ms for a bs256 RN152 batch on a v5e chip — 36x
    the row-coherent form (BENCH_NOTES.md round-4 train-step root cause;
    the same lesson as ops/warp.py's row-slice shear passes).
    """
    rows = off_h[:, None] + jnp.arange(crop_h)  # (B, crop_h)
    imgs = jnp.take_along_axis(imgs, rows[:, None, :, None, None], axis=2)
    cols = off_w[:, None] + jnp.arange(crop_w)  # (B, crop_w)
    return jnp.take_along_axis(imgs, cols[:, None, None, :, None], axis=3)


@functools.partial(jax.jit, static_argnames=("crop_h", "crop_w", "photometric"))
def augment_train(
    key: jax.Array,
    imgs: jnp.ndarray,
    crop_h: int,
    crop_w: int,
    photometric: bool = False,
) -> jnp.ndarray:
    """Training augmentation on a pre-resized (B, N, H, W, 3) batch.

    Random crop + h/v flips share randomness across each tuple (axis 1);
    photometric jitter (if enabled) is independent per image.
    Accepts uint8 or float inputs (uint8 preferred: 4x cheaper host->device
    transfer; upcast happens on device). Returns a normalized float batch.
    """
    b, n, h, w, _ = imgs.shape
    k_crop_h, k_crop_w, k_hflip, k_vflip, k_photo = jax.random.split(key, 5)

    if photometric:
        # Reference order: photometric jitter precedes the crop
        # (train_utils.py:108-118), and it needs float math.
        imgs = photometric_shift(k_photo, imgs.astype(jnp.float32))

    # Crop + flips are dtype-agnostic index ops: on a uint8 batch (the
    # loader's native dtype) they move 4x fewer bytes than after the f32
    # upcast, which happens at normalize below.
    off_h = jax.random.randint(k_crop_h, (b,), 0, h - crop_h + 1)
    off_w = jax.random.randint(k_crop_w, (b,), 0, w - crop_w + 1)
    imgs = _crop_batch(imgs, off_h, off_w, crop_h, crop_w)

    do_h = jax.random.bernoulli(k_hflip, 0.5, (b,))
    do_v = jax.random.bernoulli(k_vflip, 0.5, (b,))
    imgs = jnp.where(do_h[:, None, None, None, None], imgs[:, :, :, ::-1], imgs)
    imgs = jnp.where(do_v[:, None, None, None, None], imgs[:, :, ::-1], imgs)

    return normalize_batch(imgs.astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("crop_h", "crop_w"))
def preprocess_eval(imgs: jnp.ndarray, crop_h: int, crop_w: int) -> jnp.ndarray:
    """Eval preprocessing: deterministic center crop + normalize.

    Parity: salve/train_utils.py:126-160 (get_val_test_transform).
    Accepts uint8 or float inputs (upcast on device).
    """
    imgs = imgs.astype(jnp.float32)
    b, n, h, w, _ = imgs.shape
    off_h = (h - crop_h) // 2
    off_w = (w - crop_w) // 2
    imgs = imgs[:, :, off_h : off_h + crop_h, off_w : off_w + crop_w]
    return normalize_batch(imgs)
