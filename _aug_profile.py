"""Isolate the train-step augmentation cost (pass 3 of the r4 MFU hunt).

Pass 2 showed fwd+bwd+adam at bs256 = 0.255 s (36.7% MFU) while the full
step with augment_train = 4.30 s: the augmentation pipeline costs ~4 s.
This times each stage of transforms.augment_train and candidate crop
implementations on the real chip.
"""
import functools
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from salve_tpu.training import transforms

B, N, H, W = 256, 4, 234, 234
CH, CW = 224, 224
REPS = 8


def timeit(name, fn, *args):
    out = fn(*args)
    s = float(jnp.sum(out[..., 0, 0, 0] if out.ndim > 3 else out))  # fetch barrier
    t0 = time.time()
    acc = None
    for _ in range(REPS):
        out = fn(*args)
        acc = out if acc is None else acc + out
    float(jnp.sum(acc) * 0 + jnp.sum(acc[..., 0, 0, 0] if acc.ndim > 3 else acc))
    dt = (time.time() - t0) / REPS
    print(json.dumps({"stage": name, "ms": round(dt * 1000, 1)}), flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 255, (B, N, H, W, 3)).astype(np.float32))
    imgs_u8 = jnp.asarray(rng.integers(0, 255, (B, N, H, W, 3), dtype=np.uint8))
    key = jax.random.PRNGKey(0)

    # Full augment_train as in the train step (photometric on and off).
    f_full = jax.jit(lambda k, x: transforms.augment_train(k, x, CH, CW, photometric=True))
    timeit("augment_full_photo", f_full, key, imgs)
    f_nophoto = jax.jit(lambda k, x: transforms.augment_train(k, x, CH, CW, photometric=False))
    timeit("augment_nophoto", f_nophoto, key, imgs)

    # Stage: photometric only.
    f_photo = jax.jit(transforms.photometric_shift)
    timeit("photometric_only", f_photo, key, imgs)

    # Stage: crop via vmapped dynamic_slice (the pre-fix implementation,
    # kept inline for reruns: it measured 904 ms vs 25 ms take_along_axis).
    def _crop_one(img_tuple, off_h, off_w, crop_h, crop_w):
        return jax.lax.dynamic_slice(
            img_tuple, (0, off_h, off_w, 0),
            (img_tuple.shape[0], crop_h, crop_w, 3))

    def crop_vmap(k, x):
        kh, kw = jax.random.split(k)
        off_h = jax.random.randint(kh, (B,), 0, H - CH + 1)
        off_w = jax.random.randint(kw, (B,), 0, W - CW + 1)
        return jax.vmap(_crop_one, in_axes=(0, 0, 0, None, None))(
            x, off_h, off_w, CH, CW)
    timeit("crop_vmap_dynslice", jax.jit(crop_vmap), key, imgs)

    # Stage: crop via two take_along_axis gathers (row-coherent).
    def crop_taa(k, x):
        kh, kw = jax.random.split(k)
        off_h = jax.random.randint(kh, (B,), 0, H - CH + 1)
        off_w = jax.random.randint(kw, (B,), 0, W - CW + 1)
        rows = off_h[:, None] + jnp.arange(CH)  # (B, CH)
        x = jnp.take_along_axis(x, rows[:, None, :, None, None], axis=2)
        cols = off_w[:, None] + jnp.arange(CW)
        return jnp.take_along_axis(x, cols[:, None, None, :, None], axis=3)
    timeit("crop_take_along_axis", jax.jit(crop_taa), key, imgs)

    # Stage: flips via where (current).
    def flips(k, x):
        kh, kv = jax.random.split(k)
        do_h = jax.random.bernoulli(kh, 0.5, (B,))
        do_v = jax.random.bernoulli(kv, 0.5, (B,))
        x = jnp.where(do_h[:, None, None, None, None], x[:, :, :, ::-1], x)
        return jnp.where(do_v[:, None, None, None, None], x[:, :, ::-1], x)
    timeit("flips_where", jax.jit(flips), key, imgs)

    # Stage: normalize.
    timeit("normalize", jax.jit(transforms.normalize_batch), imgs)

    # uint8 variant of the full pipeline (4x less input traffic).
    timeit("augment_nophoto_u8_input", f_nophoto, key, imgs_u8)


if __name__ == "__main__":
    main()
