"""Pallas kernel: fused BEV hole-fill + hallucination-mask stencil.

The XLA path (ops/bev.py: fill_holes) runs FILL_ITERS dilation-average
iterations as separate conv ops, with the loop state round-tripping through
HBM between iterations. A 501x501 f32 plane is ~1 MB — it fits in VMEM many
times over — so this kernel keeps one channel's image + the occupancy plane
resident on-chip for the whole fixed-point iteration, touching HBM exactly
twice per channel (load inputs, store output). The single 11x11 support
count stays in XLA (one separable conv; putting it in the same kernel blows
the 16 MB VMEM stack budget on padded temporaries).

Stencils are expressed as zero-padded static shifts (pad + slice), which
Mosaic lowers to VPU-register shuffles; box sums are separable.

Numerically identical to the XLA path (same op order); the test suite
asserts exact agreement in interpret mode, and compiled-TPU output matches
interpret exactly at lane-aligned sizes (verified at 64x128).

STATUS: verified correct on device at the production 501x501 size against
an independent numpy oracle (max |diff| 4.6e-5). An earlier apparent
mismatch was root-caused to the OLD XLA path itself: TPU convolutions
default to bf16 passes, rounding the fill's box sums by ~0.6% of image
range — the Pallas kernel (exact f32 shifts/adds) was the correct side.
ops/bev.py now runs its convs at Precision.HIGHEST and the two paths agree
exactly. This kernel IS the production texture-fill path on TPU backends
at ANY batch size (ops/bev.py:_use_pallas_fill -> fill_and_mask_any_batch:
the batch rides the kernel grid up to 32 images and lax.map chunks beyond;
6.3x the XLA conv path); the XLA path serves CPU meshes only.
Since round 2 the caller also applies ops/bev.py:convex_hull_mask on top
(Delaunay-domain restriction, measured in
tests/parity/test_interpolation_drift.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from salve_tpu.ops.bev import DEFAULT_MASK_KERNEL, FILL_ITERS


def _shift(x: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Zero-padded shift of a (H,W) plane by (dy, dx)."""
    H, W = x.shape
    pad_y = (max(dy, 0), max(-dy, 0))
    pad_x = (max(dx, 0), max(-dx, 0))
    xp = jnp.pad(x, (pad_y, pad_x))
    return xp[pad_y[1] : pad_y[1] + H, pad_x[1] : pad_x[1] + W]


def _box_sum(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Separable KxK box sum of a (H,W) plane via static shifts."""
    r = k // 2
    rows = x
    for d in range(1, r + 1):
        rows = rows + _shift(x, d, 0) + _shift(x, -d, 0)
    out = rows
    for d in range(1, r + 1):
        out = out + _shift(rows, 0, d) + _shift(rows, 0, -d)
    return out


def _fill_mask_kernel(rgb_ref, occ_ref, mask_ref, valid_ref, out_ref):
    """One grid program per color channel (keeps the VMEM live set small).

    The occupancy fixed-point evolves identically for every channel, so each
    program recomputes it — 3x redundant adds on the VPU in exchange for a
    3x smaller working set. `mask_ref` holds the precomputed 11x11
    support-count mask; `valid_ref` marks the real (unpadded) image area —
    the fill is pinned to zero outside it so host-side alignment padding
    reproduces zero-padded convolution semantics exactly.
    """
    img = rgb_ref[0]        # (H, W) — this program's channel
    occ = occ_ref[:]        # (H, W)
    support = mask_ref[:]
    valid = valid_ref[:]

    def body(_, carry):
        img, o = carry
        den = _box_sum(o, 3)
        num = _box_sum(img * o, 3)
        fill = num / jnp.maximum(den, 1.0)
        new_o = jnp.clip(den, 0.0, 1.0) * valid
        img = jnp.where(o > 0, img, fill) * valid
        return img, jnp.maximum(o, new_o)

    img, _ = jax.lax.fori_loop(0, FILL_ITERS, body, (img, occ))
    out_ref[0] = jnp.where(support > 0.5, img, 0.0)


# Per-kernel-launch batch cap: Mosaic's scoped-VMEM stack grows slightly
# with grid length and with the surrounding composition, crossing the 16 MB
# limit at batch 32 inside the fused render+verify program (17.34M observed)
# and at 64 standalone (19.31M). 16 leaves margin in every composition
# tested. Above the cap, fill_and_mask_any_batch runs the same kernel over
# lax.map chunks — a sequential loop over ONE compiled instance, so scoped
# allocations do not stack (unlike inline vmap instances).
_KERNEL_MAX_BATCH = 16


@functools.partial(jax.jit, static_argnames=("interpret",))
def fill_and_mask_any_batch(
    sparse_imgs: jnp.ndarray,
    occupied: jnp.ndarray,
    support: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched fill+mask for ANY batch size (chunks through the VMEM kernel)."""
    B = sparse_imgs.shape[0]
    if B <= _KERNEL_MAX_BATCH:
        return fill_and_mask_batched(sparse_imgs, occupied, support, interpret)
    chunk = _KERNEL_MAX_BATCH
    pad = (-B) % chunk
    sp = jnp.pad(sparse_imgs, ((0, pad), (0, 0), (0, 0), (0, 0)))
    oc = jnp.pad(occupied, ((0, pad), (0, 0), (0, 0)))
    su = jnp.pad(support, ((0, pad), (0, 0), (0, 0)))
    n = sp.shape[0] // chunk
    sp = sp.reshape((n, chunk) + sp.shape[1:])
    oc = oc.reshape((n, chunk) + oc.shape[1:])
    su = su.reshape((n, chunk) + su.shape[1:])
    out = jax.lax.map(
        lambda t: fill_and_mask_batched(*t, interpret=interpret), (sp, oc, su)
    )
    return out.reshape((n * chunk,) + out.shape[2:])[:B]


@functools.partial(jax.jit, static_argnames=("interpret",))
def fill_and_mask_batched(
    sparse_imgs: jnp.ndarray,  # (B, H, W, 3) float
    occupied: jnp.ndarray,     # (B, H, W) bool
    support: jnp.ndarray,      # (B, H, W) bool
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched VMEM-resident fill + mask: (B,H,W,3) in one kernel launch.

    The batch rides the Pallas grid — grid=(B, 3) programs each own one
    (batch, channel) plane, so per-step VMEM is ONE image regardless of B
    (Mosaic streams blocks between grid steps). This replaces the former
    jax.vmap(fill_and_mask) composition, whose scoped-VMEM allocations
    stacked across the vmapped batch and OOM'd beyond batch 32
    (the old ops/bev.py _PALLAS_FILL_MAX_BATCH gate, now lifted).
    """
    B, H, W, _ = sparse_imgs.shape
    rgb = jnp.transpose(sparse_imgs, (0, 3, 1, 2)).astype(jnp.float32)
    occ = occupied.astype(jnp.float32)
    sup = support.astype(jnp.float32)

    from salve_tpu.ops.bev import _box_counts

    mask = (_box_counts(sup, DEFAULT_MASK_KERNEL) > 0.5).astype(jnp.float32)

    Hp = -(-H // 8) * 8
    Wp = -(-W // 128) * 128
    pad2 = ((0, 0), (0, Hp - H), (0, Wp - W))
    rgb_p = jnp.pad(rgb, ((0, 0), (0, 0)) + pad2[1:])
    occ_p = jnp.pad(occ, pad2)
    mask_p = jnp.pad(mask, pad2)
    valid_p = jnp.broadcast_to(
        jnp.pad(jnp.ones((H, W), jnp.float32), pad2[1:])[None], (B, Hp, Wp)
    )

    mem = pl.ANY if interpret else pltpu.VMEM
    out = pl.pallas_call(
        _fill_mask_kernel_batched,
        grid=(B, 3),
        out_shape=jax.ShapeDtypeStruct((B, 3, Hp, Wp), jnp.float32),
        in_specs=[
            pl.BlockSpec((1, 1, Hp, Wp), lambda b, c: (b, c, 0, 0), memory_space=mem),
            pl.BlockSpec((1, Hp, Wp), lambda b, c: (b, 0, 0), memory_space=mem),
            pl.BlockSpec((1, Hp, Wp), lambda b, c: (b, 0, 0), memory_space=mem),
            pl.BlockSpec((1, Hp, Wp), lambda b, c: (b, 0, 0), memory_space=mem),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, Hp, Wp), lambda b, c: (b, c, 0, 0), memory_space=mem
        ),
        interpret=interpret,
    )(rgb_p, occ_p, mask_p, valid_p)
    return jnp.transpose(out[:, :, :H, :W], (0, 2, 3, 1))


def _fill_mask_kernel_batched(rgb_ref, occ_ref, mask_ref, valid_ref, out_ref):
    """Batched twin of _fill_mask_kernel: refs carry leading (1,...) block dims."""
    img = rgb_ref[0, 0]
    occ = occ_ref[0]
    support = mask_ref[0]
    valid = valid_ref[0]

    def body(_, carry):
        img, o = carry
        den = _box_sum(o, 3)
        num = _box_sum(img * o, 3)
        fill = num / jnp.maximum(den, 1.0)
        new_o = jnp.clip(den, 0.0, 1.0) * valid
        img = jnp.where(o > 0, img, fill) * valid
        return img, jnp.maximum(o, new_o)

    img, _ = jax.lax.fori_loop(0, FILL_ITERS, body, (img, occ))
    out_ref[0, 0] = jnp.where(support > 0.5, img, 0.0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fill_and_mask(
    sparse_img: jnp.ndarray,   # (H, W, 3) float
    occupied: jnp.ndarray,     # (H, W) bool
    support: jnp.ndarray,      # (H, W) bool (all-channels-nonzero of u8 sparse)
    interpret: bool = False,
) -> jnp.ndarray:
    """VMEM-resident fill + mask; returns the masked dense (H,W,3) image."""
    H, W, _ = sparse_img.shape
    rgb = jnp.transpose(sparse_img, (2, 0, 1)).astype(jnp.float32)
    occ = occupied.astype(jnp.float32)
    sup = support.astype(jnp.float32)

    # Hallucination mask (11x11 support count) via XLA's separable conv.
    from salve_tpu.ops.bev import _box_counts

    mask = (_box_counts(sup, DEFAULT_MASK_KERNEL) > 0.5).astype(jnp.float32)

    # Mosaic mishandles pad/slice shuffles on non-(8,128)-aligned planes;
    # pad to aligned sizes and pin the pad region via the valid plane.
    Hp = -(-H // 8) * 8
    Wp = -(-W // 128) * 128
    pad2 = ((0, Hp - H), (0, Wp - W))
    rgb_p = jnp.pad(rgb, ((0, 0),) + pad2)
    occ_p = jnp.pad(occ, pad2)
    mask_p = jnp.pad(mask, pad2)
    valid_p = jnp.pad(jnp.ones((H, W), jnp.float32), pad2)

    mem = pl.ANY if interpret else pltpu.VMEM
    out = pl.pallas_call(
        _fill_mask_kernel,
        grid=(3,),
        out_shape=jax.ShapeDtypeStruct((3, Hp, Wp), jnp.float32),
        in_specs=[
            pl.BlockSpec((1, Hp, Wp), lambda c: (c, 0, 0), memory_space=mem),
            pl.BlockSpec((Hp, Wp), lambda c: (0, 0), memory_space=mem),
            pl.BlockSpec((Hp, Wp), lambda c: (0, 0), memory_space=mem),
            pl.BlockSpec((Hp, Wp), lambda c: (0, 0), memory_space=mem),
        ],
        out_specs=pl.BlockSpec((1, Hp, Wp), lambda c: (c, 0, 0), memory_space=mem),
        interpret=interpret,
    )(rgb_p, occ_p, mask_p, valid_p)
    return jnp.transpose(out[:, :H, :W], (1, 2, 0))
