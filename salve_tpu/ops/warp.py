"""Rigid/Sim(2) BEV warp: hypothesis renders from banked identity renders.

TPU-native redesign of the per-hypothesis half of Stage B. The reference
re-renders pano 1's point cloud from scratch for EVERY alignment hypothesis
(salve/utils/bev_rendering_utils.py:417 — backproject, transform, z-order
splat, Qhull interpolate, mask), although the hypothesis only changes a
rigid SE(2) motion of the same cloud (the exporter's hypotheses carry
scale 1; the 1.5 HoHoNet scale rides the translation,
bev_rendering_utils.py:443-451).

A BEV texture map is an orthographic top-down image, so a rigid motion of
the cloud is — up to cell re-quantization — a rigid warp of the rendered
image. This module renders each pano ONCE per surface into an extended
identity bank (radius covering the pano's content), and produces every
hypothesis render as a nearest-neighbor Sim(2) resample of that bank:

    per floor:       P extended identity renders   (P panos)
    per hypothesis:  ONE gather                    (vs splat+fill+mask)

Hypotheses outnumber panos ~100x, so the per-hypothesis marginal cost
drops from the full render (scatter-bound, ~5-7 ms/image on chip) to a
single coherent gather. Nearest-neighbor sampling keeps colors EXACTLY in
the u8 palette of the source render (no blending), mirroring the z-order
splat's pick-one-point semantics.

Approximation vs the direct render (measured in
tests/parity/test_warp_drift.py, numbers in BENCH_NOTES.md):
  * winners are chosen in the source frame's cell partition, then mapped
    through the rigid motion with one rounding — cells straddling the
    rotated grid boundary can disagree with a direct re-splat;
  * content farther than the bank half-extent from pano 1 is absent; the
    bank is rendered with a larger extent (default +-10 m vs the target's
    +-5 m) so only content >10 m from the camera is lost.
The fill and hallucination mask ride along from the source render instead
of being recomputed in the target frame.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from salve_tpu.ops import bev as bev_ops

# Extended identity-bank extent for warp sources: +-10 m at 0.02 m/px.
# Target renders keep the reference's +-5 m (DEFAULT_BEV_IMG_PX = 500), so
# any target cell within the frame samples inside the bank as long as the
# hypothesis translation stays under 5 m (typical intra-floor pairs).
DEFAULT_WARP_BANK_PX = 1000


def pack_rgb888(imgs_u8: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) uint8 -> (...) int32 packed 0xRRGGBB (bank storage format)."""
    x = imgs_u8.astype(jnp.int32)
    return (x[..., 0] << 16) | (x[..., 1] << 8) | x[..., 2]


@functools.partial(
    jax.jit, static_argnames=("dst_img_px", "meters_per_px")
)
def warp_bank_sim2_nn(
    bank: jnp.ndarray,
    i2Ri1: jnp.ndarray,
    i2ti1_scaled: jnp.ndarray,
    dst_img_px: int = bev_ops.DEFAULT_BEV_IMG_PX,
    meters_per_px: float = bev_ops.DEFAULT_METERS_PER_PX,
) -> jnp.ndarray:
    """Nearest-neighbor Sim(2) warp of banked identity renders.

    Args:
        bank: identity renders of pano 1, one per hypothesis (callers
            gather the per-pano bank by hypothesis i1 index), stored in
            the production orientation (vertically flipped, ops/bev.py
            render output). Either (B, Hs, Ws, 3) uint8, or (B, Hs, Ws)
            int32 packed rgb888 (pack_rgb888) — pre-packed banks skip the
            per-batch packing work.
        i2Ri1: (B, 2, 2) relative rotation (target world <- source world).
        i2ti1_scaled: (B, 2) relative translation in target world meters —
            ALREADY carrying the 1.5 HoHoNet scale, exactly the value added
            to the cloud in rendering/bev_pair.py:_render_pairs_batched.
        dst_img_px: target grid size parameter (output is dst_img_px+1 sq).
        meters_per_px: shared grid resolution.

    Returns:
        (B, dst_img_px+1, dst_img_px+1, 3) uint8 — the hypothesis render of
        pano 1 in pano 2's frame; 0 (empty) where the source bank has no
        content or the sample falls outside the bank.
    """
    if bank.ndim == 4:
        bank_i32 = bank.astype(jnp.int32)
        packed = (
            (bank_i32[..., 0] << 16)
            | (bank_i32[..., 1] << 8)
            | bank_i32[..., 2]
        )
    else:
        packed = bank
    b, src_h, src_w = packed.shape
    dst_h = dst_w = dst_img_px + 1
    half_dst = int((dst_img_px / 2) * meters_per_px)
    half_src = int(((src_h - 1) / 2) * meters_per_px)

    # Target pixel grid -> target world coords (pre-flip convention:
    # p_img = (p_world + half)/mpp; the stored image is flipped, so stored
    # row r corresponds to pre-flip row dst_h-1-r).
    px = jax.lax.broadcasted_iota(jnp.float32, (dst_h, dst_w), 1)
    py_stored = jax.lax.broadcasted_iota(jnp.float32, (dst_h, dst_w), 0)
    py = (dst_h - 1) - py_stored  # pre-flip row
    wx = px * meters_per_px - half_dst
    wy = py * meters_per_px - half_dst

    # Source world = R^T (target world - t).
    w = jnp.stack([wx, wy], axis=-1)  # (H, W, 2)
    w_rel = w[None] - i2ti1_scaled[:, None, None, :]  # (B, H, W, 2)
    w_src = jnp.einsum("bji,bhwj->bhwi", i2Ri1, w_rel)  # R^T via ji index

    # Source pixel (pre-flip), nearest neighbor.
    qx = jnp.round((w_src[..., 0] + half_src) / meters_per_px).astype(jnp.int32)
    qy = jnp.round((w_src[..., 1] + half_src) / meters_per_px).astype(jnp.int32)
    inb = (qx >= 0) & (qx < src_w) & (qy >= 0) & (qy < src_h)
    qy_stored = (src_h - 1) - qy  # stored (flipped) row

    # One packed-rgb888 gather (the 3-channel u8 gather costs 3x; parity
    # with the splat's packed winner gather, ops/bev.py).
    flat = jnp.where(inb, qy_stored * src_w + qx, 0).reshape(b, -1)
    got = jnp.take_along_axis(
        packed.reshape(b, src_h * src_w), flat, axis=1
    ).reshape(b, dst_h, dst_w)
    got = jnp.where(inb, got, 0)

    out = jnp.stack(
        [(got >> 16) & 0xFF, (got >> 8) & 0xFF, got & 0xFF], axis=-1
    ).astype(jnp.uint8)
    return out


def render_identity_bank_extended(
    depths: jnp.ndarray,
    rgbs: jnp.ndarray,
    z_range: Tuple[float, float],
    cfg,
    bank_px: int = DEFAULT_WARP_BANK_PX,
) -> jnp.ndarray:
    """Extended-extent identity renders to serve as warp sources.

    Same production render path (splat -> fill -> mask -> flip) as
    rendering/bev_pair.py:render_identity_batched, on a (bank_px+1) square
    grid — the scatter work is unchanged (same points), only the grid
    grows.
    """
    from salve_tpu.ops import backproject as bp
    from salve_tpu.rendering import bev_pair

    window = bp.surface_row_window(depths.shape[1], z_range, cfg.crop_ratio)
    bp_batched = jax.vmap(bp.backproject_depth, in_axes=(0, 0, None, None, None))
    xyz, c, v = bp_batched(depths, rgbs, z_range, cfg.crop_ratio, window)
    xy = xyz[..., :2] @ bev_pair._R_FIX.T
    xyz = jnp.concatenate([xy, xyz[..., 2:3]], axis=-1)
    return bev_ops.render_bev_images_batched(
        xyz, c, v, bank_px, cfg.meters_per_px, cfg.is_semantics,
        dedup_stride=depths.shape[2],
    )
