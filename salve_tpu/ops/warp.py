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
import numpy as np

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


_HOST_GRID_CACHE: dict = {}


def warp_bank_sim2_nn_host(
    bank_packed: "np.ndarray",
    i2Ri1: "np.ndarray",
    i2ti1_scaled: "np.ndarray",
    dst_img_px: int = bev_ops.DEFAULT_BEV_IMG_PX,
    meters_per_px: float = bev_ops.DEFAULT_METERS_PER_PX,
    bank_idx: "np.ndarray | None" = None,
) -> "np.ndarray":
    """Numpy mirror of warp_bank_sim2_nn (bit-exact, tested) for HOST warps.

    The corpus-write path (rendering/dataset_renderer.py) must land every
    image on the host anyway; fetching the per-pano banks ONCE and warping
    host-side moves ~N_panos images across the device->host link instead of
    ~N_hypotheses (~100x less — through the axon tunnel the per-pair fetch,
    not the render, is the corpus bottleneck). The device paths
    (warp_bank_auto: Pallas shear / XLA gather) remain for fused inference,
    where the warped image feeds the verifier without leaving the device.

    Args:
        bank_packed: (B, Hs, Ws) int32 packed rgb888, one source per output
            image — or, with `bank_idx`, the full (P, Hs, Ws) pano bank.
        bank_idx: optional (B,) indices into a (P, ...) `bank_packed`; the
            gather then reads the full bank in place instead of first
            materializing a (B, Hs, Ws) copy (each source image is ~4 MB —
            the copy dominated the warp at corpus batch sizes).
    """
    import numpy as np

    packed = bank_packed
    if bank_idx is None:
        b, src_h, src_w = packed.shape
    else:
        b = len(bank_idx)
        _, src_h, src_w = packed.shape
    dst_h = dst_w = dst_img_px + 1
    half_dst = int((dst_img_px / 2) * meters_per_px)
    half_src = int(((src_h - 1) / 2) * meters_per_px)

    key = (dst_h, dst_w, float(meters_per_px), half_dst)
    w = _HOST_GRID_CACHE.get(key)
    if w is None:
        px = np.broadcast_to(
            np.arange(dst_w, dtype=np.float32)[None, :], (dst_h, dst_w)
        )
        py_stored = np.broadcast_to(
            np.arange(dst_h, dtype=np.float32)[:, None], (dst_h, dst_w)
        )
        py = (dst_h - 1) - py_stored
        wx = px * np.float32(meters_per_px) - np.float32(half_dst)
        wy = py * np.float32(meters_per_px) - np.float32(half_dst)
        w = np.stack([wx, wy], axis=-1)  # (H, W, 2)
        _HOST_GRID_CACHE[key] = w
    w_rel = w[None] - i2ti1_scaled.astype(np.float32)[:, None, None, :]
    w_src = np.einsum(
        "bji,bhwj->bhwi", i2Ri1.astype(np.float32), w_rel
    ).astype(np.float32)

    qx = np.round(
        (w_src[..., 0] + np.float32(half_src)) / np.float32(meters_per_px)
    ).astype(np.int32)
    qy = np.round(
        (w_src[..., 1] + np.float32(half_src)) / np.float32(meters_per_px)
    ).astype(np.int32)
    inb = (qx >= 0) & (qx < src_w) & (qy >= 0) & (qy < src_h)
    qy_stored = (src_h - 1) - qy

    flat = np.where(inb, qy_stored * src_w + qx, 0)
    if bank_idx is None:
        got = np.take_along_axis(
            packed.reshape(b, src_h * src_w), flat.reshape(b, -1), axis=1
        ).reshape(b, dst_h, dst_w)
    else:
        page = np.asarray(bank_idx, dtype=np.int64)[:, None, None] * (
            src_h * src_w
        )
        got = packed.reshape(-1)[page + flat]
    got = np.where(inb, got, 0)

    return np.stack(
        [(got >> 16) & 0xFF, (got >> 8) & 0xFF, got & 0xFF], axis=-1
    ).astype(np.uint8)


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


# ---------------------------------------------------------------------------
# Shear-decomposition NN warp: coherent row slices instead of a random gather.
# ---------------------------------------------------------------------------

_TAN22 = 0.4142135623730951  # tan(pi/8): max |shear a| after 90-deg reduction
_SIN45 = 0.7071067811865476  # sin(pi/4): max |shear s|


def _row_slice_pass(img: jnp.ndarray, starts: jnp.ndarray, span: int) -> jnp.ndarray:
    """out[..., r, :span] = img[..., r, starts[..., r] : starts[..., r]+span].

    The workhorse of the shear warp: one contiguous lane window per row —
    XLA lowers the vmapped dynamic_slice to a gather of (1, span) slices,
    which is coherent (row-sized transfers) unlike the per-cell gather of
    warp_bank_sim2_nn.

    Zero semantics: logical reads outside [0, W) yield 0. Padding each row
    by `span` zeros on both sides makes the clamp exact: any start clamped
    to -span (fully left of content) or W (fully right) lands entirely in
    the zero margin, and partial windows overlap the margin correctly.
    """
    w = img.shape[-1]
    pad = [(0, 0)] * (img.ndim - 1) + [(span, span)]
    padded = jnp.pad(img, pad)
    starts_c = jnp.clip(starts, -span, w) + span

    def one_row(row, s0):
        return jax.lax.dynamic_slice_in_dim(row, s0, span, axis=0)

    f = one_row
    for _ in range(img.ndim - 1):
        f = jax.vmap(f)
    return f(padded, starts_c)


def _shear_params(i2Ri1, i2ti1_scaled, src_half_m, dst_half_m, meters_per_px):
    """Per-image (n, a, s, b2) of the 90-deg-reduced 3-shear factorization.

    Pixel-domain inverse map: q = A p + b, A = R^T (target px -> source px,
    both pre-flip). Reduce A = rot(phi) . Q^n (Q = rot90, n in 0..3,
    phi in [-45, 45]) about the target center c, then factor
    rot(phi) = Shx(a) . Shy(s) . Shx(a) with a = -tan(phi/2), s = sin(phi).
    """
    m = meters_per_px
    A = jnp.swapaxes(i2Ri1, -1, -2)  # R^T
    tx, ty = i2ti1_scaled[..., 0], i2ti1_scaled[..., 1]
    b0 = (src_half_m - (A[..., 0, 0] * (dst_half_m + tx) + A[..., 0, 1] * (dst_half_m + ty))) / m
    b1 = (src_half_m - (A[..., 1, 0] * (dst_half_m + tx) + A[..., 1, 1] * (dst_half_m + ty))) / m
    psi = jnp.arctan2(A[..., 1, 0], A[..., 0, 0])
    n = jnp.round(psi / (jnp.pi / 2)).astype(jnp.int32) % 4
    phi = psi - jnp.round(psi / (jnp.pi / 2)) * (jnp.pi / 2)
    a = -jnp.tan(phi / 2)
    s = jnp.sin(phi)
    return n, a, s, phi, jnp.stack([b0, b1], axis=-1)


def _q_center_correction(n, phi, c):
    """b2 term from rotating the target grid about its center.

    out[p] = T1[Q(p - c) + c] factors A = rot(phi) . Q about the center
    c = (D-1)/2, which shifts the sampling offset by
    rot(phi) (Q c_vec - c_vec), c_vec = (c, c).
    """
    table = jnp.array(
        [[0.0, 0.0], [-2.0, 0.0], [-2.0, -2.0], [0.0, -2.0]], jnp.float32
    ) * c  # (4, 2): Q^n c_vec - c_vec
    qc = table[n]  # (B, 2)
    cos, sin = jnp.cos(phi), jnp.sin(phi)
    return jnp.stack(
        [cos * qc[..., 0] - sin * qc[..., 1],
         sin * qc[..., 0] + cos * qc[..., 1]],
        axis=-1,
    )


@functools.partial(jax.jit, static_argnames=("dst_img_px", "meters_per_px"))
def warp_bank_sim2_shear(
    bank: jnp.ndarray,
    i2Ri1: jnp.ndarray,
    i2ti1_scaled: jnp.ndarray,
    dst_img_px: int = bev_ops.DEFAULT_BEV_IMG_PX,
    meters_per_px: float = bev_ops.DEFAULT_METERS_PER_PX,
) -> jnp.ndarray:
    """3-shear NN Sim(2) warp: same contract as warp_bank_sim2_nn.

    Replaces the per-cell random gather with three row-coherent slice
    passes (x-shear, transposed y-shear, x-shear) plus an exact rot90 — the
    classic Paeth factorization, NN-rounded per pass. Positional error vs
    the one-rounding exact NN warp is <= ~1.5 px (drift measured in
    tests/parity/test_warp_drift.py); axis-aligned motions on the grid stay
    exact.

    Accepts packed (B, Hs, Ws) int32 banks only (pack_rgb888).
    """
    assert bank.ndim == 3, "shear warp expects packed rgb888 banks"
    b, src_h, src_w = bank.shape
    d = dst_img_px + 1
    half_dst = int((dst_img_px / 2) * meters_per_px)
    half_src = int(((src_h - 1) / 2) * meters_per_px)

    # Static intermediate extents (worst case over phi in [-45, 45]).
    x3 = d + int(np.ceil(_TAN22 * (d - 1)))  # pass-3 lane extent
    y2 = d + int(np.ceil(_SIN45 * (x3 - 1)))  # pass-2 row extent

    n, a, s, phi, b2 = _shear_params(
        i2Ri1, i2ti1_scaled, half_src, half_dst, meters_per_px
    )
    b2 = b2 + _q_center_correction(n, phi, (d - 1) / 2.0)

    # Array origins: logical x3 = x3_arr + O3, logical y2 = y2_arr + O2.
    o3 = jnp.minimum(0, jnp.round(a * (d - 1))).astype(jnp.int32)  # (B,)
    x3_log = jnp.arange(x3, dtype=jnp.float32)[None, :] + o3[:, None]  # (B, x3)
    r2 = jnp.round(s[:, None] * x3_log).astype(jnp.int32)  # (B, x3)
    o2 = jnp.minimum(0, jnp.min(r2, axis=1))  # (B,)

    srcp = bank[:, ::-1]  # stored -> pre-flip rows

    # Pass 1: I1[y2_arr, x3_arr] = srcp[y2_log + round(b2y), x3_log + round(a*y2_log + b2x)]
    y2_log = jnp.arange(y2, dtype=jnp.float32)[None, :] + o2[:, None]  # (B, y2)
    row_src = (y2_log + jnp.round(b2[:, 1:2])).astype(jnp.int32)  # (B, y2)
    # row selection: per-row dynamic row index -> use _row_slice_pass on the
    # TRANSPOSED source is wasteful; rows are a contiguous block here
    # (row_src = y2_arr + const), so slice rows once with the same
    # clamp-into-zeros trick done via masking.
    row0 = row_src[:, 0]  # (B,) first source row
    row_ok = (row_src >= 0) & (row_src < src_h)  # (B, y2)
    rows = _row_slice_pass(
        jnp.swapaxes(srcp, 1, 2), jnp.broadcast_to(row0[:, None], (b, src_w)), y2
    )  # (B, src_w, y2): lanes=rows after swap
    rows = jnp.swapaxes(rows, 1, 2)  # (B, y2, src_w)
    rows = jnp.where(row_ok[:, :, None], rows, 0)
    starts1 = (o3[:, None] + jnp.round(a[:, None] * y2_log + b2[:, 0:1])).astype(jnp.int32)
    i1 = _row_slice_pass(rows, starts1, x3)  # (B, y2, x3)

    # Pass 2 (transposed): I2T[x3_arr, v] = I1T[x3_arr, v + r2 - o2]
    i1t = jnp.swapaxes(i1, 1, 2)  # (B, x3, y2)
    starts2 = r2 - o2[:, None]  # (B, x3)
    i2t = _row_slice_pass(i1t, starts2, d)  # (B, x3, d)
    i2 = jnp.swapaxes(i2t, 1, 2)  # (B, d, x3)

    # Pass 3: T1[v, u] = I2[v, u + round(a*v) - O3]
    v_idx = jnp.arange(d, dtype=jnp.float32)[None, :]
    starts3 = (jnp.round(a[:, None] * v_idx) - o3[:, None]).astype(jnp.int32)
    t1 = _row_slice_pass(i2, starts3, d)  # (B, d, d)

    # Final 90-deg grid permutation: out_preflip[v, u] = T1[P p].
    def rot_n0(x):
        return x

    def rot_n1(x):
        return jnp.swapaxes(x[:, :, ::-1], 1, 2)

    def rot_n2(x):
        return x[:, ::-1, ::-1]

    def rot_n3(x):
        return jnp.swapaxes(x[:, ::-1, :], 1, 2)

    # n is per-image; group by switch over the batch is data-dependent —
    # evaluate all four permutations and select per image (3 extra cheap
    # flips of a (d, d) i32 plane).
    variants = jnp.stack([rot_n0(t1), rot_n1(t1), rot_n2(t1), rot_n3(t1)], 1)
    outp = jnp.take_along_axis(
        variants, n[:, None, None, None].astype(jnp.int32), axis=1
    )[:, 0]

    out_stored = outp[:, ::-1]  # pre-flip -> stored orientation
    got = out_stored
    return jnp.stack(
        [(got >> 16) & 0xFF, (got >> 8) & 0xFF, got & 0xFF], axis=-1
    ).astype(jnp.uint8)


def warp_bank_auto(
    bank_packed: jnp.ndarray,
    i2Ri1: jnp.ndarray,
    i2ti1_scaled: jnp.ndarray,
    dst_img_px: int = bev_ops.DEFAULT_BEV_IMG_PX,
    meters_per_px: float = bev_ops.DEFAULT_METERS_PER_PX,
) -> jnp.ndarray:
    """Production warp dispatch: Pallas 3-shear on TPU, gather NN elsewhere.

    The barrel-shift Pallas kernel (ops/pallas_warp.py, v2) replaces the
    per-row scalar-loop v1 kernel: bit-exact vs the same XLA shear oracle
    and ~11x faster on chip (0.26 vs 2.9 ms/img under shared-chip load;
    v1 itself was ~13x the gather warp — BENCH_NOTES.md). CPU backends
    (tests, virtual meshes) keep the exact-NN gather, whose drift vs the
    direct render is statistically identical to the shear's
    (tests/parity/test_warp_drift.py). SALVE_TPU_DISABLE_PALLAS=1 forces
    the gather everywhere.
    """
    if bev_ops._use_pallas_fill():  # same backend gate as the fill kernel
        from salve_tpu.ops.pallas_warp import warp_bank_sim2_shear_pallas_v2

        return warp_bank_sim2_shear_pallas_v2(
            bank_packed, i2Ri1, i2ti1_scaled, dst_img_px, meters_per_px
        )
    return warp_bank_sim2_nn(
        bank_packed, i2Ri1, i2ti1_scaled, dst_img_px, meters_per_px
    )
