"""BEV texture-map rendering: z-order splat + sparse->dense interpolation.

TPU-native redesign of the reference Stage B inner loops:

  * z-order point selection (salve/utils/zorder_utils.py:10) — the reference
    fills a uint64 grid slice-by-slice in 4 z-bins so that higher-z points
    overwrite lower ones, and later point indices overwrite earlier ones
    within a bin. Here that is ONE scatter-max with the lexicographic
    priority key  (z_bin * N + point_index), which XLA lowers to a single
    fused scatter — no host loops, vmappable over a batch of panos.

  * sparse->dense interpolation (salve/utils/interpolation_utils.py:21) —
    the reference calls scipy.interpolate.griddata (Qhull Delaunay, C code,
    host-side). Qhull has no XLA analog; instead we fill holes with a
    fixed-iteration push-style dilation average (3x3 box conv on the VPU).
    Content farther than the hallucination-mask radius from any real point
    is zeroed by the mask anyway (reference kernel 11x11 -> radius 5), so
    the two schemes agree except for interior blending weights.

  * hallucination-mask removal (interpolation_utils.py:74) — identical
    semantics: a KxK box-count of "all-3-channels-nonzero" support pixels;
    cells with zero count are zeroed. The reference ran this via
    torch.nn.functional.conv2d on CUDA; here it is a lax depthwise conv.

All shapes static; everything compiles into one XLA program per batch.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Grid defaults (parity: salve/common/bevparams.py:17-19). Rendered images
# are (img_size+1) square, i.e. 501x501 @ 0.02 m/px.
DEFAULT_BEV_IMG_PX = 500
DEFAULT_METERS_PER_PX = 0.02

# z-order binning defaults (salve/utils/zorder_utils.py:11).
ZMIN, ZMAX, NUM_Z_SLICES = -2.0, 2.0, 4

# Hallucination-mask kernel: 11x11 at 501x501 (interpolation_utils.py:15).
DEFAULT_MASK_KERNEL = 11

# Dilation-fill iterations; radius 6 > mask radius 5, so every cell that can
# survive the mask receives an interpolated value.
FILL_ITERS = 6


def _box_counts(occ: jnp.ndarray, k: int) -> jnp.ndarray:
    """KxK box-filter of a (..., H, W) float map via two separable 1D convs.

    Leading dims fold into the convolution batch dimension, so batched maps
    cost one conv, not one conv per map.
    """
    kernel = jnp.ones((k,), dtype=jnp.float32)
    lead = occ.shape[:-2]
    h, w = occ.shape[-2:]
    x = occ.reshape((-1, 1, h, w))
    # HIGHEST precision: TPU convs default to bf16 passes, which rounds the
    # box sums (0.6% image error after the fill's divisions) — these sums
    # feed value interpolation, not just counting.
    hp = jax.lax.Precision.HIGHEST
    x = jax.lax.conv_general_dilated(
        x, kernel[None, None, :, None], (1, 1), [(k // 2, k // 2), (0, 0)],
        precision=hp,
    )
    x = jax.lax.conv_general_dilated(
        x, kernel[None, None, None, :], (1, 1), [(0, 0), (k // 2, k // 2)],
        precision=hp,
    )
    return x.reshape(lead + (h, w))


def _drop_dominated(
    cell: jnp.ndarray, z_bin: jnp.ndarray, ok: jnp.ndarray, stride: int
) -> jnp.ndarray:
    """Mask out points dominated by a same-cell point `stride` positions later.

    Point i is *dominated* if some valid point j lands in the same BEV cell
    with a larger priority key (z_bin, index) — j wins the cell's scatter-max
    regardless of i, so i can be dropped without changing the output. For
    j = i + stride (the same pano column, next row), z_bin_j >= z_bin_i
    already implies key_j > key_i (j's index is larger). Dominated points
    never win, and the per-cell maximum can never be dominated, so any set
    of such drops is bit-exact.

    Why bother: XLA's scatter-max serializes actual writes; masked points
    map to an out-of-range index under mode="drop" and skip the write
    entirely. Backprojected panos are radially dense near the camera (many
    consecutive same-column rows hit one 2cm cell), so one vector compare
    removes a large share of writes (A/B in BENCH_NOTES.md).
    """
    same = (cell[:, :-stride] == cell[:, stride:]) & ok[:, :-stride] & ok[:, stride:]
    dom = same & (z_bin[:, :-stride] <= z_bin[:, stride:])
    dominated = jnp.pad(dom, ((0, 0), (0, stride)))
    return ok & ~dominated


def splat_zorder_batched(
    xy_img: jnp.ndarray,
    z: jnp.ndarray,
    rgb: jnp.ndarray,
    valid: jnp.ndarray,
    img_h: int,
    img_w: int,
    dedup_stride: int = 0,
    quantize_u8: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched z-order splat: (B,N) points -> (B,H,W) grids in ONE scatter.

    vmapping a scatter makes XLA serialize it per batch element; instead the
    batch is folded into the cell index (cell + b*H*W) so the whole batch is
    a single flat scatter-max — the standard TPU batched-scatter idiom.

    Priority within a cell is (z_bin, point_index) lexicographic, matching
    the reference's slice-by-slice overwrite order exactly
    (salve/utils/zorder_utils.py:10).

    Args:
        xy_img: (B,N,2) integer pixel coordinates (x, y).
        z: (B,N) z-coordinates (meters).
        rgb: (B,N,3) float colors.
        valid: (B,N) bool — invalid points are dropped.
        dedup_stride: if > 0, drop provably-dominated same-cell points at
            this stride before scattering (output-neutral; see
            _drop_dominated).
        quantize_u8: fetch winner colors as ONE packed-rgb888 int32 gather
            instead of a 3-channel float gather (1.65x the whole splat on
            chip — the float winner-gather is ~40% of its cost). The sparse
            colors come back as round(clip(rgb, 0, 255)) integers in f32.
            EXACT when colors are u8-derived (production panos are u8 JPEGs,
            so rgb*255 round-trips bit-exactly — and the reference itself
            interpolates exact u8 colors, bev_rendering_utils.py:254);
            lossy (<=0.5/255) for arbitrary float colors, so OFF by default
            for the generic/shim paths.

    Returns:
        sparse_img: (B,H,W,3) float colors, 0 where empty.
        occupied: (B,H,W) bool occupancy.
    """
    b, n = z.shape
    x, y = xy_img[..., 0], xy_img[..., 1]

    in_bounds = (x >= 0) & (x < img_w) & (y >= 0) & (y < img_h)
    z_bin = jnp.floor((z - ZMIN) / (ZMAX - ZMIN) * NUM_Z_SLICES).astype(jnp.int32)
    in_zrange = (z >= ZMIN) & (z < ZMAX)
    ok = valid & in_bounds & in_zrange

    key = z_bin * n + jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)
    hw = img_h * img_w
    b_off = jax.lax.broadcasted_iota(jnp.int32, (b, n), 0) * hw
    cell_img = y * img_w + x  # per-image cell (batch-offset applied below)

    if dedup_stride > 0 and n > dedup_stride:
        # Two compare passes (1 and 2 pano rows down) drop most radially
        # duplicated writes; each drop is provably output-neutral.
        ok = _drop_dominated(cell_img, z_bin, ok, dedup_stride)
        if n > 2 * dedup_stride:
            ok = _drop_dominated(cell_img, z_bin, ok, 2 * dedup_stride)

    cell = jnp.where(ok, cell_img + b_off, b * hw)  # out-of-range -> dropped

    grid = jnp.full((b * hw,), -1, dtype=jnp.int32)
    grid = grid.at[cell.reshape(-1)].max(
        jnp.where(ok, key, -1).reshape(-1), mode="drop"
    )
    grid = grid.reshape(b, hw)

    occupied = grid >= 0
    winner = jnp.where(occupied, grid % n, 0)  # (B, HW)
    if quantize_u8:
        rgb_i = jnp.clip(jnp.round(rgb), 0, 255).astype(jnp.int32)
        packed = (rgb_i[..., 0] << 16) | (rgb_i[..., 1] << 8) | rgb_i[..., 2]
        got = jnp.take_along_axis(packed, winner, axis=1)  # (B,HW) int32
        sparse = jnp.where(
            occupied[..., None],
            jnp.stack(
                [(got >> 16) & 0xFF, (got >> 8) & 0xFF, got & 0xFF], axis=-1
            ).astype(jnp.float32),
            0.0,
        )
    else:
        sparse = jnp.where(
            occupied[..., None],
            jnp.take_along_axis(rgb, winner[..., None], axis=1),
            0.0,
        )
    return sparse.reshape(b, img_h, img_w, 3), occupied.reshape(b, img_h, img_w)


def splat_zorder(
    xy_img: jnp.ndarray,
    z: jnp.ndarray,
    rgb: jnp.ndarray,
    valid: jnp.ndarray,
    img_h: int,
    img_w: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single-cloud z-order splat ((N,...) -> (H,W,...)); see the batched form."""
    sparse, occupied = splat_zorder_batched(
        xy_img[None], z[None], rgb[None], valid[None], img_h, img_w
    )
    return sparse[0], occupied[0]


def fill_holes(
    sparse_img: jnp.ndarray, occupied: jnp.ndarray, iters: int = FILL_ITERS
) -> jnp.ndarray:
    """Dilation-average hole filling (linear-interpolation surrogate).

    Each iteration assigns empty cells the 3x3 box average of already-filled
    neighbors. `iters` rounds fill holes up to `iters` pixels from support.
    Accepts (..., H, W, 3) images with (..., H, W) occupancy (batched).
    """
    img = sparse_img
    occ = occupied.astype(jnp.float32)

    def body(_, carry):
        img, occ = carry
        num = jnp.stack([_box_counts(img[..., c] * occ, 3) for c in range(3)], -1)
        den = _box_counts(occ, 3)
        fill = num / jnp.maximum(den, 1.0)[..., None]
        new_occ = jnp.clip(den, 0.0, 1.0)
        img = jnp.where(occ[..., None] > 0, img, fill)
        return img, jnp.maximum(occ, new_occ)

    img, _ = jax.lax.fori_loop(0, iters, body, (img, occ))
    return img


def nearest_fill(
    sparse_img: jnp.ndarray, occupied: jnp.ndarray, iters: int = FILL_ITERS
) -> jnp.ndarray:
    """Nearest-ish fill for semantic maps: propagate any occupied neighbor's
    exact color (max-priority flood), never blending palette colors.

    Parity intent: griddata(method="nearest") at interpolation_utils.py:46.
    """
    img = sparse_img
    occ = occupied

    def body(_, carry):
        img, occ = carry
        # Pack (occupancy, color) so a single max-scatter picks one neighbor.
        best = img
        best_occ = occ
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dx == 0 and dy == 0:
                    continue
                sh_img = jnp.roll(jnp.roll(img, dy, -3), dx, -2)
                sh_occ = jnp.roll(jnp.roll(occ, dy, -2), dx, -1)
                take = (~best_occ) & sh_occ
                best = jnp.where(take[..., None], sh_img, best)
                best_occ = best_occ | sh_occ
        return best, best_occ

    img, _ = jax.lax.fori_loop(0, iters, body, (img, occ))
    return img


def convex_hull_mask(occupied: jnp.ndarray, n_directions: int = 64) -> jnp.ndarray:
    """(..., H, W) bool: pixels inside the convex hull of occupied cells.

    Qhull Delaunay interpolation (the reference's griddata(method='linear'),
    salve/utils/interpolation_utils.py:46) only produces values inside the
    convex hull of its sites; without this mask the dilation fill paints a
    ~5px rim outside the hull that the reference leaves black (measured in
    tests/parity/test_interpolation_drift.py).

    Exact up to an outer D-gon approximation of the hull. Near-free on
    device: every hull vertex is a per-row support extreme, so the D support
    maxima reduce over (rows x 2) candidate points, and the inside test
    collapses to one x-interval per row — no convolutions, no (H,W,D)
    tensors.
    """
    batch = occupied.shape[:-2]
    H, W = occupied.shape[-2:]
    occ = occupied.reshape((-1, H, W))
    xs = jnp.arange(W, dtype=jnp.float32)
    ys = jnp.arange(H, dtype=jnp.float32)
    big = jnp.float32(1e9)
    xmin = jnp.min(jnp.where(occ, xs[None, None, :], big), axis=2)  # (B,H)
    xmax = jnp.max(jnp.where(occ, xs[None, None, :], -big), axis=2)  # (B,H)
    row_has = jnp.any(occ, axis=2)

    theta = jnp.arange(n_directions, dtype=jnp.float32) * (
        2.0 * jnp.pi / n_directions
    )
    cos, sin = jnp.cos(theta), jnp.sin(theta)  # (D,)

    # Support's max projection per direction, from the row-extreme points.
    ext_x = jnp.stack([xmin, xmax], axis=-1)  # (B,H,2)
    proj = ext_x[..., None] * cos + ys[None, :, None, None] * sin  # (B,H,2,D)
    proj = jnp.where(row_has[..., None, None], proj, -big)
    h = jnp.max(proj, axis=(1, 2))  # (B,D)

    # Constraint per row y: x*cos_d <= h_d - y*sin_d for every direction d.
    t = h[:, None, :] - ys[None, :, None] * sin  # (B,H,D)
    eps = 1e-4
    pos = cos > eps
    neg = cos < -eps
    xhi = jnp.min(jnp.where(pos, t / jnp.where(pos, cos, 1.0), big), axis=-1)
    xlo = jnp.max(jnp.where(neg, t / jnp.where(neg, cos, 1.0), -big), axis=-1)
    # Near-vertical directions constrain the row itself.
    row_ok = jnp.all(
        jnp.where(jnp.abs(cos) <= eps, t >= -eps, True), axis=-1
    )
    tol = jnp.float32(1e-3)
    # Note: rows with no direct support can still be inside the hull (the
    # vertical-direction constraints in row_ok bound the hull's y-extent).
    mask = (
        row_ok[..., None]
        & (xs[None, None, :] >= xlo[..., None] - tol)
        & (xs[None, None, :] <= xhi[..., None] + tol)
    )
    return mask.reshape(batch + (H, W))


def hallucination_mask(
    sparse_img_u8: jnp.ndarray, k: int = DEFAULT_MASK_KERNEL
) -> jnp.ndarray:
    """(..., H, W) bool mask of cells with >=1 support in a KxK neighborhood.

    Support = all three channels nonzero in the quantized sparse image
    (parity with interpolation_utils.py:95-99, including the all-channels
    quirk: a pixel with any zero channel does not count as support).
    """
    support = jnp.all(sparse_img_u8 > 0, axis=-1).astype(jnp.float32)
    counts = _box_counts(support, k)
    return counts > 0.5


def _use_pallas_fill() -> bool:
    """Route texture-map fill through the Pallas VMEM kernel on TPU backends.

    Decided at trace time; CPU (tests, virtual meshes) keeps the XLA conv
    path (Pallas interpret mode would be far slower there). Set
    SALVE_TPU_DISABLE_PALLAS=1 to force the XLA path everywhere.
    """
    import os

    if os.environ.get("SALVE_TPU_DISABLE_PALLAS"):
        return False
    return jax.default_backend() not in ("cpu",)


@functools.partial(
    jax.jit,
    static_argnames=("img_px", "meters_per_px", "is_semantics", "dedup_stride"),
)
def render_bev_images_batched(
    xyz: jnp.ndarray,
    rgb: jnp.ndarray,
    valid: jnp.ndarray,
    img_px: int = DEFAULT_BEV_IMG_PX,
    meters_per_px: float = DEFAULT_METERS_PER_PX,
    is_semantics: bool = False,
    dedup_stride: int = 0,
) -> jnp.ndarray:
    """Batched BEV texture-map render: (B,N) clouds -> (B,H,W,3) uint8.

    Mirrors salve/utils/bev_rendering_utils.py:254 (render_bev_image):
    bbox prune -> world->image Sim2 -> z-order splat -> interpolate ->
    hallucination mask -> vertical flip. Natively batched (single flat
    scatter + batched convs) — do NOT vmap this; pass the batch in.
    """
    img_h = img_w = img_px + 1
    half_m = int((img_px / 2) * meters_per_px)

    xy = xyz[..., :2]
    z = xyz[..., 2]
    inside = (
        (xy[..., 0] >= -half_m)
        & (xy[..., 0] <= half_m)
        & (xy[..., 1] >= -half_m)
        & (xy[..., 1] <= half_m)
    )
    valid = valid & inside

    # p_img = (p_world + [half, half]) / meters_per_px, rounded.
    xy_img = jnp.round((xy + half_m) / meters_per_px).astype(jnp.int32)

    rgb255 = rgb * 255.0
    # quantize_u8: production colors are u8-JPEG-derived, so the packed
    # gather is exact (and 1.65x the float-gather splat on chip).
    sparse, occupied = splat_zorder_batched(
        xy_img, z, rgb255, valid, img_h, img_w, dedup_stride=dedup_stride,
        quantize_u8=True,
    )

    sparse_u8 = jnp.clip(jnp.round(sparse), 0, 255).astype(jnp.uint8)

    if is_semantics:
        # Reference nearest-neighbor griddata fills the whole grid before
        # masking (no hull restriction), so none is applied here either.
        interp = nearest_fill(sparse, occupied)
        mask = hallucination_mask(sparse_u8)
        out = jnp.where(mask[..., None], interp, 0.0)
    else:
        # Delaunay-linear griddata only fills inside the sites' convex hull;
        # restrict the dilation fill the same way (drift measured in
        # tests/parity/test_interpolation_drift.py).
        hull = convex_hull_mask(occupied)
        # The Pallas fill keeps ~10 padded f32 planes per program in VMEM
        # (5 block operands, double-buffered); grids past ~500k px exceed
        # the 16 MB budget (the 1001px warp banks, ops/warp.py, OOM'd), so
        # large grids take the XLA conv path.
        hp, wp = -(-img_h // 8) * 8, -(-img_w // 128) * 128
        fits_vmem = hp * wp * 4 * 10 <= 14 * 1024 * 1024
        if _use_pallas_fill() and fits_vmem:
            # VMEM-resident fused fill+mask kernel: 6.3x the XLA conv path
            # on TPU, bit-identical output. Any batch size: the batch rides
            # the kernel grid up to 32 and lax.map chunks beyond (the former
            # vmap composition stacked scoped VMEM and OOM'd past 32).
            from salve_tpu.ops.pallas_fill import fill_and_mask_any_batch

            support = jnp.all(sparse_u8 > 0, axis=-1)
            out = fill_and_mask_any_batch(sparse, occupied, support)
            out = jnp.where(hull[..., None], out, 0.0)
        else:
            interp = fill_holes(sparse, occupied)
            mask = hallucination_mask(sparse_u8)
            out = jnp.where((mask & hull)[..., None], interp, 0.0)

    out = jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)
    return out[:, ::-1]  # flipud, as in the reference


def render_bev_image(
    xyz: jnp.ndarray,
    rgb: jnp.ndarray,
    valid: jnp.ndarray,
    img_px: int = DEFAULT_BEV_IMG_PX,
    meters_per_px: float = DEFAULT_METERS_PER_PX,
    is_semantics: bool = False,
) -> jnp.ndarray:
    """Single-cloud render ((N,...) -> (H,W,3) uint8); see the batched form."""
    return render_bev_images_batched(
        xyz[None], rgb[None], valid[None], img_px, meters_per_px, is_semantics
    )[0]


def make_bevimg_Sim2_world(
    img_px: int = DEFAULT_BEV_IMG_PX, meters_per_px: float = DEFAULT_METERS_PER_PX
) -> Tuple[np.ndarray, np.ndarray, float]:
    """(R, t, s) of the world->image Sim(2) (parity: bevparams.py:70-79)."""
    half_m = int((img_px / 2) * meters_per_px)
    return np.eye(2), np.array([half_m, half_m], dtype=np.float64), 1.0 / meters_per_px
