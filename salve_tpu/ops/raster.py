"""Polygon fill and thick anti-aliased polyline rasterization in XLA.

TPU-native replacement for the reference's OpenCV rasterization
(salve/utils/bev_rendering_utils.py:159-251: cv2.fillPoly for room masks,
cv2.line with LINE_AA for W/D/O polylines). Instead of scanline loops we
evaluate per-pixel coverage tests with broadcasting:

  * polygon fill: even-odd crossing number of each pixel center against all
    E edges at once — an (H*W, E) masked reduction on the VPU.
  * thick polyline: distance from each pixel center to each segment; a
    1-px smoothstep on (half_thickness - dist) gives anti-aliased edges
    comparable to cv2.LINE_AA.

Vertex arrays are padded to a static size with a validity mask so one
compiled program serves every room layout on the floor.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _pixel_centers(img_h: int, img_w: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    ys = jax.lax.broadcasted_iota(jnp.float32, (img_h, img_w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (img_h, img_w), 1)
    return xs, ys


@functools.partial(jax.jit, static_argnames=("img_h", "img_w"))
def polygon_mask(
    verts_xy: jnp.ndarray,
    num_verts: jnp.ndarray,
    img_h: int,
    img_w: int,
) -> jnp.ndarray:
    """Even-odd rasterization of a closed polygon into an (H,W) bool mask.

    Args:
        verts_xy: (V,2) float image-space vertices, padded; vertex i connects
            to vertex (i+1) % num_verts.
        num_verts: scalar int — number of real vertices (<= V).
        img_h, img_w: raster dimensions.
    """
    V = verts_xy.shape[0]
    idx = jnp.arange(V)
    nxt = jnp.where(idx + 1 >= num_verts, 0, idx + 1)
    edge_valid = idx < num_verts

    p0 = verts_xy  # (V,2)
    p1 = verts_xy[nxt]

    xs, ys = _pixel_centers(img_h, img_w)  # (H,W)

    x0, y0 = p0[:, 0], p0[:, 1]  # (V,)
    x1, y1 = p1[:, 0], p1[:, 1]

    # Crossing-number test, broadcast (H,W,1) x (V,) -> (H,W,V).
    ys_b = ys[..., None]
    xs_b = xs[..., None]
    cond = (y0 > ys_b) != (y1 > ys_b)
    # x-coordinate of edge/scanline intersection.
    denom = jnp.where(jnp.abs(y1 - y0) < 1e-12, 1e-12, y1 - y0)
    x_int = x0 + (ys_b - y0) * (x1 - x0) / denom
    crossings = jnp.sum(cond & (xs_b < x_int) & edge_valid, axis=-1)
    return (crossings % 2) == 1


@functools.partial(jax.jit, static_argnames=("img_h", "img_w"))
def polyline_coverage(
    verts_xy: jnp.ndarray,
    num_verts: jnp.ndarray,
    thickness: jnp.ndarray,
    img_h: int,
    img_w: int,
) -> jnp.ndarray:
    """Anti-aliased coverage in [0,1] of a thick open polyline.

    Coverage is a linear ramp in distance-to-nearest-segment calibrated to
    cv2.line(LINE_AA)'s measured radial profile (the oracle the reference's
    checkpoints trained on, bev_rendering_utils.py:251): cv2 reaches 50%
    intensity at thickness/2 + 0.65 px with a ~1.25 px transition band,
    independent of line angle (measured in tests/parity/
    test_raster_cv2_drift.py; cv2's thick AA lines render ~1.3 px wider
    than nominal). Round caps via the endpoint-clamped segment distance.

    Args:
        verts_xy: (V,2) float image-space vertices, padded.
        num_verts: scalar int — number of real vertices; segments are
            (i, i+1) for i < num_verts - 1.
        thickness: scalar float line thickness in pixels.
    """
    V = verts_xy.shape[0]
    idx = jnp.arange(V)
    seg_valid = idx < (num_verts - 1)
    nxt = jnp.minimum(idx + 1, V - 1)

    a = verts_xy  # (V,2) segment starts
    b = verts_xy[nxt]

    xs, ys = _pixel_centers(img_h, img_w)
    p = jnp.stack([xs, ys], axis=-1)[:, :, None, :]  # (H,W,1,2)

    ab = (b - a)[None, None]  # (1,1,V,2)
    ap = p - a[None, None]
    ab_len2 = jnp.sum(ab * ab, axis=-1)
    t = jnp.clip(jnp.sum(ap * ab, axis=-1) / jnp.maximum(ab_len2, 1e-12), 0.0, 1.0)
    closest = a[None, None] + t[..., None] * ab
    dist = jnp.linalg.norm(p - closest, axis=-1)  # (H,W,V)

    dist = jnp.where(seg_valid[None, None, :], dist, jnp.inf)
    min_dist = jnp.min(dist, axis=-1)

    half_width = thickness / 2.0 + 0.65  # cv2 50%-intensity radius
    ramp = 1.25  # cv2 transition band width (px)
    cov = jnp.clip((half_width + ramp / 2.0 - min_dist) / ramp, 0.0, 1.0)
    return cov


def paint_rgb(
    img: jnp.ndarray, coverage: jnp.ndarray, color: jnp.ndarray
) -> jnp.ndarray:
    """Alpha-composite a color onto an (H,W,3) float image with (H,W) coverage."""
    return img * (1.0 - coverage[..., None]) + color[None, None, :] * coverage[..., None]
