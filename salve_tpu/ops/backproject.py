"""Equirectangular depth-map backprojection to colored point clouds.

Parity: salve/utils/bev_rendering_utils.py:347 (get_xyzrgb_from_depth) in
the reference, which ran numpy on the host per pano. Here the whole chain
(ray grid x depth, crop, z-range mask) is a single jitted function with
static shapes: cropping is a row slice (static), the z-range cut is a
validity mask instead of boolean indexing, so the output is vmappable
across panoramas and pairs.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from salve_tpu.geometry.pano_projection import get_uni_sphere_xyz

# Reference crops 80/512 rows from pano top and bottom (too-noisy depth).
DEFAULT_CROP_RATIO = 80.0 / 512.0
# Depth PNGs store millimeters as uint16; scale to meters.
DEPTH_SCALE = 0.001

# z-range crops per rendered surface (salve/utils/bev_rendering_utils.py:560-566):
# floor keeps >=1m below camera; ceiling keeps >=0.5m above.
FLOOR_Z_RANGE = (-jnp.inf, -1.0)
CEILING_Z_RANGE = (0.5, jnp.inf)


def surface_row_window(H: int, z_range: Tuple[float, float], crop_ratio: float) -> Tuple[int, int]:
    """Static pano-row window that can contain points with z in `z_range`.

    Equirect rows above the horizon (v < H/2) have strictly positive ray z,
    rows below strictly negative — so a floor surface (zmax <= 0) can only
    come from the lower half and a ceiling surface (zmin >= 0) from the
    upper half. Intersected with the noise crop. Restricting the
    backprojection to this window halves the z-order scatter work exactly
    (excluded rows could never pass the z-range mask).
    """
    crop = int(H * crop_ratio)
    r0, r1 = crop, H - crop
    zmin, zmax = z_range
    if zmax <= 0:  # floor-like: rays must point down
        r0 = max(r0, H // 2)
    if zmin >= 0:  # ceiling-like: rays must point up
        r1 = min(r1, H // 2)
    return r0, r1


@functools.partial(jax.jit, static_argnames=("crop_ratio", "row_window"))
def backproject_depth(
    depth_mm: jnp.ndarray,
    rgb: jnp.ndarray,
    z_range: Tuple[float, float],
    crop_ratio: float = DEFAULT_CROP_RATIO,
    row_window: Tuple[int, int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Backproject an equirect depth map into a colored point cloud.

    Args:
        depth_mm: (H,W) float or uint16 depth in millimeters.
        rgb: (H,W,3) float RGB in [0,1].
        z_range: (zmin, zmax] — points outside are masked invalid.
        crop_ratio: fraction of rows removed from pano top and bottom.
        row_window: optional static (r0, r1) row slice replacing the crop
            (see surface_row_window); rays keep full-pano v angles.

    Returns:
        xyz: (N,3) float32 point coordinates (N = (r1-r0)*W).
        rgb: (N,3) float32 colors in [0,1].
        valid: (N,) bool mask (True where z in (zmin, zmax]).
    """
    H, W = depth_mm.shape
    if row_window is None:
        crop = int(H * crop_ratio)
        row_window = (crop, H - crop)
    r0, r1 = row_window

    depth_m = depth_mm[r0:r1].astype(jnp.float32) * DEPTH_SCALE
    rays = get_uni_sphere_xyz(H, W, xp=jnp)[r0:r1]  # full-pano v angles
    xyz = depth_m[..., None] * rays
    rgb = rgb[r0:r1]

    xyz = xyz.reshape(-1, 3)
    rgb = rgb.reshape(-1, 3).astype(jnp.float32)

    z = xyz[:, 2]
    valid = (z > z_range[0]) & (z <= z_range[1])
    return xyz, rgb, valid


def resize_pano_nearest(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Nearest-neighbor resize (used for semantic label maps)."""
    return jax.image.resize(img, (out_h, out_w) + img.shape[2:], method="nearest")


def resize_pano_bilinear(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear resize of an RGB pano, e.g. (1024,2048) -> (512,1024).

    Parity: cv2.resize(..., INTER_LINEAR) at bev_rendering_utils.py:375.
    """
    return jax.image.resize(
        img.astype(jnp.float32), (out_h, out_w) + img.shape[2:], method="linear"
    )
