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


@functools.partial(jax.jit, static_argnames=("crop_ratio",))
def backproject_depth(
    depth_mm: jnp.ndarray,
    rgb: jnp.ndarray,
    z_range: Tuple[float, float],
    crop_ratio: float = DEFAULT_CROP_RATIO,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Backproject an equirect depth map into a colored point cloud.

    Args:
        depth_mm: (H,W) float or uint16 depth in millimeters.
        rgb: (H,W,3) float RGB in [0,1].
        z_range: (zmin, zmax] — points outside are masked invalid.
        crop_ratio: fraction of rows removed from pano top and bottom.

    Returns:
        xyz: (N,3) float32 point coordinates (N = (H - 2*crop)*W).
        rgb: (N,3) float32 colors in [0,1].
        valid: (N,) bool mask (True where z in (zmin, zmax]).
    """
    H, W = depth_mm.shape
    depth_m = depth_mm.astype(jnp.float32) * DEPTH_SCALE

    rays = get_uni_sphere_xyz(H, W, xp=jnp)  # (H,W,3)
    xyz = depth_m[..., None] * rays

    crop = int(H * crop_ratio)
    if crop > 0:
        xyz = xyz[crop:-crop]
        rgb = rgb[crop:-crop]

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
