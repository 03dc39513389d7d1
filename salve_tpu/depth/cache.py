"""Depth-map cache with the reference's on-disk contract.

Parity: salve/utils/hohonet_inference.py (infer_depth_if_nonexistent) and
salve/utils/infer_depth.py — depth maps are u16 PNGs in millimeters at
(512, 1024), cached per building; existence check makes every stage
idempotent/resumable.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Callable, Optional

import numpy as np

# Registered producer: fn(rgb (512,1024,3) float [0,1]) -> depth_m (512,1024) float.
_DEPTH_MODEL: Optional[Callable[[np.ndarray], np.ndarray]] = None

PANO_H, PANO_W = 512, 1024


def register_depth_model(fn: Callable[[np.ndarray], np.ndarray]) -> None:
    """Register the depth producer used on cache misses."""
    global _DEPTH_MODEL
    _DEPTH_MODEL = fn


def depth_fpath_for_pano(depth_save_root: str, building_id: str, img_fpath: str) -> str:
    """Cache path: {depth_save_root}/{building_id}/{stem}.depth.png."""
    return f"{depth_save_root}/{building_id}/{Path(img_fpath).stem}.depth.png"


def infer_depth_if_nonexistent(
    depth_save_root: str, building_id: str, img_fpath: str
) -> str:
    """Ensure a cached depth map exists for this pano; return its path.

    On a cache miss, runs the registered depth model (resized pano in,
    u16 mm PNG out). Raises if no model is registered and no cache exists.
    """
    depth_fpath = depth_fpath_for_pano(depth_save_root, building_id, img_fpath)
    if Path(depth_fpath).exists():
        return depth_fpath

    if _DEPTH_MODEL is None:
        raise FileNotFoundError(
            f"No cached depth map at {depth_fpath} and no depth model registered. "
            "Pre-compute depth PNGs (u16 mm, 512x1024) or call "
            "salve_tpu.depth.register_depth_model()."
        )

    import imageio.v2 as imageio

    from salve_tpu.rendering.bev_pair import load_pano_rgb

    rgb = load_pano_rgb(img_fpath)
    depth_m = np.asarray(_DEPTH_MODEL(rgb))
    if depth_m.shape != (PANO_H, PANO_W):
        raise ValueError(f"Depth model returned shape {depth_m.shape}")
    depth_mm = np.clip(np.round(depth_m * 1000.0), 0, 65535).astype(np.uint16)
    os.makedirs(os.path.dirname(depth_fpath), exist_ok=True)
    imageio.imwrite(depth_fpath, depth_mm)
    return depth_fpath
