"""Render pairs of BEV texture maps in a common coordinate frame.

Parity: salve/utils/bev_rendering_utils.py:417 (render_bev_pair) and :525
(generate_texture_maps_for_pair), redesigned so that the per-pair pixel
pipeline — backprojection, frame alignment, z-order splat, interpolation,
masking — is one jitted XLA program, vmappable over a batch of hypothesis
pairs. The reference parallelized this with one multiprocessing worker per
building; here a batch of pairs is one device launch.
"""

from __future__ import annotations

import functools
from pathlib import Path
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from salve_tpu.geometry.sim2 import Sim2
from salve_tpu.ops import backproject as bp
from salve_tpu.ops import bev as bev_ops

# HoHoNet's pano center faces -x; ZInD's faces +y: fix with a -90 deg rotation
# (bev_rendering_utils.py:443). HoHoNet metric scale vs ZInD world-normalized
# scale differs by 1.5 (bev_rendering_utils.py:448).
HOHO_S_ZIND_SCALE_FACTOR = 1.5
_R_FIX = np.array([[0.0, 1.0], [-1.0, 0.0]], dtype=np.float32)  # rotmat2d(-90)

PANO_H, PANO_W = 512, 1024


class BEVRenderConfig(NamedTuple):
    """Rendering hyperparameters (parity: BEVParams + SimpleNamespace args)."""

    img_px: int = bev_ops.DEFAULT_BEV_IMG_PX
    meters_per_px: float = bev_ops.DEFAULT_METERS_PER_PX
    crop_ratio: float = bp.DEFAULT_CROP_RATIO
    is_semantics: bool = False


def _z_range_for_surface(surface_type: str) -> Tuple[float, float]:
    if surface_type == "floor":
        return (-np.inf, -1.0)
    if surface_type == "ceiling":
        return (0.5, np.inf)
    raise ValueError(f"Unknown surface type: {surface_type}")


@functools.partial(jax.jit, static_argnames=("z_range", "cfg"))
def render_identity_batched(
    depths: jnp.ndarray,
    rgbs: jnp.ndarray,
    z_range: Tuple[float, float],
    cfg: "BEVRenderConfig",
) -> jnp.ndarray:
    """Render (B,H,W) panos in their OWN frames -> (B,h,w,3) uint8 BEVs.

    Identical to the img2 half of `_render_pairs_batched` (the un-transformed
    pano): identity renders are hypothesis-independent, so callers scoring
    many hypotheses per pano (pipeline/fused_inference.py) render each pano
    once here instead of once per hypothesis.
    """
    window = bp.surface_row_window(depths.shape[1], z_range, cfg.crop_ratio)
    bp_batched = jax.vmap(bp.backproject_depth, in_axes=(0, 0, None, None, None))
    xyz, c, v = bp_batched(depths, rgbs, z_range, cfg.crop_ratio, window)
    xy = xyz[..., :2] @ _R_FIX.T
    xyz = jnp.concatenate([xy, xyz[..., 2:3]], axis=-1)
    return bev_ops.render_bev_images_batched(
        xyz, c, v, cfg.img_px, cfg.meters_per_px, cfg.is_semantics,
        dedup_stride=depths.shape[2],
    )


@functools.partial(jax.jit, static_argnames=("z_range", "cfg"))
def render_transformed_batched(
    depths: jnp.ndarray,
    rgbs: jnp.ndarray,
    i2Ri1: jnp.ndarray,
    i2ti1: jnp.ndarray,
    z_range: Tuple[float, float],
    cfg: "BEVRenderConfig",
) -> jnp.ndarray:
    """Render (B,H,W) panos moved into the partner frame -> (B,h,w,3) uint8.

    The img1 half of `_render_pairs_batched`: pano 1's cloud carried through
    the relative-pose hypothesis before splatting.
    """
    window = bp.surface_row_window(depths.shape[1], z_range, cfg.crop_ratio)
    bp_batched = jax.vmap(bp.backproject_depth, in_axes=(0, 0, None, None, None))
    xyz, c, v = bp_batched(depths, rgbs, z_range, cfg.crop_ratio, window)
    xy = xyz[..., :2] @ _R_FIX.T
    xy = jnp.einsum("bij,bnj->bni", i2Ri1, xy) + (
        i2ti1 * HOHO_S_ZIND_SCALE_FACTOR
    )[:, None, :]
    xyz = jnp.concatenate([xy, xyz[..., 2:3]], axis=-1)
    return bev_ops.render_bev_images_batched(
        xyz, c, v, cfg.img_px, cfg.meters_per_px, cfg.is_semantics,
        dedup_stride=depths.shape[2],
    )


def _render_pair_device(
    depth1: jnp.ndarray,
    rgb1: jnp.ndarray,
    depth2: jnp.ndarray,
    rgb2: jnp.ndarray,
    i2Ri1: jnp.ndarray,
    i2ti1: jnp.ndarray,
    z_range: Tuple[float, float],
    cfg: BEVRenderConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single-pair BEV render; all-device, static shapes."""
    img1, img2 = _render_pairs_batched(
        depth1[None], rgb1[None], depth2[None], rgb2[None],
        i2Ri1[None], i2ti1[None], z_range, cfg,
    )
    return img1[0], img2[0]


@functools.partial(jax.jit, static_argnames=("z_range", "cfg"))
def _render_pairs_batched(
    depth1: jnp.ndarray,
    rgb1: jnp.ndarray,
    depth2: jnp.ndarray,
    rgb2: jnp.ndarray,
    i2Ri1: jnp.ndarray,
    i2ti1: jnp.ndarray,
    z_range: Tuple[float, float],
    cfg: BEVRenderConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Natively batched pair render: (B,H,W) depths -> (B,h,w,3) uint8 x2.

    Both panos of every pair fold into ONE (2B,N) render batch (single flat
    scatter + batched convs) — a vmapped per-pair render would serialize the
    z-order scatter per image.
    """
    b = depth1.shape[0]
    # Static row window: floor points only exist below the horizon, ceiling
    # points above — halves the z-order scatter work exactly.
    window = bp.surface_row_window(depth1.shape[1], z_range, cfg.crop_ratio)
    bp_batched = jax.vmap(bp.backproject_depth, in_axes=(0, 0, None, None, None))
    xyz1, c1, v1 = bp_batched(depth1, rgb1, z_range, cfg.crop_ratio, window)
    xyz2, c2, v2 = bp_batched(depth2, rgb2, z_range, cfg.crop_ratio, window)

    # HoHoNet -> ZInD frame fix for both clouds.
    xy1 = xyz1[..., :2] @ _R_FIX.T
    xy2 = xyz2[..., :2] @ _R_FIX.T

    # Move cloud 1 into pano 2's frame (translation carries the 1.5x scale).
    xy1 = jnp.einsum("bij,bnj->bni", i2Ri1, xy1) + (
        i2ti1 * HOHO_S_ZIND_SCALE_FACTOR
    )[:, None, :]

    xyz1 = jnp.concatenate([xy1, xyz1[..., 2:3]], axis=-1)
    xyz2 = jnp.concatenate([xy2, xyz2[..., 2:3]], axis=-1)

    imgs = bev_ops.render_bev_images_batched(
        jnp.concatenate([xyz1, xyz2], axis=0),
        jnp.concatenate([c1, c2], axis=0),
        jnp.concatenate([v1, v2], axis=0),
        cfg.img_px,
        cfg.meters_per_px,
        cfg.is_semantics,
        dedup_stride=depth1.shape[2],
    )
    return imgs[:b], imgs[b:]


def render_bev_pair(
    depth1: np.ndarray,
    rgb1: np.ndarray,
    depth2: np.ndarray,
    rgb2: np.ndarray,
    i2Ti1: Sim2,
    surface_type: str,
    cfg: BEVRenderConfig = BEVRenderConfig(),
) -> Tuple[np.ndarray, np.ndarray]:
    """Render one hypothesis pair. Host-friendly wrapper over the device path.

    Args:
        depth1/depth2: (512,1024) uint16 depth maps in millimeters.
        rgb1/rgb2: (512,1024,3) float RGB in [0,1] (pre-resized).
        i2Ti1: relative pose hypothesis (p_i2 = i2Ti1 * p_i1).
        surface_type: "floor" or "ceiling".

    Returns:
        (img1, img2): (H,W,3) uint8 texture maps; img1 rendered in i2's frame.
    """
    z_range = _z_range_for_surface(surface_type)
    img1, img2 = _render_pair_device(
        jnp.asarray(depth1),
        jnp.asarray(rgb1),
        jnp.asarray(depth2),
        jnp.asarray(rgb2),
        jnp.asarray(i2Ti1.rotation.astype(np.float32)),
        jnp.asarray(i2Ti1.translation.astype(np.float32)),
        z_range,
        cfg,
    )
    return np.asarray(img1), np.asarray(img2)


def render_bev_pairs_batch_device(
    depths,
    rgbs,
    pair_indices: np.ndarray,
    rotations: np.ndarray,
    translations: np.ndarray,
    surface_type: str,
    cfg: BEVRenderConfig = BEVRenderConfig(),
):
    """Device-side batch render: returns (imgs1, imgs2) as DEVICE arrays.

    Dispatch is asynchronous — callers can overlap the device->host fetch of
    batch k with the compute of batch k+1 (see dataset_renderer).
    `depths`/`rgbs` may be pre-staged jnp arrays (preferred: upload once).
    """
    z_range = _z_range_for_surface(surface_type)
    d = jnp.asarray(depths)
    c = jnp.asarray(rgbs)
    i1 = jnp.asarray(pair_indices[:, 0])
    i2 = jnp.asarray(pair_indices[:, 1])
    return _render_pairs_batched(
        d[i1],
        c[i1],
        d[i2],
        c[i2],
        jnp.asarray(rotations.astype(np.float32)),
        jnp.asarray(translations.astype(np.float32)),
        z_range,
        cfg,
    )


def render_bev_pairs_batch(
    depths: np.ndarray,
    rgbs: np.ndarray,
    pair_indices: np.ndarray,
    rotations: np.ndarray,
    translations: np.ndarray,
    surface_type: str,
    cfg: BEVRenderConfig = BEVRenderConfig(),
) -> Tuple[np.ndarray, np.ndarray]:
    """Render a batch of hypothesis pairs against a shared pano bank.

    Args:
        depths: (P,512,1024) depth bank for the P distinct panos involved.
        rgbs: (P,512,1024,3) float RGB bank.
        pair_indices: (B,2) int — (i1, i2) indices into the bank per pair.
        rotations: (B,2,2) relative rotations i2Ri1.
        translations: (B,2) relative translations i2ti1.
        surface_type: "floor" or "ceiling".

    Returns:
        (imgs1, imgs2): (B,H,W,3) uint8 texture maps.
    """
    imgs1, imgs2 = render_bev_pairs_batch_device(
        depths, rgbs, pair_indices, rotations, translations, surface_type, cfg
    )
    return np.asarray(imgs1), np.asarray(imgs2)


# ---------------------------------------------------------------------------
# Host-side IO helpers (filename grammar parity with the reference).
# ---------------------------------------------------------------------------


def bev_fname_from_img_fpath(
    pair_idx: int, pair_uuid: str, surface_type: str, img_fpath: str, modality: str = "rgb"
) -> str:
    """BEV texture-map filename (parity: bev_rendering_utils.py:582-589).

    Stage C/D parse this grammar back (edge_classification.py:143-176), so
    it must match byte-for-byte.
    """
    fname_stem = Path(img_fpath).stem
    return f"pair_{pair_idx}___{pair_uuid}_{surface_type}_{modality}_{fname_stem}.jpg"


def load_pano_rgb(img_fpath: str) -> np.ndarray:
    """Load a pano JPG and bilinearly resize (1024,2048)->(512,1024), in [0,1]."""
    import imageio.v2 as imageio

    rgb = imageio.imread(img_fpath)
    if rgb.ndim == 2:
        rgb = np.stack([rgb] * 3, axis=-1)
    rgb = np.asarray(
        bp.resize_pano_bilinear(jnp.asarray(rgb), PANO_H, PANO_W)
    )
    return rgb / 255.0


def load_depth_mm(depth_fpath: str) -> np.ndarray:
    """Load a cached u16 depth PNG (millimeters), shape (512,1024)."""
    import imageio.v2 as imageio

    return np.asarray(imageio.imread(depth_fpath))
