"""Reference-API wrappers over the device interpolation kernels.

Parity: salve/utils/interpolation_utils.py — same function names and
semantics, with scipy/Qhull griddata and torch conv2d replaced by the
jitted kernels in salve_tpu.ops.bev. Kept host-signature-compatible for
drop-in use; new code should call ops.bev directly with batched arrays.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from salve_tpu.ops import bev as bev_ops

DEFAULT_KERNEL_SZ = bev_ops.DEFAULT_MASK_KERNEL
MIN_REQUIRED_POINTS_SIMPLEX = 4


def is_collinear(points: np.ndarray) -> bool:
    """Cheap degenerate-input check (parity :57): all x or all y equal."""
    if np.allclose(points[:, 0], points[0, 0]):
        return True
    if np.allclose(points[:, 1], points[0, 1]):
        return True
    return False


def interp_dense_grid_from_sparse(
    bev_img: np.ndarray,
    points: np.ndarray,
    rgb_values: np.ndarray,
    grid_h: int,
    grid_w: int,
    is_semantics: bool,
) -> np.ndarray:
    """Populate a dense (grid_h, grid_w, 3) image from sparse samples.

    Parity: interpolation_utils.py:21 — the reference used Qhull Delaunay
    linear interpolation; here the fixed-iteration dilation fill (or
    nearest-propagation for semantics) runs on device. Like the reference,
    returns the input grid unchanged for degenerate inputs.
    """
    if points.shape[0] < MIN_REQUIRED_POINTS_SIMPLEX:
        return bev_img
    if is_collinear(points):
        return bev_img

    xy = np.round(points[:, :2]).astype(np.int64)
    keep = (xy[:, 0] >= 0) & (xy[:, 0] < grid_w) & (xy[:, 1] >= 0) & (xy[:, 1] < grid_h)
    xy, vals = xy[keep], np.asarray(rgb_values, dtype=np.float32)[keep]

    sparse = np.zeros((grid_h, grid_w, 3), dtype=np.float32)
    occ = np.zeros((grid_h, grid_w), dtype=bool)
    sparse[xy[:, 1], xy[:, 0]] = vals
    occ[xy[:, 1], xy[:, 0]] = True

    if is_semantics:
        out = bev_ops.nearest_fill(jnp.asarray(sparse), jnp.asarray(occ))
    else:
        out = bev_ops.fill_holes(jnp.asarray(sparse), jnp.asarray(occ))
    return np.asarray(out).astype(bev_img.dtype)


def remove_hallucinated_content(
    sparse_bev_img: np.ndarray, interp_bev_img: np.ndarray, K: int = DEFAULT_KERNEL_SZ
) -> np.ndarray:
    """Zero interpolated cells with no sparse support in a KxK window.

    Parity: interpolation_utils.py:74, including the all-channels-nonzero
    support rule; torch conv2d becomes the lax box-count kernel.
    """
    mask = np.asarray(
        bev_ops.hallucination_mask(jnp.asarray(sparse_bev_img.astype(np.uint8)), k=K)
    )
    return (mask[..., None] * interp_bev_img).astype(np.uint8)
