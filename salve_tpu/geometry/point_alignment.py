"""Closed-form point-set registration: SE(2) and Sim(3) fits, batched in JAX.

These replace the reference's GTSAM C++ calls:
  - salve/utils/se2_estimation.py:36  (gtsam.Pose2.Align)
  - salve/utils/sim3_estimation.py:31 (gtsam.Similarity3.Align)

Both solvers are closed-form least squares over corresponding point pairs,
expressed as a handful of reductions + a 3x3 SVD, so they vmap cleanly over
hundreds of thousands of candidate W/D/O pairings per floor — this is the
Stage-A hot loop that the reference runs one C++ call at a time.

Math:
  SE(2):  theta = atan2(Σ cross(db, da), Σ dot(db, da)) over centered pairs,
          t = ca - R cb.  (Same normal equations GTSAM's Pose2::Align solves.)
  Sim(3): R = argmax tr(R Σ db da^T) via SVD projection onto SO(3),
          s = Σ da·(R db) / Σ ||db||²,  t = ca/s - R cb
          (convention p_a = s (R p_b + t), matching Similarity3::Align).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from salve_tpu.geometry.rotations import rotmat2d, rotmat2theta_deg
from salve_tpu.geometry.sim2 import Sim2


def fit_se2(
    pts_a: jnp.ndarray, pts_b: jnp.ndarray, weights: Optional[jnp.ndarray] = None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Least-squares SE(2) fit aTb such that pts_a ≈ R @ pts_b + t.

    Args:
        pts_a: (..., N, 2) target points.
        pts_b: (..., N, 2) source points.
        weights: optional (..., N) per-pair weights (also serve as masks).

    Returns:
        R: (..., 2, 2) rotation, t: (..., 2) translation.
    """
    if weights is None:
        weights = jnp.ones(pts_a.shape[:-1], dtype=pts_a.dtype)
    w = weights[..., None]
    wsum = jnp.sum(weights, axis=-1, keepdims=True)
    ca = jnp.sum(pts_a * w, axis=-2) / wsum
    cb = jnp.sum(pts_b * w, axis=-2) / wsum
    da = pts_a - ca[..., None, :]
    db = pts_b - cb[..., None, :]
    cos_term = jnp.sum(weights * jnp.sum(db * da, axis=-1), axis=-1)
    sin_term = jnp.sum(
        weights * (db[..., 0] * da[..., 1] - db[..., 1] * da[..., 0]), axis=-1
    )
    theta = jnp.arctan2(sin_term, cos_term)
    c, s = jnp.cos(theta), jnp.sin(theta)
    R = jnp.stack(
        [jnp.stack([c, -s], axis=-1), jnp.stack([s, c], axis=-1)], axis=-2
    )
    t = ca - jnp.einsum("...ij,...j->...i", R, cb)
    return R, t


def fit_sim3(
    pts_a: jnp.ndarray, pts_b: jnp.ndarray, weights: Optional[jnp.ndarray] = None
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Least-squares Sim(3) fit aSb with convention pts_a ≈ s * (R @ pts_b + t).

    Args:
        pts_a: (..., N, 3) target points.
        pts_b: (..., N, 3) source points.
        weights: optional (..., N) weights/masks.

    Returns:
        R: (..., 3, 3), t: (..., 3), s: (...,) scale.
    """
    if weights is None:
        weights = jnp.ones(pts_a.shape[:-1], dtype=pts_a.dtype)
    w = weights[..., None]
    wsum = jnp.sum(weights, axis=-1, keepdims=True)
    ca = jnp.sum(pts_a * w, axis=-2) / wsum
    cb = jnp.sum(pts_b * w, axis=-2) / wsum
    da = (pts_a - ca[..., None, :]) * w
    db = pts_b - cb[..., None, :]
    # Cross-covariance M = Σ w da db^T; R = proj_SO(3)(M).
    # All matmuls at HIGHEST precision: these are tiny matrices on the VPU, and
    # TPU's default bf16 matmul precision would corrupt the orthonormality.
    hp = jax.lax.Precision.HIGHEST
    M = jnp.einsum("...ni,...nj->...ij", da, db, precision=hp)
    U, _, Vt = jnp.linalg.svd(M)
    det = jnp.linalg.det(jnp.matmul(U, Vt, precision=hp))
    D = jnp.zeros_like(M).at[..., 0, 0].set(1.0).at[..., 1, 1].set(1.0).at[..., 2, 2].set(det)
    R = jnp.matmul(jnp.matmul(U, D, precision=hp), Vt, precision=hp)
    Rdb = jnp.einsum("...ij,...nj->...ni", R, db, precision=hp)
    num = jnp.sum(weights * jnp.sum((pts_a - ca[..., None, :]) * Rdb, axis=-1), axis=-1)
    den = jnp.sum(weights * jnp.sum(db * db, axis=-1), axis=-1)
    s = num / den
    t = ca / s[..., None] - jnp.einsum("...ij,...j->...i", R, cb)
    return R, t, s


# -- host-side wrappers (reference-API parity) --------------------------------

def align_points_SE2(
    pts_a: np.ndarray, pts_b: np.ndarray
) -> Tuple[Optional[Sim2], Optional[np.ndarray]]:
    """Fit SE(2) aTb between (N,2) correspondences; returns (Sim2 with s=1, aligned b).

    Parity: salve/utils/se2_estimation.py:11.
    """
    pts_a = np.asarray(pts_a, dtype=np.float64)
    pts_b = np.asarray(pts_b, dtype=np.float64)
    n = pts_a.shape[0]
    if n != pts_b.shape[0]:
        raise RuntimeError("Point clouds must have matching length.")
    if n < 2:
        return None, None
    if pts_a.shape[1] != 2 or pts_b.shape[1] != 2:
        raise RuntimeError(f"Input point clouds were of shape {pts_a.shape}, but should have been (N,2)")
    R, t = _fit_se2_np(pts_a, pts_b)
    aSb = Sim2(R=R, t=t, s=1.0)
    return aSb, pts_b @ R.T + t


def _fit_se2_np(pts_a: np.ndarray, pts_b: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """NumPy twin of fit_se2 for cheap host-side calls (no dispatch overhead)."""
    ca, cb = pts_a.mean(axis=0), pts_b.mean(axis=0)
    da, db = pts_a - ca, pts_b - cb
    cos_term = float(np.sum(db * da))
    sin_term = float(np.sum(db[:, 0] * da[:, 1] - db[:, 1] * da[:, 0]))
    theta = np.arctan2(sin_term, cos_term)
    c, s = np.cos(theta), np.sin(theta)
    R = np.array([[c, -s], [s, c]])
    return R, ca - R @ cb


def align_points_sim3(
    pts_a: np.ndarray, pts_b: np.ndarray
) -> Tuple[Optional[Sim2], np.ndarray]:
    """Fit Sim(3) between (N,3) correspondences, project to Sim(2).

    Parity: salve/utils/sim3_estimation.py:12 (including the projection of the
    3D rotation's upper-left 2x2 block and re-orthonormalization fallback).
    """
    pts_a = np.asarray(pts_a, dtype=np.float64)
    pts_b = np.asarray(pts_b, dtype=np.float64)
    if pts_a.shape != pts_b.shape:
        return None, np.zeros_like(pts_a)
    if pts_a.shape[1] != 3:
        raise RuntimeError(f"Input point clouds were of shape {pts_a.shape}, but should have been (N,3)")
    R, t, s = (np.asarray(x) for x in fit_sim3(jnp.asarray(pts_a), jnp.asarray(pts_b)))
    s = float(s)
    pts_a_ = s * (pts_b @ R.T + t)
    aSb = Sim2(R=R[:2, :2], t=t[:2], s=s)
    # The 2x2 block of a 3D rotation need not be a rotation; snap back to SO(2).
    if not np.allclose(aSb.rotation.T @ aSb.rotation, np.eye(2), atol=0.05):
        aSb = reorthonormalize_sim2(aSb)
    return aSb, pts_a_


def reorthonormalize_sim2(i2Ti1: Sim2) -> Sim2:
    """Snap a Sim(2)'s rotation back onto the SO(2) manifold via atan2 of its first column."""
    R = i2Ti1.rotation
    theta_deg = np.rad2deg(np.arctan2(R[1, 0], R[0, 0]))
    return Sim2(rotmat2d(theta_deg), i2Ti1.translation, i2Ti1.scale)


__all__ = [
    "fit_se2",
    "fit_sim3",
    "align_points_SE2",
    "align_points_sim3",
    "reorthonormalize_sim2",
    "rotmat2theta_deg",
]
