"""Sim(3) pose-graph alignment for evaluation, with batched RANSAC on device.

Replaces the reference's GTSFM/GTSAM stack (salve/utils/ransac.py:14, which
loops 1000 sequential C++ alignments) with ONE vmapped JAX solve over all
RANSAC hypotheses: each hypothesis is a row of a (num_iters, N) keep-mask and
the closed-form planar Sim(3) fit is a handful of masked reductions.

The pipeline's pose graphs are planar (rotations about +z, z=0 translation),
so the Sim(3) fit decomposes exactly into:
  theta* = circular mean of per-camera angle differences,
  s*, t* = least-squares scale/translation of camera centers given theta*.
This mirrors GTSAM Similarity3::Align(posePairs) (rotation averaging followed
by center alignment), specialized to the planar case.
"""

from __future__ import annotations

import math
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from salve_tpu.geometry.poses import Pose3, Sim3, rotation_angle_deg

DEFAULT_RANSAC_ALIGNMENT_DELETE_FRAC = 0.33


def _planar_params(poses: List[Optional[Pose3]]) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Extract (theta, center, valid) stacked arrays from an Optional[Pose3] list."""
    n = len(poses)
    thetas = np.zeros(n)
    centers = np.zeros((n, 3))
    valid = np.zeros(n, dtype=bool)
    for i, p in enumerate(poses):
        if p is None:
            continue
        thetas[i] = math.atan2(p.R[1, 0], p.R[0, 0])
        centers[i] = p.t
        valid[i] = True
    return thetas, centers, valid


def _fit_planar_sim3(
    theta_a: jnp.ndarray,
    ca: jnp.ndarray,
    theta_b: jnp.ndarray,
    cb: jnp.ndarray,
    w: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Masked closed-form planar Sim(3) fit aSb with p_a = s (R p_b + t).

    Broadcasts over leading hypothesis dims; w is the per-camera weight/mask.
    Returns (theta, t(3,), s).
    """
    wsum = jnp.sum(w, axis=-1)
    dtheta = theta_a - theta_b
    # Circular mean of angle differences.
    theta = jnp.arctan2(
        jnp.sum(w * jnp.sin(dtheta), axis=-1), jnp.sum(w * jnp.cos(dtheta), axis=-1)
    )
    c, s_ = jnp.cos(theta), jnp.sin(theta)
    zero, one = jnp.zeros_like(c), jnp.ones_like(c)
    R = jnp.stack(
        [
            jnp.stack([c, -s_, zero], axis=-1),
            jnp.stack([s_, c, zero], axis=-1),
            jnp.stack([zero, zero, one], axis=-1),
        ],
        axis=-2,
    )
    ca_cent = jnp.sum(ca * w[..., None], axis=-2) / wsum[..., None]
    cb_cent = jnp.sum(cb * w[..., None], axis=-2) / wsum[..., None]
    da = ca - ca_cent[..., None, :]
    db = cb - cb_cent[..., None, :]
    Rdb = jnp.einsum("...ij,...nj->...ni", R, db, precision=jax.lax.Precision.HIGHEST)
    num = jnp.sum(w * jnp.sum(da * Rdb, axis=-1), axis=-1)
    den = jnp.sum(w * jnp.sum(db * db, axis=-1), axis=-1)
    scale = jnp.where(den > 0, num / jnp.where(den > 0, den, 1.0), 1.0)
    # Degenerate single-point / collapsed hypotheses: fall back to scale 1.
    scale = jnp.where(jnp.abs(scale) < 1e-9, 1.0, scale)
    t = ca_cent / scale[..., None] - jnp.einsum(
        "...ij,...j->...i", R, cb_cent, precision=jax.lax.Precision.HIGHEST
    )
    return theta, t, scale


@partial(jax.jit, static_argnames=())
def _ransac_errors(
    theta_a: jnp.ndarray,
    ca: jnp.ndarray,
    theta_b: jnp.ndarray,
    cb: jnp.ndarray,
    valid: jnp.ndarray,
    keep_masks: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fit one Sim(3) per keep-mask row, score each over its KEPT subset.

    Parity: salve/utils/ransac.py:53-67 — the reference aligns the subset
    and evaluates compute_pose_errors_3d on that aligned subset (deleted
    poses are None there), so hypothesis errors exclude the deleted poses.
    Scoring over ALL poses would make a degenerate tiny-scale fit (which
    shrinks every residual) beat an outlier-free fit.

    Returns per-hypothesis (mean_rot_err_deg, mean_trans_err, theta, t, s).
    """
    w = keep_masks * valid[None, :]
    theta, t, s = _fit_planar_sim3(theta_a[None, :], ca[None, :, :], theta_b[None, :], cb[None, :, :], w)
    # Evaluate against the kept poses of each hypothesis.
    dtheta = theta_a[None, :] - theta_b[None, :] - theta[:, None]
    rot_err = jnp.abs(jnp.rad2deg(jnp.arctan2(jnp.sin(dtheta), jnp.cos(dtheta))))
    c, s_ = jnp.cos(theta), jnp.sin(theta)
    zero, one = jnp.zeros_like(c), jnp.ones_like(c)
    R = jnp.stack(
        [
            jnp.stack([c, -s_, zero], axis=-1),
            jnp.stack([s_, c, zero], axis=-1),
            jnp.stack([zero, zero, one], axis=-1),
        ],
        axis=-2,
    )
    cb_in_a = s[:, None, None] * (
        jnp.einsum("hij,nj->hni", R, cb, precision=jax.lax.Precision.HIGHEST) + t[:, None, :]
    )
    trans_err = jnp.linalg.norm(ca[None, :, :] - cb_in_a, axis=-1)
    nkept = jnp.sum(w, axis=-1)
    mean_rot = jnp.sum(rot_err * w, axis=-1) / nkept
    mean_trans = jnp.sum(trans_err * w, axis=-1) / nkept
    return mean_rot, mean_trans, theta, t, s


def align_poses_sim3_ignore_missing(
    aTi_list: List[Optional[Pose3]], bTi_list: List[Optional[Pose3]]
) -> Tuple[List[Optional[Pose3]], Sim3]:
    """Single (non-robust) Sim(3) alignment of pose graph b onto a, skipping missing poses."""
    n = min(len(aTi_list), len(bTi_list))
    theta_a, ca, va = _planar_params(aTi_list[:n])
    theta_b, cb, vb = _planar_params(bTi_list[:n])
    valid = va & vb
    if valid.sum() == 0:
        return list(bTi_list), Sim3.identity()
    theta, t, s = (
        np.asarray(x)
        for x in _fit_planar_sim3(
            jnp.asarray(theta_a), jnp.asarray(ca), jnp.asarray(theta_b), jnp.asarray(cb), jnp.asarray(valid, dtype=jnp.float32)
        )
    )
    aSb = _sim3_from_planar(float(theta), t, float(s))
    aligned = [aSb.transform_pose(bTi) if bTi is not None else None for bTi in bTi_list]
    return aligned, aSb


def _sim3_from_planar(theta: float, t: np.ndarray, s: float) -> Sim3:
    c, s_ = np.cos(theta), np.sin(theta)
    R = np.array([[c, -s_, 0.0], [s_, c, 0.0], [0.0, 0.0, 1.0]])
    return Sim3(R, np.asarray(t, dtype=np.float64), float(s))


def ransac_align_poses_sim3_ignore_missing(
    aTi_list_ref: List[Optional[Pose3]],
    bTi_list_est: List[Optional[Pose3]],
    num_iters: int = 1000,
    delete_frac: float = DEFAULT_RANSAC_ALIGNMENT_DELETE_FRAC,
    seed: int = 0,
    verbose: bool = False,
) -> Tuple[List[Optional[Pose3]], Sim3]:
    """Robust Sim(3) pose-graph alignment (parity: salve/utils/ransac.py:14).

    Each RANSAC hypothesis deletes `delete_frac` of the valid poses, fits a
    Sim(3), and is scored by mean rot/trans error over all poses. All
    `num_iters` hypotheses are fit and scored in ONE batched device call.
    The winner is chosen by the reference's sequential acceptance rule
    (a hypothesis must improve BOTH errors to be adopted).
    """
    n = min(len(aTi_list_ref), len(bTi_list_est))
    theta_a, ca, va = _planar_params(aTi_list_ref[:n])
    theta_b, cb, vb = _planar_params(bTi_list_est[:n])
    valid = va & vb

    valid_idxs = np.flatnonzero(valid)
    num_to_delete = math.ceil(delete_frac * len(valid_idxs))
    if len(valid_idxs) - num_to_delete < 2:
        return align_poses_sim3_ignore_missing(aTi_list_ref, bTi_list_est)

    rng = np.random.default_rng(seed)
    keep = np.ones((num_iters, n), dtype=np.float32)
    for it in range(num_iters):
        delete_idxs = rng.choice(valid_idxs, size=num_to_delete, replace=False)
        keep[it, delete_idxs] = 0.0

    mean_rot, mean_trans, theta, t, s = (
        np.asarray(x)
        for x in _ransac_errors(
            jnp.asarray(theta_a),
            jnp.asarray(ca),
            jnp.asarray(theta_b),
            jnp.asarray(cb),
            jnp.asarray(valid, dtype=jnp.float32),
            jnp.asarray(keep),
        )
    )

    best = None
    best_rot, best_trans = float("inf"), float("inf")
    for it in range(num_iters):
        if mean_trans[it] <= best_trans and mean_rot[it] <= best_rot:
            best, best_rot, best_trans = it, float(mean_rot[it]), float(mean_trans[it])
            if verbose:
                print(f"iter {it}: rot {best_rot:.2f} deg, trans {best_trans:.2f}")
    assert best is not None

    aSb = _sim3_from_planar(float(theta[best]), t[best], float(s[best]))
    aligned = [aSb.transform_pose(bTi) if bTi is not None else None for bTi in bTi_list_est]
    return aligned, aSb


def compute_pose_errors_3d(
    aTi_list_gt: List[Optional[Pose3]],
    aligned_bTi_list_est: List[Optional[Pose3]],
    verbose: bool = False,
) -> Tuple[float, float, np.ndarray, np.ndarray]:
    """Mean/per-camera rotation (deg) + translation errors between aligned pose graphs."""
    rot_errors, trans_errors = [], []
    for aTi, aTi_ in zip(aTi_list_gt, aligned_bTi_list_est):
        if aTi is None or aTi_ is None:
            continue
        rot_errors.append(rotation_angle_deg(aTi.R, aTi_.R))
        trans_errors.append(float(np.linalg.norm(aTi.t - aTi_.t)))
    rot_errors = np.array(rot_errors)
    trans_errors = np.array(trans_errors)
    if verbose:
        print("Rotation Errors:", np.round(rot_errors, 1))
        print("Translation Errors:", np.round(trans_errors, 1))
    return float(np.mean(rot_errors)), float(np.mean(trans_errors)), rot_errors, trans_errors
