"""SE(2)/Sim(3) closed-form fits — numeric fixtures match the reference's
GTSAM-backed tests (tests/utils/test_se2_estimation.py, test_sim3_estimation.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from salve_tpu.geometry import point_alignment
from salve_tpu.geometry.rotations import rotmat2d


def test_align_points_SE2_horseshoe() -> None:
    """Two unaligned horseshoe rooms of the same size: exact recovery expected."""
    pts_a = np.array([[3, 1], [1, 1], [1, 3], [3, 3]], dtype=float)
    pts_b = np.array([[1, -3], [1, -5], [-1, -5], [-1, -3]], dtype=float)
    aTb, pts_a_ = point_alignment.align_points_SE2(pts_a, pts_b)
    assert aTb is not None
    for pt_a, pt_b in zip(pts_a, pts_b):
        assert np.allclose(pt_a, aTb.transform_from(pt_b.reshape(1, 2)).squeeze(), atol=1e-6)
    assert np.allclose(pts_a, pts_a_, atol=1e-6)


def test_align_points_SE2_doorway_nested() -> None:
    """Small door centered inside a large door: fit must be the identity."""
    pts_a = np.array([[-4, 2], [-2, 2]], dtype=float)
    pts_b = np.array([[-5, 2], [-1, 2]], dtype=float)
    aTb, _ = point_alignment.align_points_SE2(pts_a, pts_b)
    assert aTb.theta_deg == 0.0
    assert np.allclose(aTb.translation, np.zeros(2))


def test_align_points_SE2_doorway_rotated() -> None:
    """Perpendicular doors of different widths: rotation + centroid alignment, no scale."""
    pts_a = np.array([[7, 3], [9, 3]], dtype=float)
    pts_b = np.array([[5, 2], [5, 6]], dtype=float)
    aTb, _ = point_alignment.align_points_SE2(pts_a, pts_b)
    bTa = aTb.inverse()
    assert np.allclose(np.array([5.0, 3.0]), bTa.transform_from(np.array([[7, 3]])), atol=1e-6)
    assert np.allclose(np.array([5.0, 5.0]), bTa.transform_from(np.array([[9, 3]])), atol=1e-6)


def test_align_points_SE2_too_few_points() -> None:
    out, pts = point_alignment.align_points_SE2(np.zeros((1, 2)), np.zeros((1, 2)))
    assert out is None and pts is None


def test_align_points_sim3_horseshoe() -> None:
    """Small vs. large horseshoe at different heights: scale 0.5, identity rotation."""
    pts_a = np.array([[3, 1, 0], [1, 1, 0], [1, 3, 0], [3, 3, 0]], dtype=float)
    pts_b = np.array([[3, 1, 10], [-1, 1, 10], [-1, 5, 10], [3, 5, 10]], dtype=float)
    aSb, pts_a_ = point_alignment.align_points_sim3(pts_a, pts_b)
    assert np.isclose(aSb.scale, 0.5, atol=1e-6)
    assert np.allclose(aSb.rotation, np.eye(2), atol=1e-6)
    assert np.allclose(aSb.translation, np.array([3, 1]), atol=1e-5)
    assert np.allclose(pts_a_[:, :2], pts_a[:, :2], atol=1e-5)


def test_fit_se2_batched_vmap() -> None:
    """Batched device fit must agree with the host path on random rigid motions."""
    rng = np.random.default_rng(7)
    B, N = 16, 5
    thetas = rng.uniform(-np.pi, np.pi, size=B)
    ts = rng.normal(size=(B, 2))
    src = rng.normal(size=(B, N, 2))
    tgt = np.stack(
        [src[i] @ rotmat2d(np.rad2deg(thetas[i])).T + ts[i] for i in range(B)]
    )
    R, t = jax.jit(point_alignment.fit_se2)(jnp.asarray(tgt), jnp.asarray(src))
    for i in range(B):
        assert np.allclose(R[i], rotmat2d(np.rad2deg(thetas[i])), atol=1e-5)
        assert np.allclose(t[i], ts[i], atol=1e-5)


def test_fit_se2_weights_act_as_mask() -> None:
    """Zero-weighted (padding) points must not influence the fit."""
    pts_a = np.array([[3, 1], [1, 1], [1, 3], [3, 3]], dtype=float)
    pts_b = np.array([[1, -3], [1, -5], [-1, -5], [-1, -3]], dtype=float)
    pts_a_pad = np.vstack([pts_a, [[99.0, -99.0]]])
    pts_b_pad = np.vstack([pts_b, [[-50.0, 50.0]]])
    w = jnp.array([1.0, 1.0, 1.0, 1.0, 0.0])
    R, t = point_alignment.fit_se2(jnp.asarray(pts_a_pad), jnp.asarray(pts_b_pad), w)
    Rref, tref = point_alignment.fit_se2(jnp.asarray(pts_a), jnp.asarray(pts_b))
    assert np.allclose(R, Rref, atol=1e-6)
    assert np.allclose(t, tref, atol=1e-6)


def test_fit_sim3_batched_known_scale() -> None:
    rng = np.random.default_rng(3)
    B, N = 8, 5
    src = rng.normal(size=(B, N, 3))
    scales = rng.uniform(0.3, 3.0, size=B)
    tgt = np.stack([scales[i] * (src[i] + np.array([1.0, 2.0, 3.0])) for i in range(B)])
    R, t, s = jax.jit(point_alignment.fit_sim3)(jnp.asarray(tgt), jnp.asarray(src))
    # float32 device math: expect ~1e-3 relative accuracy.
    assert np.allclose(s, scales, rtol=3e-3)
    assert np.allclose(R, np.broadcast_to(np.eye(3), (B, 3, 3)), atol=3e-3)
    assert np.allclose(t, np.broadcast_to(np.array([1.0, 2.0, 3.0]), (B, 3)), atol=1e-2)
