"""Axis-alignment tests (fixtures from reference tests/utils/test_axis_alignment_utils.py)."""

import numpy as np

from salve_tpu.geometry.rotations import rotmat2d
from salve_tpu.utils import axis_alignment


def test_determine_dominant_rotation_angle_manhattanroom1() -> None:
    """Manhattan room with L-group and alcoves, tilted ~+1.4 deg from +x."""
    verts = np.array(
        [
            [-2.2514273, -1.19972439],
            [-2.28502837, 0.17584117],
            [-2.50067059, 0.17057366],
            [-2.52850206, 1.30994228],
            [-1.89300909, 1.32546553],
            [-1.89455772, 1.3888638],
            [0.56135492, 1.4488546],
            [0.56784876, 1.18300859],
            [1.77462389, 1.2124866],
            [1.83111122, -1.09999984],
        ]
    )
    angle, frac = axis_alignment.determine_dominant_rotation_angle(poly=verts)
    assert np.isclose(angle, 1.399, atol=1e-3)
    assert np.isclose(frac, 1.0, atol=1e-3)


def test_determine_dominant_rotation_angle_manhattanroom2() -> None:
    """Manhattan room tilted ~-2.3 deg from +x."""
    verts = np.array(
        [
            [-2.28579039, -1.17761538],
            [-2.23140688, 0.19728535],
            [-2.44694488, 0.20581085],
            [-2.4018995, 1.3446288],
            [-1.76671367, 1.31950434],
            [-1.76420719, 1.38287197],
            [0.69051847, 1.28577652],
            [0.68000814, 1.02005899],
            [1.88620002, 0.97234867],
            [1.79477498, -1.33902011],
        ]
    )
    angle, frac = axis_alignment.determine_dominant_rotation_angle(poly=verts)
    assert np.isclose(angle, -2.265, atol=1e-3)
    assert np.isclose(frac, 1.0, atol=1e-3)


def test_determine_dominant_rotation_angle_square() -> None:
    poly = np.array([[0, 0], [2, 0], [2, 2], [0, 2]])
    angle, frac = axis_alignment.determine_dominant_rotation_angle(poly)
    assert angle == 0
    assert frac == 1.0


def test_determine_dominant_rotation_angle_rectangle() -> None:
    poly = np.array([[0, 0], [4, 0], [4, 2], [0, 2]])
    angle, frac = axis_alignment.determine_dominant_rotation_angle(poly)
    assert angle == 0
    assert frac == 1.0


def test_determine_dominant_rotation_angle_triangle() -> None:
    """No adjacent edge pair of an equilateral triangle is near 90 deg."""
    poly = np.array([[-2, 0], [2, 0], [0, 3.4641]])
    angle, frac = axis_alignment.determine_dominant_rotation_angle(poly)
    assert angle is None
    assert frac is None


def test_compute_relative_angle_deg() -> None:
    """Clockwise angle in [0, 360)."""
    assert np.isclose(axis_alignment.compute_relative_angle_deg(np.array([1, 0]), np.array([1, 0])), 0.0)
    assert np.isclose(axis_alignment.compute_relative_angle_deg(np.array([0, 1]), np.array([1, 0])), 90.0)
    assert np.isclose(axis_alignment.compute_relative_angle_deg(np.array([1, 0]), np.array([0, 1])), 270.0)
    assert np.isclose(axis_alignment.compute_relative_angle_deg(np.array([1, 0]), np.array([0, -1])), 90.0)


def test_get_dominant_direction_from_point_cloud() -> None:
    """A diamond's dominant direction is 45 deg; rotating by it axis-aligns the shape."""
    pts = np.array([[0, 2], [2, 0], [4, 2], [2, 4]])
    theta_deg = axis_alignment.get_dominant_direction_from_point_cloud(point_cloud=pts)
    assert np.isclose(abs(theta_deg), 45.0)
    upright = pts @ rotmat2d(theta_deg).T
    # All edges of the rotated diamond are axis-aligned to within numerics.
    edges = np.diff(np.vstack([upright, upright[:1]]), axis=0)
    assert np.all(np.min(np.abs(edges), axis=1) < 1e-9)


def test_compute_i2Ti1() -> None:
    """Recovered SE(2) maps pts1 onto pts2 exactly."""
    pts1 = np.array([[2, 1], [1, 1], [1, 2]], dtype=float)
    pts2 = np.array([[-1, 1], [0, 1], [0, 0]], dtype=float)
    i2Ti1 = axis_alignment.compute_i2Ti1(pts1=pts1, pts2=pts2)
    for i in range(3):
        assert np.allclose(pts2[i], i2Ti1.transform_from(pts1[i].reshape(1, 2)).squeeze(), atol=1e-6)


def test_compute_i2Ti1_from_rotation_in_place() -> None:
    """In-place rotation of an upright segment yields a valid SE(2) (no crash, s=1)."""
    pts1 = np.array([[0, 2], [0, 1], [0, 0]], dtype=float)
    pts2 = np.array([[-0.5, 2], [0, 1], [0.5, 0]], dtype=float)
    i2Ti1 = axis_alignment.compute_i2Ti1(pts1=pts1, pts2=pts2)
    assert i2Ti1.scale == 1.0
