"""Rotation-utility tests (fixtures from reference tests/utils/test_rotation_utils.py)."""

import numpy as np

from salve_tpu.geometry import rotations


def test_rotmat2d_is_so2() -> None:
    """rotmat2d must return members of SO(2): R^T R = I and det = 1."""
    rng = np.random.default_rng(0)
    for _ in range(1000):
        theta = float(rng.random() * 360)
        R = rotations.rotmat2d(theta)
        assert np.allclose(R.T @ R, np.eye(2))
        assert np.allclose(np.linalg.det(R), 1.0)


def test_angle_is_equal() -> None:
    """Wrapped angle equality (reference test_rotation_utils.py::test_angle_is_equal)."""
    assert rotations.angle_is_equal(-177.8, 179.5, atol=5.0)
    assert not rotations.angle_is_equal(-170, 170, atol=5.0)
    assert rotations.angle_is_equal(-170, 180, atol=10.0)
    assert not rotations.angle_is_equal(5, 11, atol=5.0)
    assert not rotations.angle_is_equal(-5, -11, atol=5.0)
    assert rotations.angle_is_equal(-5, -9, atol=5.0)


def test_wrap_angle_deg() -> None:
    """Shortest angular distance (reference test_rotation_utils.py::test_wrap_angle_deg)."""
    assert rotations.wrap_angle_deg(180, -180) == 0
    assert rotations.wrap_angle_deg(-180, 180) == 0
    assert rotations.wrap_angle_deg(-45, -47) == 2
    assert rotations.wrap_angle_deg(1, -1) == 2
