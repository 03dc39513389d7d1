"""Tests for depth backprojection (parity with reference geometry)."""

import jax.numpy as jnp
import numpy as np

from salve_tpu.geometry.pano_projection import get_uni_sphere_xyz
from salve_tpu.ops import backproject as bp


class TestUniSphere:
    def test_unit_norm(self) -> None:
        rays = get_uni_sphere_xyz(8, 16)
        assert np.allclose(np.linalg.norm(rays, axis=-1), 1.0, atol=1e-6)

    def test_center_pixel_faces_minus_x(self) -> None:
        """HoHoNet convention: image center ray points toward -x."""
        H, W = 512, 1024
        rays = get_uni_sphere_xyz(H, W)
        center = rays[H // 2, W // 2]
        assert center[0] < -0.99


class TestBackprojectDepth:
    def test_shapes_and_crop(self) -> None:
        H, W = 512, 1024
        depth = jnp.full((H, W), 2000, dtype=jnp.uint16)  # 2 m everywhere
        rgb = jnp.ones((H, W, 3)) * 0.5
        xyz, c, valid = bp.backproject_depth(depth, rgb, (-np.inf, np.inf))
        n_expected = (H - 2 * 80) * W
        assert xyz.shape == (n_expected, 3)
        assert c.shape == (n_expected, 3)
        assert np.asarray(valid).all()
        # all points at 2 m from origin
        assert np.allclose(np.linalg.norm(np.asarray(xyz), axis=1), 2.0, atol=1e-3)

    def test_z_range_mask(self) -> None:
        H, W = 64, 128
        depth = jnp.full((H, W), 1000, dtype=jnp.uint16)
        rgb = jnp.zeros((H, W, 3))
        xyz, _, valid = bp.backproject_depth(
            depth, rgb, (-np.inf, -0.5), crop_ratio=0.0
        )
        z = np.asarray(xyz[:, 2])
        v = np.asarray(valid)
        assert np.all(z[v] <= -0.5)
        assert np.all(z[~v] > -0.5)
