"""Tests for the ZInD pano projection chain (reference numeric fixtures)."""

import numpy as np

from salve_tpu.geometry import pano_projection as P


class TestRoundTrip:
    def test_pixel_sphere_cartesian_roundtrip(self) -> None:
        """pixel -> sphere -> cartesian -> sphere -> pixel is identity."""
        rng = np.random.default_rng(0)
        N, img_w, img_h = 10000, 1024, 512
        contour_px = rng.integers([0, 0], [img_w, img_h], size=(N, 2))

        points_sph = P.zind_pixel_to_sphere(contour_px, width=img_w)
        points_cart = P.zind_sphere_to_cartesian(points_sph)
        points_sph_ = P.zind_cartesian_to_sphere(points_cart)
        contour_px_ = P.zind_sphere_to_pixel(points_sph_, width=img_w)
        assert np.allclose(contour_px, contour_px_)


class TestSphereToCartesian:
    def test_reference_fixture(self) -> None:
        points_sph = np.array(
            [
                [-np.pi, np.pi / 2],
                [-np.pi, -np.pi / 2],
                [np.pi, -np.pi / 2],
                [np.pi, np.pi / 2],
                [0, 0],
                [np.pi / 2, 0],
                [-np.pi, 0],
            ]
        )
        expected = np.array(
            [
                [0, 1, 0],
                [0, -1, 0],
                [0, -1, 0],
                [0, 1, 0],
                [0, 0, 1],
                [1, 0, 0],
                [0, 0, -1],
            ]
        )
        out = P.zind_sphere_to_cartesian(points_sph)
        assert np.allclose(out, expected, atol=1e-12)


class TestCartesianToSphere:
    def test_reference_fixture(self) -> None:
        points_cart = np.array([[0, 0, 1], [1, 0, 0], [0, 0, -1]], dtype=float)
        expected = np.array([[0, 0, 1], [np.pi / 2, 0, 1], [-np.pi, 0, 1]])
        out = P.zind_cartesian_to_sphere(points_cart)
        out = np.array(out)
        out[:, 0] = np.mod(out[:, 0], 2 * np.pi)
        expected[:, 0] = np.mod(expected[:, 0], 2 * np.pi)
        assert np.allclose(out, expected)


class TestPixelSphere:
    def test_pixel_to_sphere_corners(self) -> None:
        points_pix = np.array([[0, 0], [0, 511], [1023, 511], [1023, 0]])
        expected = np.array(
            [
                [-np.pi, np.pi / 2],
                [-np.pi, -np.pi / 2],
                [np.pi, -np.pi / 2],
                [np.pi, np.pi / 2],
            ]
        )
        assert np.allclose(P.zind_pixel_to_sphere(points_pix, width=1024), expected)

    def test_sphere_to_pixel_corners(self) -> None:
        points_sph = np.array(
            [
                [-np.pi, np.pi / 2],
                [-np.pi, -np.pi / 2],
                [np.pi, -np.pi / 2],
                [np.pi, np.pi / 2],
            ]
        )
        expected = np.array([[0, 0], [0, 511], [1023, 511], [1023, 0]])
        assert np.allclose(P.zind_sphere_to_pixel(points_sph, width=1024), expected)


class TestWorldMetric:
    def test_floor_point_convention(self) -> None:
        """Floor pixels land on the floor plane: columns (x, y, vertical)
        with the vertical (column 2) scaled to exactly camera_height —
        the convention every consumer ([:, :2] slices) relies on."""
        camera_height = 1.5
        pts = np.array([[0.0, 384.0], [256.0, 384.0], [512.0, 384.0], [512.0, 448.0]])
        world = P.convert_points_px_to_worldmetric(
            pts, image_width=1024, camera_height_m=camera_height
        )
        assert np.allclose(world[:, 2], camera_height, atol=1e-9)
        # Horizontal positions vary with the pixel column / depth.
        assert np.ptp(world[:, 0]) > 0.5
        assert np.ptp(world[:, 1]) > 0.5

    def test_depth_decreases_toward_nadir(self) -> None:
        """Lower pixels (closer to nadir) are closer to the camera."""
        world = P.convert_points_px_to_worldmetric(
            np.array([[512.0, 300.0], [512.0, 400.0], [512.0, 500.0]]),
            image_width=1024,
            camera_height_m=1.5,
        )
        d = np.linalg.norm(world[:, :2], axis=1)
        assert d[0] > d[1] > d[2]


class TestUniSphere:
    def test_get_uni_sphere_xyz(self) -> None:
        """HoHoNet ray-grid convention: -x toward center pixel, z up.

        Fixture: reference tests/test_hohonet_pano_utils.py::test_get_uni_sphere_xyz.
        """
        sphere_xyz = P.get_uni_sphere_xyz(H=512, W=1024)
        # Top-left / top-right pixels point up (wrapped around at the seam).
        assert np.allclose(sphere_xyz[0, 0], np.array([0, 0, 1]), atol=4e-3)
        assert np.allclose(sphere_xyz[0, 1023], np.array([0, 0, 1]), atol=4e-3)
        # Bottom-left points down.
        assert np.allclose(sphere_xyz[511, 0], np.array([0, 0, -1]), atol=4e-3)
        # Center pixel of the panorama points toward -x.
        assert np.allclose(sphere_xyz[256, 512], np.array([-1, 0, 0]), atol=4e-3)


class TestWorldMetricInverse:
    """The corrected buggy_transforms chain: world-metric -> pixel."""

    def test_pixel_world_pixel_roundtrip(self) -> None:
        """Floor pixels (below horizon) round-trip exactly through the
        world-metric frame — the recoverability the reference's
        buggy_transforms.py loses with its sign-squaring step."""
        rng = np.random.default_rng(1)
        N, img_w, img_h = 5000, 1024, 512
        camera_height = 1.45
        # Strictly below the horizon row (img_h/2) so rays hit the floor.
        px = np.stack(
            [
                rng.uniform(0, img_w - 1, N),
                rng.uniform(img_h / 2 + 2, img_h - 1, N),
            ],
            axis=-1,
        )
        world = P.pixel_to_worldmetric(px, img_w, camera_height)
        px_back = P.worldmetric_to_pixel(world, img_w, camera_height)
        assert np.allclose(px, px_back, atol=1e-6)

    def test_world_pixel_world_roundtrip(self) -> None:
        rng = np.random.default_rng(2)
        camera_height = 1.6
        xy = rng.uniform(-6, 6, (2000, 2))
        world = np.concatenate([xy, np.full((2000, 1), camera_height)], axis=-1)
        px = P.worldmetric_to_pixel(world, 2048, camera_height)
        world_back = P.pixel_to_worldmetric(px, 2048, camera_height)
        assert np.allclose(world, world_back, atol=1e-6)

    def test_room_cartesian_inverse_is_downward_unit_ray(self) -> None:
        cart = P.worldmetric_to_room_cartesian(
            np.array([[2.0, 3.0, 1.5], [-1.0, 0.5, 1.5]]), camera_height_m=1.5
        )
        assert np.allclose(np.linalg.norm(cart, axis=-1), 1.0)
        assert np.all(cart[:, 1] < 0)  # below the horizon in the sphere frame
