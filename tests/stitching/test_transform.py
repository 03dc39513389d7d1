"""Tests for stitching coordinate transforms and ray casting."""

import math

import numpy as np

from salve_tpu.stitching import transform as T
from salve_tpu.stitching.models import Point2d, Pose


class TestUVXYRoundTrip:
    def test_xy_to_uv_to_xy(self) -> None:
        height = 0.4
        for xy in [Point2d(1.0, 2.0), Point2d(-0.5, 1.5), Point2d(2.0, -3.0)]:
            uv = T.xy_to_uv(xy, height)
            xy2 = T.uv_to_xy(uv, height)
            assert np.isclose(xy.x, xy2.x, atol=1e-9)
            assert np.isclose(xy.y, xy2.y, atol=1e-9)

    def test_uv_to_xy_batch_matches_scalar(self) -> None:
        height = 0.4042
        uvs = [[0.1, 0.7], [0.4, 0.8], [0.9, 0.6]]
        batch = T.uv_to_xy_batch(uvs, height)
        for (u, v), xy_b in zip(uvs, batch):
            xy_s = T.uv_to_xy(Point2d(x=u, y=v), height)
            assert np.allclose([xy_s.x, xy_s.y], xy_b, atol=1e-9)

    def test_u_to_xy_unit_norm(self) -> None:
        for u in [0.0, 0.25, 0.5, 0.99]:
            xy = T.u_to_xy(u)
            assert np.isclose(math.hypot(xy.x, xy.y), 1.0)


class TestPoseTransforms:
    def test_transform_then_project_identity(self) -> None:
        pose = Pose(position=Point2d(1.0, -2.0), rotation=33.0)
        p = Point2d(0.7, 0.3)
        q = T.transform_xy_by_pose(p, pose)
        r = T.project_xy_by_pose(q, pose)
        assert np.isclose(r.x, p.x) and np.isclose(r.y, p.y)

    def test_rotate_clockwise(self) -> None:
        out = T.rotate_xys_clockwise([Point2d(0.0, 1.0)], 90.0)[0]
        assert np.isclose(out.x, 1.0, atol=1e-9)
        assert np.isclose(out.y, 0.0, atol=1e-9)


class TestRayCasting:
    def test_square_room(self) -> None:
        square = np.array([[-1, -1], [1, -1], [1, 1], [-1, 1]], dtype=float)
        # u=0.5 -> direction (0, -1)? u_to_xy(0.5): phi=2pi -> (sin, cos)=(0,1)
        hit = T.ray_cast_by_u(0.5, square)
        assert hit is not None
        assert np.isclose(math.hypot(hit.x, hit.y), 1.0, atol=1e-6)

    def test_all_columns_hit(self) -> None:
        square = np.array([[-2, -1], [2, -1], [2, 1], [-2, 1]], dtype=float)
        for u in np.linspace(0, 0.999, 32):
            hit = T.ray_cast_by_u(float(u), square)
            assert hit is not None
            # hit must be on the boundary
            assert (
                np.isclose(abs(hit.x), 2, atol=1e-6) or np.isclose(abs(hit.y), 1, atol=1e-6)
            )

    def test_segment_intersection(self) -> None:
        p = T.line_segment_intersection(
            (np.array([0, 0]), np.array([2, 2])), (np.array([0, 2]), np.array([2, 0]))
        )
        assert p is not None
        assert np.isclose(p.x, 1) and np.isclose(p.y, 1)

    def test_segment_no_intersection(self) -> None:
        p = T.line_segment_intersection(
            (np.array([0, 0]), np.array([1, 0])), (np.array([0, 1]), np.array([1, 1]))
        )
        assert p is None
