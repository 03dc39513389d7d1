"""Tests for dense shape generation + multi-pano fusion."""

import numpy as np
import pytest

from salve_tpu.stitching import shape as shape_utils
from salve_tpu.stitching import transform as T
from salve_tpu.stitching.constants import DEFAULT_CAMERA_HEIGHT, IMAGE_WIDTH_PX
from salve_tpu.stitching.models import Point2d, Pose


def _square_room_boundary(half: float = 1.0) -> np.ndarray:
    """v-values of a square room's floor boundary, seen from the origin."""
    us = (np.arange(IMAGE_WIDTH_PX) + 0.0) / IMAGE_WIDTH_PX
    vs = np.zeros(IMAGE_WIDTH_PX)
    square = np.array([[-half, -half], [half, -half], [half, half], [-half, half]])
    for i, u in enumerate(us):
        hit = T.ray_cast_by_u(float(u), square)
        uv = T.xy_to_uv(hit, DEFAULT_CAMERA_HEIGHT)
        vs[i] = uv.y * 512
    return vs


class TestGenerateDenseShape:
    def test_square_reconstruction(self) -> None:
        vs = _square_room_boundary(half=1.0)
        unc = [1.0] * IMAGE_WIDTH_PX
        polygon, distances = shape_utils.generate_dense_shape(vs, unc)
        # The reference subsamples every 2nd column -> 512 points.
        assert polygon.shape == (IMAGE_WIDTH_PX // 2, 2)
        # All points on the square boundary (max-norm == 1, modulo the
        # half-pixel uv offsets).
        maxnorm = np.max(np.abs(polygon), axis=1)
        assert np.allclose(maxnorm, 1.0, atol=0.03)
        assert all(d > 0 for d in distances)


class TestGroupPanosByRoom:
    def test_same_room_grouped(self) -> None:
        square = np.array([[-1.0, -1], [1, -1], [1, 1], [-1, 1]])
        predictions = {0: square, 1: square, 2: square + 10.0}
        poses = {
            0: Pose(Point2d(0, 0), 0.0),
            1: Pose(Point2d(0.2, 0.1), 0.0),
            2: Pose(Point2d(0, 0), 0.0),
        }
        # Pano 2's shape is 10m away -> separate room.
        groups = shape_utils.group_panos_by_room(predictions, poses)
        groups_sets = sorted(map(sorted, groups))
        assert groups_sets == [[0, 1], [2]]


class TestRefineShape:
    def test_two_pano_fusion_prefers_lower_uncertainty(self) -> None:
        """Two panos in one square room: fused boundary stays on the square."""
        vs = _square_room_boundary(half=1.0)
        unc_good = [0.5] * IMAGE_WIDTH_PX
        unc_bad = [5.0] * IMAGE_WIDTH_PX
        poly0, conf0 = shape_utils.generate_dense_shape(vs, unc_good)
        poly1, conf1 = shape_utils.generate_dense_shape(vs, unc_bad)

        predicted_shapes = {0: poly0, 1: poly1}
        wall_confidences = {0: np.asarray(conf0), 1: np.asarray(conf1)}
        poses = {0: Pose(Point2d(0, 0), 0.0), 1: Pose(Point2d(0.0, 0.0), 0.0)}

        xys, confs = shape_utils.refine_shape_group_start_with(
            [0, 1], 0, predicted_shapes, wall_confidences, poses
        )
        pts = np.array([[p.x, p.y] for p in xys])
        maxnorm = np.max(np.abs(pts), axis=1)
        assert np.allclose(maxnorm, 1.0, atol=0.05)

    def test_refine_predicted_shape_outputs(self) -> None:
        vs = _square_room_boundary(half=1.0)
        unc = [1.0] * IMAGE_WIDTH_PX
        poly, conf = shape_utils.generate_dense_shape(vs, unc)
        predicted_shapes = {0: poly}
        wall_confidences = {0: np.asarray(conf)}
        poses = {0: Pose(Point2d(1.0, 2.0), 45.0)}

        fused, polys = shape_utils.refine_predicted_shape(
            [[0]], predicted_shapes, wall_confidences, poses
        )
        assert len(fused) == 1 and len(fused[0]) == 1
        assert len(polys) == 1 and polys[0][0].shape[1] == 2
        mask, origin = shape_utils.rasterize_polygons_union(polys[0])
        assert mask.sum() > 0


class TestMemoryLoader:
    def test_reference_fixture(self) -> None:
        import pathlib

        data_root = pathlib.Path(
            "/root/reference/tests/test_data/example_input_stiching/pano"
        )
        if not data_root.exists():
            pytest.skip("fixture unavailable")
        from salve_tpu.stitching.loaders import MemoryLoader

        loader = MemoryLoader(data_root=str(data_root))
        panoids = loader.pano_ids()
        assert len(panoids) >= 5
        rse = loader.get_room_shape_predictions(panoids[0], type="partial_v1")
        dwo = loader.get_dwo_predictions(panoids[0])
        assert rse is not None
        assert dwo is not None
        # Unknown panoid (no prediction directory at all) behaves like a
        # missing file: None, so stitch callers skip instead of KeyError.
        assert loader.get_room_shape_predictions("ffffffffff") is None
        assert loader.get_dwo_predictions("ffffffffff") is None


class TestIoUBetweenPolygonSets:
    def test_empty_sets_score_zero(self) -> None:
        from salve_tpu.stitching import shape as shape_utils

        scores = shape_utils.iou_between_polygon_sets([], [])
        assert scores["iou"] == 0.0
        assert scores["area_union"] == 0.0

    def test_unit_squares(self) -> None:
        from salve_tpu.stitching import shape as shape_utils

        sq = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
        shifted = sq + np.array([0.5, 0.0])
        scores = shape_utils.iou_between_polygon_sets([sq], [shifted])
        assert abs(scores["iou"] - 1.0 / 3.0) < 0.05
        assert abs(scores["area_a"] - 1.0) < 0.1
