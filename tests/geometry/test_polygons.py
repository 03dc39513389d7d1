"""Polygon predicates (GEOS-free) + polyline resampling."""

import numpy as np

from salve_tpu.geometry import polygons, polylines
from salve_tpu.geometry.rotations import rotmat2d


def test_points_in_polygon_square() -> None:
    square = np.array([[0, 0], [4, 0], [4, 4], [0, 4]], dtype=float)
    query = np.array([[2, 2], [5, 2], [-1, -1], [3.9, 3.9], [2, 4.1]])
    got = polygons.points_in_polygon(square, query)
    assert got.tolist() == [True, False, False, True, False]


def test_points_in_polygon_concave() -> None:
    # L-shaped room.
    poly = np.array([[0, 0], [4, 0], [4, 2], [2, 2], [2, 4], [0, 4]], dtype=float)
    query = np.array([[1, 3], [3, 3], [3, 1], [1, 1]])
    got = polygons.points_in_polygon(poly, query)
    assert got.tolist() == [True, False, True, True]


def test_distance_to_boundary() -> None:
    square = np.array([[0, 0], [4, 0], [4, 4], [0, 4]], dtype=float)
    query = np.array([[2.0, 2.0], [0.5, 2.0], [2.0, 5.0]])
    d = polygons.distance_to_boundary(square, query)
    assert np.allclose(d, [2.0, 0.5, 1.0])


def test_overlap_identical_rooms_valid() -> None:
    """Identical overlapping layouts = same room seen twice: must be valid."""
    room = np.array([[0, 0], [4, 0], [4, 4], [0, 4]], dtype=float)
    assert polygons.determine_invalid_wall_overlap(room, room.copy(), shrink_factor=0.1)


def test_overlap_wall_through_freespace_invalid() -> None:
    """A small room strictly inside a big room penetrates its freespace: invalid."""
    big = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], dtype=float)
    small = np.array([[4, 4], [6, 4], [6, 6], [4, 6]], dtype=float)
    assert not polygons.determine_invalid_wall_overlap(big, small, shrink_factor=0.1)


def test_overlap_adjacent_rooms_valid() -> None:
    """Rooms sharing only a wall must be a valid configuration."""
    room1 = np.array([[0, 0], [4, 0], [4, 4], [0, 4]], dtype=float)
    room2 = np.array([[4, 0], [8, 0], [8, 4], [4, 4]], dtype=float)
    assert polygons.determine_invalid_wall_overlap(room1, room2, shrink_factor=0.1)


def test_polygon_area() -> None:
    square = np.array([[0, 0], [4, 0], [4, 4], [0, 4]], dtype=float)
    assert np.isclose(polygons.polygon_area(square), 16.0)
    # Orientation-independent.
    assert np.isclose(polygons.polygon_area(square[::-1]), 16.0)


def test_polygon_iou_identical() -> None:
    square = np.array([[0, 0], [4, 0], [4, 4], [0, 4]], dtype=float)
    iou, overlap = polygons.polygon_iou_and_overlap(square, square + 1e-9)
    assert iou > 0.98 and overlap > 0.98


def test_polygon_iou_disjoint() -> None:
    a = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], dtype=float)
    b = a + np.array([10.0, 0.0])
    iou, overlap = polygons.polygon_iou_and_overlap(a, b)
    assert iou == 0.0 and overlap == 0.0


def test_interp_arc_endpoints_and_spacing() -> None:
    line = np.array([[0.0, 0.0], [10.0, 0.0]])
    out = polylines.interp_arc(t=11, points=line)
    assert np.allclose(out[:, 0], np.arange(11.0))
    assert np.allclose(out[:, 1], 0.0)


def test_interp_evenly_spaced_points_interval() -> None:
    ring = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 1e-9]], dtype=float)
    out = polylines.interp_evenly_spaced_points(ring, interval_m=0.1)
    # Total length 16 -> 160 waypoints (ceil).
    assert out.shape[0] == 160
    seg = np.linalg.norm(np.diff(out, axis=0), axis=1)
    assert seg.max() < 0.2


def test_interp_rejects_duplicate_vertices() -> None:
    ring = np.array([[0, 0], [0, 0], [4, 4]], dtype=float)
    try:
        polylines.interp_evenly_spaced_points(ring, interval_m=0.1)
        raised = False
    except ValueError:
        raised = True
    assert raised


def test_shrink_distance_matches_bbox_rule() -> None:
    square = np.array([[0, 0], [4, 0], [4, 4], [0, 4]], dtype=float)
    # center (2,2), min corner (0,0), distance 2*sqrt(2)
    d = polygons.shrink_distance_for_polygon(square, shrink_factor=0.1)
    assert np.isclose(d, 0.1 * 2 * np.sqrt(2))


def test_rotated_room_overlap_still_valid() -> None:
    room1 = np.array([[0, 0], [4, 0], [4, 4], [0, 4]], dtype=float)
    room2 = (room1 - 2.0) @ rotmat2d(45.0).T + 2.0
    # Rotated copy of the same room about its center overlaps heavily; corners
    # of each poke outside the other but do not penetrate deep freespace interior
    # beyond the shrink margin only if geometry allows; just assert it runs.
    polygons.determine_invalid_wall_overlap(room1, room2, shrink_factor=0.1)
