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


# --- Reference numeric fixtures (tests/utils/test_overlap_utils.py) ---------


def test_overlap_nested_rectangles_invalid() -> None:
    """A small room strictly inside a larger one is invalid (walls in freespace).

    Fixture: reference test_determine_invalid_wall_overlap1.
    """
    pano1 = np.array([[1, 2], [1, 5], [3, 5], [3, 2]], dtype=float)
    pano2 = np.array([[2, 4], [3, 4], [3, 3], [2, 3]], dtype=float)
    assert not polygons.determine_invalid_wall_overlap(pano1, pano2, shrink_factor=0.2)


def test_overlap_identical_shape_valid() -> None:
    """Two identical layouts (same-room panos) are valid.

    Fixture: reference test_determine_invalid_wall_overlap_identical_shape.
    """
    verts = np.array([[1, 2], [1, 5], [3, 5], [3, 2]], dtype=float)
    assert polygons.determine_invalid_wall_overlap(verts, verts.copy(), shrink_factor=0.2)


def test_overlap_real_pair_invalid() -> None:
    """Rotated real-building pair whose walls cut through freespace.

    Fixture: reference test_determine_invalid_wall_overlap3 (Building 0003
    panos (0, 8) - obviously different sizes stacked on each other).
    """
    pano1 = np.array(
        [
            [-1.20350544, 2.19687034],
            [-0.14832726, 3.12533515],
            [2.14896215, 0.51452036],
            [1.09378396, -0.41394445],
        ]
    )
    pano2 = np.array(
        [
            [-0.08913514, -1.02572344],
            [-2.17362494, 1.34324966],
            [-0.15560001, 3.11893567],
            [1.92888979, 0.74996256],
        ]
    )
    assert not polygons.determine_invalid_wall_overlap(pano1, pano2, shrink_factor=0.1)


def test_shrink_complex_polygon_no_error() -> None:
    """Erosion of a concave 12-gon must not blow up (reference test_shrink_polygon

    guards a MultiPolygon AttributeError in the GEOS path; our GEOS-free
    erosion is distance-based, so we assert it stays usable: the shrink
    distance is positive and interior counting runs on the same fixture).
    """
    verts = np.array(
        [
            [0.61807389, -1.0028074],
            [0.59331251, -0.48251453],
            [0.63846121, -0.38975602],
            [0.81566386, -0.02569123],
            [0.85433859, 0.05376642],
            [-1.9087475, 1.3986739],
            [-0.71553403, 3.85014409],
            [2.87482109, 2.10250285],
            [2.51753773, 1.36848825],
            [2.26585724, 1.49099615],
            [1.31355939, -0.46543567],
            [1.32937937, -1.00994635],
        ]
    )
    d = polygons.shrink_distance_for_polygon(verts, shrink_factor=0.1)
    assert d > 0
    centroid = verts.mean(axis=0, keepdims=True)
    n_inside = polygons.count_verts_inside_shrunk_poly(verts, centroid, d)
    assert n_inside in (0, 1)  # well-defined, no exception


# --- Reference numeric fixtures (tests/utils/test_polyline_interpolation.py) -


def test_interp_arc_with_consecutive_duplicates() -> None:
    """interp_arc must tolerate zero-length chords (duplicate waypoints).

    Fixture: reference test_interp_arc_with_consecutive_duplicates.
    """
    polyline = np.array(
        [
            [3.41491678, 0.82735686],
            [2.5812492, -2.36060637],
            [0.2083626, -1.74008522],
            [0.53871724, -0.47680178],
            [0.40395381, -0.4415605],
            [0.40395381, -0.4415605],
            [-0.36244272, -0.24114416],
            [-0.36244272, -0.24114416],
            [-0.56108295, -0.18919879],
            [-0.14397634, 1.40582611],
            [0.06767395, 1.35047855],
            [0.15388028, 1.68013345],
        ]
    )
    out = polylines.interp_arc(t=104, points=polyline)
    assert isinstance(out, np.ndarray)
    assert out.shape == (104, 2)
    assert np.isfinite(out).all()


def test_interp_evenly_spaced_points_rejects_reference_duplicates() -> None:
    """Fixed-interval resampling raises on duplicated consecutive waypoints.

    Fixture: reference test_interp_evenly_spaced_points_with_consecutive_duplicates.
    """
    import pytest

    verts = np.array(
        [
            [3.41491678, 0.82735686],
            [2.5812492, -2.36060637],
            [0.2083626, -1.74008522],
            [0.53871724, -0.47680178],
            [0.40395381, -0.4415605],
            [0.40395381, -0.4415605],
            [-0.36244272, -0.24114416],
            [-0.36244272, -0.24114416],
            [-0.56108295, -0.18919879],
            [-0.14397634, 1.40582611],
            [0.06767395, 1.35047855],
            [0.15388028, 1.68013345],
        ]
    )
    with pytest.raises(ValueError):
        polylines.interp_evenly_spaced_points(verts, interval_m=0.1)


def test_interp_evenly_spaced_points_rectangle_runs() -> None:
    """Closed rectangle resamples cleanly (reference test_interp_evenly_spaced_points_rectangle)."""
    layout = np.array([[1.0, 2.0], [1.0, 5.0], [3.0, 5.0], [3.0, 2.0], [1.0, 2.0]])
    out = polylines.interp_evenly_spaced_points(layout, interval_m=0.1)
    assert out.shape[1] == 2
    assert np.isfinite(out).all()
