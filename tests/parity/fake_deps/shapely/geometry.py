"""GEOS-free shapely.geometry shims backed by salve_tpu.geometry.polygons.

Implements exactly the surface the reference Stage-A path touches:

- LineString.hausdorff_distance    (scripts/export_alignment_hypotheses.py:43)
- Polygon / Point / buffer(-d) / contains  (salve/utils/overlap_utils.py)

Polygon erosion uses the erosion-predicate identity from
salve_tpu/geometry/polygons.py: a point is inside buffer(-d) iff it is inside
the ring AND farther than d from the boundary. Known delta vs real GEOS
(documented there): when erosion splits a ring into several components the
reference keeps only the largest; the predicate keeps all.
"""

from __future__ import annotations

import numpy as np

from salve_tpu.geometry.polygons import distance_to_boundary, points_in_polygon
from salve_tpu.hypotheses.wdo_alignment import segment_hausdorff_distance


class Point:
    def __init__(self, *coords):
        if len(coords) == 1:
            xy = np.asarray(coords[0], dtype=np.float64).ravel()
        else:
            xy = np.asarray(coords, dtype=np.float64)
        self.x, self.y = float(xy[0]), float(xy[1])

    @property
    def _xy(self) -> np.ndarray:
        return np.array([self.x, self.y])

    def distance(self, other: "Point") -> float:
        return float(np.linalg.norm(self._xy - other._xy))


class LineString:
    def __init__(self, coords):
        self._coords = np.asarray(coords, dtype=np.float64)

    def hausdorff_distance(self, other: "LineString") -> float:
        return segment_hausdorff_distance(self._coords, other._coords)


class _Coords:
    """Mimics shapely's CoordinateSequence just enough for list()/.xy."""

    def __init__(self, ring: np.ndarray):
        self._ring = ring

    def __iter__(self):
        return iter(tuple(p) for p in self._ring)

    @property
    def xy(self):
        return self._ring[:, 0], self._ring[:, 1]


class _Exterior:
    def __init__(self, ring: np.ndarray):
        self.coords = _Coords(ring)


class Polygon:
    def __init__(self, coords, erosion: float = 0.0):
        ring = np.asarray(coords, dtype=np.float64)
        self._ring = ring
        self._erosion = float(erosion)
        self.exterior = _Exterior(ring)

    @property
    def area(self) -> float:
        x, y = self._ring[:, 0], self._ring[:, 1]
        x2, y2 = np.roll(x, -1), np.roll(y, -1)
        return float(0.5 * np.abs(np.sum(x * y2 - x2 * y)))

    def buffer(self, distance: float) -> "Polygon":
        if distance > 0:
            raise NotImplementedError("fake shapely: only erosion (negative buffer) is implemented")
        # Erosions compose additively for the containment predicate.
        return Polygon(self._ring, erosion=self._erosion - distance)

    def contains(self, point: Point) -> bool:
        q = point._xy[None, :]
        inside = bool(points_in_polygon(self._ring, q)[0])
        if self._erosion == 0.0:
            return inside
        return inside and float(distance_to_boundary(self._ring, q)[0]) > self._erosion


class MultiPolygon:
    """Never produced by the fake buffer; exists so isinstance checks resolve."""

    def __init__(self, *args, **kwargs):
        raise NotImplementedError("fake shapely: MultiPolygon is not constructible")
