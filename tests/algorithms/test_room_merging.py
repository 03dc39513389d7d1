"""Room grouping by layout overlap (parity: salve/algorithms/room_merging.py:22)."""

import numpy as np

from salve_tpu.algorithms.room_merging import group_panos_by_room
from salve_tpu.common.pano_data import PanoData
from salve_tpu.common.posegraph2d import PoseGraph2d
from salve_tpu.geometry.sim2 import Sim2


SQUARE = np.array([[-1.0, -1.0], [1.0, -1.0], [1.0, 1.0], [-1.0, 1.0]])


def _pano(pid: int, tx: float, ty: float, verts=SQUARE) -> PanoData:
    return PanoData(
        id=pid,
        global_Sim2_local=Sim2(R=np.eye(2), t=np.array([tx, ty]), s=1.0),
        room_vertices_local_2d=verts,
        image_path=f"floor_01_pano_{pid}.jpg",
        label="room",
    )


def _graph(panos) -> PoseGraph2d:
    return PoseGraph2d(
        building_id="0000",
        floor_id="floor_01",
        nodes={p.id: p for p in panos},
        scale_meters_per_coordinate=1.0,
    )


def test_same_room_panos_grouped():
    """Two panos in the same room (near-identical footprint) share a group."""
    pg = _graph([_pano(0, 0.0, 0.0), _pano(1, 0.2, 0.1)])
    groups = group_panos_by_room(pg)
    assert sorted(map(sorted, groups)) == [[0, 1]]


def test_disjoint_rooms_not_grouped():
    """Far-apart rooms form separate groups."""
    pg = _graph([_pano(0, 0.0, 0.0), _pano(1, 10.0, 0.0), _pano(2, 0.0, 10.0)])
    groups = group_panos_by_room(pg)
    assert sorted(map(sorted, groups)) == [[0], [1], [2]]


def test_adjacent_rooms_with_slight_touch_not_grouped():
    """Rooms sharing only a wall sliver stay separate (IoU/overlap gates)."""
    # 2x2 squares side by side with 0.05 overlap: IoU ~ 0.0125, ratio ~ 0.025.
    pg = _graph([_pano(0, 0.0, 0.0), _pano(1, 1.95, 0.0)])
    groups = group_panos_by_room(pg)
    assert sorted(map(sorted, groups)) == [[0], [1]]


def test_chained_overlap_merges_transitively():
    """A overlaps B, B overlaps C -> one group of 3 (connected components)."""
    pg = _graph([_pano(0, 0.0, 0.0), _pano(1, 0.8, 0.0), _pano(2, 1.6, 0.0)])
    groups = group_panos_by_room(pg)
    assert sorted(map(sorted, groups)) == [[0, 1, 2]]
