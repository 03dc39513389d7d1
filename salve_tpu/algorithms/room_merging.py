"""Group panoramas into rooms by layout-polygon overlap.

Parity: salve/algorithms/room_merging.py — two panos share a room when
their global layout polygons have IoU > 0.1 OR either polygon's overlap
ratio exceeds 0.3. The reference used Shapely/GEOS exact intersections;
here overlap areas come from the GEOS-free raster predicate in
salve_tpu.geometry.polygons.
"""

from __future__ import annotations

from typing import List

import networkx as nx
import numpy as np

from salve_tpu.geometry.polygons import points_in_polygon

MIN_LAYOUT_OVERLAP_RATIO = 0.3
MIN_LAYOUT_OVERLAP_IOU = 0.1


def _pairwise_overlap(poly_a: np.ndarray, poly_b: np.ndarray, resolution: float = 0.05):
    """(iou, overlap_ratio_a, overlap_ratio_b) via a shared raster grid."""
    mins = np.minimum(poly_a.min(axis=0), poly_b.min(axis=0)) - resolution
    maxs = np.maximum(poly_a.max(axis=0), poly_b.max(axis=0)) + resolution
    nx_ = min(max(int(np.ceil((maxs[0] - mins[0]) / resolution)), 1), 1500)
    ny_ = min(max(int(np.ceil((maxs[1] - mins[1]) / resolution)), 1), 1500)
    xs = mins[0] + (np.arange(nx_) + 0.5) * (maxs[0] - mins[0]) / nx_
    ys = mins[1] + (np.arange(ny_) + 0.5) * (maxs[1] - mins[1]) / ny_
    grid = np.stack(np.meshgrid(xs, ys), axis=-1).reshape(-1, 2)
    in_a = points_in_polygon(poly_a, grid)
    in_b = points_in_polygon(poly_b, grid)
    inter = float(np.sum(in_a & in_b))
    union = float(np.sum(in_a | in_b))
    area_a = float(np.sum(in_a))
    area_b = float(np.sum(in_b))
    eps = 1e-10
    return inter / (union + eps), inter / (area_a + eps), inter / (area_b + eps)


def group_panos_by_room(est_pose_graph, visualize: bool = False) -> List[List[int]]:
    """Connected components of the layout-overlap graph (parity :22)."""
    pano_ids = est_pose_graph.pano_ids()
    polys = {
        pid: np.asarray(est_pose_graph.nodes[pid].room_vertices_global_2d)
        for pid in pano_ids
    }

    graph = nx.Graph()
    graph.add_nodes_from(pano_ids)
    for i in range(len(pano_ids)):
        for j in range(i, len(pano_ids)):
            p1, p2 = pano_ids[i], pano_ids[j]
            # Cheap bbox rejection before rasterizing.
            if i != j:
                a, b = polys[p1], polys[p2]
                if (a.max(0) < b.min(0)).any() or (b.max(0) < a.min(0)).any():
                    continue
            iou, r1, r2 = _pairwise_overlap(polys[p1], polys[p2])
            if (
                iou > MIN_LAYOUT_OVERLAP_IOU
                or r1 > MIN_LAYOUT_OVERLAP_RATIO
                or r2 > MIN_LAYOUT_OVERLAP_RATIO
            ):
                graph.add_edge(p1, p2)
    return [[*c] for c in sorted(nx.connected_components(graph))]
