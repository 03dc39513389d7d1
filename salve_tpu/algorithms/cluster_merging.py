"""Merge disjoint connected components using low-confidence cut-crossing edges.

Parity: salve/algorithms/cluster_merging.py:33 (merge_clusters) — take the
two largest CCs of the verified graph, rank the low-confidence edges that
cross between them by confidence, and greedily accept the first crossing
whose merged layout has no wall/free-space penetration. (The reference
version is partially WIP — it contains live pdb.set_trace() calls at
cluster_merging.py:176; this implementation completes the intended flow.)
"""

from __future__ import annotations

import copy
from typing import Dict, List, Optional, Set, Tuple

import networkx as nx
import numpy as np

from salve_tpu.algorithms.spanning_tree import greedily_construct_st_Sim2
from salve_tpu.geometry.polygons import determine_invalid_wall_overlap
from salve_tpu.geometry.sim2 import Sim2

MERGE_SHRINK_FACTOR = 0.40


def get_connected_components(edges) -> List[Set[int]]:
    """Connected components of the graph spanned by `edges`."""
    edges = list(edges)
    if not edges:
        return []
    G = nx.Graph()
    G.add_edges_from(edges)
    return list(nx.connected_components(G))


def merge_clusters(
    i2Si1_dict: Dict[Tuple[int, int], Sim2],
    i2Si1_dict_consistent: Dict[Tuple[int, int], Sim2],
    two_view_reports_dict,
    pano_layouts: Optional[Dict[int, np.ndarray]] = None,
    all_nodes: Optional[Set[int]] = None,
    min_conf: float = 0.0,
) -> Optional[Dict[Tuple[int, int], Sim2]]:
    """Try to join the two largest CCs with one low-confidence edge.

    Args:
        i2Si1_dict: all (low-confidence) edges.
        i2Si1_dict_consistent: verified high-confidence edges.
        two_view_reports_dict: per-edge confidence records.
        pano_layouts: pano ID -> (N,2) room vertices (pano-local frame),
            used for the wall-penetration acceptance check. If None, the
            most confident crossing is accepted unconditionally.
        all_nodes: optional full pano universe. Nodes present here (or in
            `i2Si1_dict`) but untouched by any verified edge are treated as
            singleton components, so fully-unlocalized panos can be rescued
            too — not only split clusters.
        min_conf: rescue floor — crossings whose verifier confidence is
            below this are never accepted.

    Returns:
        Augmented edge dict (copy) if a merge was accepted, else None.
    """
    ccs = sorted(get_connected_components(i2Si1_dict_consistent.keys()), key=len, reverse=True)
    covered = {p for cc in ccs for p in cc}
    universe = set(all_nodes or ()) | {p for k in i2Si1_dict for p in k}
    ccs += [{p} for p in sorted(universe - covered)]
    if len(ccs) < 2:
        return None
    cc0, cc1 = ccs[0], ccs[1]

    pano_to_cc = {}
    for cc_idx, cc in enumerate(ccs):
        for pid in cc:
            pano_to_cc[pid] = cc_idx

    skeleton_nodes = set(pano_to_cc.keys())
    crossings, confs = [], []
    for (i1, i2) in i2Si1_dict.keys():
        if i1 not in skeleton_nodes or i2 not in skeleton_nodes:
            continue
        if pano_to_cc[i1] == pano_to_cc[i2]:
            continue
        if (i1 in cc0 or i1 in cc1) and (i2 in cc0 or i2 in cc1):
            report = two_view_reports_dict.get((i1, i2))
            conf = report.confidence if report is not None else 0.0
            if conf < min_conf:
                continue
            crossings.append((i1, i2))
            confs.append(conf)

    if not crossings:
        return None

    for idx in np.argsort(-np.array(confs)):
        crossing = crossings[idx]
        merged = copy.deepcopy(i2Si1_dict_consistent)
        merged[crossing] = i2Si1_dict[crossing]

        wSi_list = greedily_construct_st_Sim2(merged, verbose=False)
        if wSi_list is None:
            continue

        if pano_layouts is None:
            return merged

        # Reject merges that drive one cluster's walls through the other's.
        penetrates = False
        for p1 in cc0:
            if penetrates:
                break
            for p2 in cc1:
                if (
                    p1 >= len(wSi_list)
                    or p2 >= len(wSi_list)
                    or wSi_list[p1] is None
                    or wSi_list[p2] is None
                    or p1 not in pano_layouts
                    or p2 not in pano_layouts
                ):
                    continue
                verts1 = wSi_list[p1].transform_from(pano_layouts[p1])
                verts2 = wSi_list[p2].transform_from(pano_layouts[p2])
                # Note: despite the name, the predicate returns is_valid
                # (True = no violations), matching the reference's API.
                is_valid = determine_invalid_wall_overlap(
                    verts1, verts2, shrink_factor=MERGE_SHRINK_FACTOR
                )
                if not is_valid:
                    penetrates = True
                    break
        if not penetrates:
            return merged

    return None
