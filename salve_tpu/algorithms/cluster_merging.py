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


def count_composite_violations(
    wSi_list, pano_layouts: Dict[int, np.ndarray]
) -> List[Tuple[int, int]]:
    """Pano pairs whose composed placements drive walls through freespace.

    The edge-local penetration check runs in Stage A (hypotheses with
    wall-in-freespace violations are pruned before export), so any single
    accepted edge looks locally fine — but a wrong-rotation family places a
    whole wing through another wing, which only the COMPOSITE placement
    reveals. Same predicate/shrink as the rescue gate.
    """
    out: List[Tuple[int, int]] = []
    ids = [
        i
        for i in range(len(wSi_list))
        if wSi_list[i] is not None and i in pano_layouts
    ]
    verts = {i: wSi_list[i].transform_from(pano_layouts[i]) for i in ids}
    for a_idx, p in enumerate(ids):
        for q in ids[a_idx + 1:]:
            if not determine_invalid_wall_overlap(
                verts[p], verts[q], shrink_factor=MERGE_SHRINK_FACTOR
            ):
                out.append((p, q))
    return out


def _sim2_rel_diff(wSa: Sim2, wSb: Sim2, bSa_meas: Sim2) -> Tuple[float, float]:
    """(rot deg, trans) gap between composite-implied bSa and a measured one."""
    implied = wSb.inverse().compose(wSa)
    dR = np.asarray(implied.rotation) @ np.asarray(bSa_meas.rotation).T
    rot = abs(float(np.degrees(np.arctan2(dR[1, 0], dR[0, 0]))))
    t = float(
        np.linalg.norm(
            np.asarray(implied.translation) - np.asarray(bSa_meas.translation)
        )
    )
    return rot, t


def pool_support(
    wSi_list,
    pool_i2Si1: Dict[Tuple[int, int], Sim2],
    rot_tol_deg: float = 10.0,
    trans_tol: float = 0.35,
) -> int:
    """How many pool measurements the composite placement explains.

    RANSAC-style inlier count: a correct wing placement is corroborated by
    many sub-threshold positives (every other W/D/O pairing the verifier
    liked a little), while a wrong-rotation family is supported only by its
    own members — the physical tiebreak when wall penetration is silent
    (the wrong wing lands in empty space instead of through a wall).
    """
    n = 0
    for (i1, i2), s in pool_i2Si1.items():
        if (
            i1 < len(wSi_list)
            and i2 < len(wSi_list)
            and wSi_list[i1] is not None
            and wSi_list[i2] is not None
        ):
            rot, t = _sim2_rel_diff(wSi_list[i1], wSi_list[i2], s)
            if rot < rot_tol_deg and t < trans_tol:
                n += 1
    return n


def resolve_penetration_conflicts(
    i2Si1_dict: Dict[Tuple[int, int], Sim2],
    two_view_reports_dict,
    pano_layouts: Dict[int, np.ndarray],
    rescue_pool_i2Si1: Dict[Tuple[int, int], Sim2],
    rescue_pool_reports,
    all_nodes: Optional[Set[int]] = None,
    min_conf: float = 0.5,
    max_rounds: int = 4,
) -> Tuple[Dict[Tuple[int, int], Sim2], List[Tuple[int, int]]]:
    """Resolve contested wing attachments among the ACCEPTED edges.

    The target failure mode (ACCURACY_r04 forensics_0038): a wing's
    position is contested — several mutually-consistent exactly-90-deg
    false-positive door pairings (p up to 0.9987) fight the true edges.
    GLC cannot reject the family (its members agree with each other),
    confidence cannot (they are confident), and wall penetration alone is
    not always triggered (the wrong placement may land in empty space).

    For every spanning-tree partition (A, B) of the accepted graph, the
    crossing edges are clustered by the placement of B they imply; when
    more than one cluster exists (a genuine geometric CONTEST) — or the
    composite has wall-penetration violations straddling the cut — each
    cluster seeds a candidate: keep that cluster's edges, drop the rest of
    the cut, let the penetration-gated rescue re-attach whatever splits.
    Candidates (and the unmodified baseline) are scored lexicographically
    by (fewer composite wall violations, more panos localized, more
    RANSAC-style pool support); a candidate must strictly beat the
    baseline to be applied. Iterates a bounded number of rounds.

    Returns (possibly pruned copy, removed edges). Role parity:
    cycle/consistency filtering (salve/algorithms/cycle_consistency.py:225)
    — rejecting confident-but-wrong edge families before optimization.
    """

    def _rescued_score(edge_dict):
        cur = dict(edge_dict)
        while True:
            merged = merge_clusters(
                rescue_pool_i2Si1, cur, rescue_pool_reports,
                pano_layouts=pano_layouts, all_nodes=all_nodes,
                min_conf=min_conf,
            )
            if merged is None:
                break
            cur = merged
        wSi = greedily_construct_st_Sim2(cur, verbose=False)
        if wSi is None:
            return None
        viol = count_composite_violations(wSi, pano_layouts)
        n_loc = sum(1 for s in wSi if s is not None)
        support = pool_support(wSi, rescue_pool_i2Si1)
        return (len(viol), -n_loc, -support)

    def _chain_poses(nodes: Set[int], edges: Dict, origin: int):
        """{node: originSnode} over the subgraph, or {} if origin missing."""
        sub = nx.Graph()
        sub.add_nodes_from(nodes)
        sub.add_edges_from(e for e in edges if e[0] in nodes and e[1] in nodes)
        if origin not in sub:
            return {}
        out = {origin: Sim2.identity()}
        for node, path in nx.single_source_shortest_path(sub, origin).items():
            if node == origin:
                continue
            s = Sim2.identity()
            for a, b in zip(path[:-1], path[1:]):
                step = (
                    edges[(a, b)].inverse() if a < b else edges[(b, a)]
                )  # aSb
                s = s.compose(step)
            out[node] = s  # originSnode
        return out

    removed: List[Tuple[int, int]] = []
    current = dict(i2Si1_dict)
    for _ in range(max_rounds):
        base_score = _rescued_score(current)
        if base_score is None:
            break
        wSi_main = greedily_construct_st_Sim2(current, verbose=False)
        viol_main = count_composite_violations(wSi_main, pano_layouts)

        G = nx.Graph()
        G.add_edges_from(current.keys())
        main_cc = max(nx.connected_components(G), key=len)
        T = nx.minimum_spanning_tree(G.subgraph(main_cc))

        # Candidate partitions: every spanning-tree edge cut, PLUS every
        # node-attachment cut (B = the node + whatever dangles off it when
        # it is removed) — the tree is arbitrary and can nest an innocent
        # neighbor under the contested node, hiding the clean cut whose
        # crossing edges are exactly the competing attachment families.
        partitions = []
        for te in T.edges():
            T2 = T.copy()
            T2.remove_edge(*te)
            pa, pb = list(nx.connected_components(T2))
            partitions.append((pa, pb))
        Gm = G.subgraph(main_cc)
        for v in main_cc:
            rest = Gm.copy()
            rest.remove_node(v)
            comps = sorted(nx.connected_components(rest), key=len, reverse=True)
            if not comps:
                continue
            comp_b = {v}
            for c in comps[1:]:
                comp_b |= c
            partitions.append((set(comps[0]), comp_b))

        trials: List[Tuple[float, List[Tuple[int, int]]]] = []  # (rank, drop)
        seen_cuts = set()
        for comp_a, comp_b in partitions:
            if len(comp_b) > len(comp_a):
                comp_a, comp_b = comp_b, comp_a
            cross = tuple(sorted(
                e for e in current
                if (e[0] in comp_a and e[1] in comp_b)
                or (e[0] in comp_b and e[1] in comp_a)
            ))
            if not cross or cross in seen_cuts:
                continue
            seen_cuts.add(cross)
            straddles_viol = any(
                (p in comp_a and q in comp_b) or (p in comp_b and q in comp_a)
                for p, q in viol_main
            )

            # Cluster cross edges by the placement of side B they imply.
            # CRITICAL: side A's poses come from an ST over A-INTERNAL edges
            # only — using the full main ST would route some A nodes through
            # the contested wing itself, making the conflicting families
            # look mutually consistent (the exact blindness this resolver
            # exists to fix).
            clusters: List[List[Tuple[int, int]]] = []
            if len(cross) >= 2:
                b0 = min(comp_b)
                b_rel = _chain_poses(comp_b, current, b0)  # b0Snode
                a_rel = _chain_poses(comp_a, current, min(comp_a))  # a0Snode
                placements = []
                for e in cross:
                    p, q = e
                    a_node, b_node = (p, q) if p in comp_a else (q, p)
                    if a_node not in a_rel or b_node not in b_rel:
                        placements.append(None)
                        continue
                    # aSb: pose of b in a's frame (keys store maxSmin).
                    if a_node < b_node:
                        aSb = current[e].inverse()  # (bSa)^-1
                    else:
                        aSb = current[e]  # key (b,a): aSb directly
                    wSb = a_rel[a_node].compose(aSb)
                    wSb0 = wSb.compose(b_rel[b_node].inverse())
                    placements.append(wSb0)
                for k, e in enumerate(cross):
                    if placements[k] is None:
                        continue
                    placed = False
                    for cl in clusters:
                        ref = placements[cross.index(cl[0])]
                        dR = np.asarray(placements[k].rotation) @ np.asarray(
                            ref.rotation
                        ).T
                        rot = abs(float(np.degrees(np.arctan2(dR[1, 0], dR[0, 0]))))
                        t = float(np.linalg.norm(
                            np.asarray(placements[k].translation)
                            - np.asarray(ref.translation)
                        ))
                        if rot < 10.0 and t < 0.35:
                            cl.append(e)
                            placed = True
                            break
                    if not placed:
                        clusters.append([e])

            contested = len(clusters) > 1
            if not contested and not straddles_viol:
                continue
            # Candidate trials: keep one cluster, drop the rest of the cut;
            # plus (when violations straddle) dropping the whole cut. Edges
            # whose implied placement could not be computed (disconnected
            # sub-sides) are never dropped by a cluster trial.
            if contested:
                clustered = {e for cl in clusters for e in cl}
                for cl in clusters:
                    drop = [e for e in cross if e in clustered and e not in cl]
                    if drop:
                        trials.append((len(drop), drop))
            if straddles_viol:
                trials.append((len(cross), list(cross)))

        best = None  # (score, drop)
        for _rank, drop in sorted(trials, key=lambda t: t[0]):
            trial = {e: s for e, s in current.items() if e not in set(drop)}
            if not trial:
                continue
            score = _rescued_score(trial)
            if score is None:
                continue
            if score < base_score and (best is None or score < best[0]):
                best = (score, drop)
        if best is None:
            break
        current = {e: s for e, s in current.items() if e not in set(best[1])}
        removed.extend(best[1])
    return current, removed


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
