"""Cluster merging via low-confidence crossings (parity: cluster_merging.py:33)."""

import numpy as np

from salve_tpu.algorithms.cluster_merging import get_connected_components, merge_clusters
from salve_tpu.common.two_view_estimation_report import TwoViewEstimationReport
from salve_tpu.geometry.sim2 import Sim2


def _s2(tx, ty, theta=0.0):
    return Sim2.from_theta_deg(theta, np.array([tx, ty]), 1.0)


def test_get_connected_components():
    ccs = get_connected_components([(0, 1), (1, 2), (5, 6)])
    assert sorted(map(sorted, ccs)) == [[0, 1, 2], [5, 6]]


def test_merge_joins_two_components_with_most_confident_crossing():
    consistent = {(0, 1): _s2(1, 0), (2, 3): _s2(1, 0)}
    low_conf = dict(consistent)
    low_conf[(1, 2)] = _s2(0, 1)
    low_conf[(0, 3)] = _s2(2, 2)
    reports = {
        (1, 2): TwoViewEstimationReport(gt_class=1, confidence=0.9),
        (0, 3): TwoViewEstimationReport(gt_class=0, confidence=0.4),
    }
    merged = merge_clusters(low_conf, consistent, reports)
    assert merged is not None
    assert (1, 2) in merged and (0, 3) not in merged
    # Original dict untouched (copy semantics).
    assert (1, 2) not in consistent


def test_merge_returns_none_when_single_component():
    consistent = {(0, 1): _s2(1, 0), (1, 2): _s2(1, 0)}
    merged = merge_clusters(dict(consistent), consistent, {})
    assert merged is None


def test_merge_returns_none_without_crossing_edges():
    consistent = {(0, 1): _s2(1, 0), (2, 3): _s2(1, 0)}
    merged = merge_clusters(dict(consistent), consistent, {})
    assert merged is None


def test_merge_respects_min_conf_floor():
    consistent = {(0, 1): _s2(1, 0), (2, 3): _s2(1, 0)}
    low_conf = dict(consistent)
    low_conf[(1, 2)] = _s2(0, 1)
    reports = {(1, 2): TwoViewEstimationReport(gt_class=1, confidence=0.45)}
    assert merge_clusters(low_conf, consistent, reports, min_conf=0.5) is None
    merged = merge_clusters(low_conf, consistent, reports, min_conf=0.4)
    assert merged is not None and (1, 2) in merged


def test_merge_rescues_stranded_singleton_pano():
    """A pano with every verified edge rejected is a singleton component and
    can still be pulled in through `all_nodes` (0010 forensics: panos whose
    only connections run through one hub get stranded by verifier FNs)."""
    consistent = {(0, 1): _s2(1, 0), (1, 2): _s2(1, 0)}
    low_conf = dict(consistent)
    low_conf[(2, 3)] = _s2(0, 1)  # pano 3 appears in no verified edge
    reports = {(2, 3): TwoViewEstimationReport(gt_class=1, confidence=0.8)}
    # Without the node universe the singleton is invisible -> no merge.
    assert merge_clusters(low_conf, consistent, reports) is not None  # via edge key
    # Remove the crossing from low_conf keys' implicit universe by passing
    # all_nodes explicitly: panos {0,1,2,3} with 3 uncovered.
    merged = merge_clusters(
        low_conf, consistent, reports, all_nodes={0, 1, 2, 3}
    )
    assert merged is not None and (2, 3) in merged


def test_iterated_merge_joins_three_components():
    """Iterating merge_clusters (the run_sfm rescue loop) heals >2 splits."""
    consistent = {(0, 1): _s2(1, 0), (2, 3): _s2(1, 0), (4, 5): _s2(1, 0)}
    low_conf = dict(consistent)
    low_conf[(1, 2)] = _s2(0, 1)
    low_conf[(3, 4)] = _s2(0, 1)
    reports = {
        (1, 2): TwoViewEstimationReport(gt_class=1, confidence=0.9),
        (3, 4): TwoViewEstimationReport(gt_class=1, confidence=0.8),
    }
    cur = consistent
    added = []
    while True:
        merged = merge_clusters(low_conf, cur, reports)
        if merged is None:
            break
        added += sorted(set(merged) - set(cur))
        cur = merged
    assert added == [(1, 2), (3, 4)]
    assert len(get_connected_components(cur.keys())) == 1


def test_merge_rejects_crossing_that_penetrates_walls():
    """With layouts given, a merge overlaying both rooms exactly is rejected."""
    square = np.array([[-1.0, -1.0], [1.0, -1.0], [1.0, 1.0], [-1.0, 1.0]])
    consistent = {(0, 1): _s2(5, 0), (2, 3): _s2(5, 0)}
    low_conf = dict(consistent)
    # Half-overlap crossing: pano 2's room shifted one half-width into pano
    # 1's -> each room's walls cut through the other's freespace -> reject.
    # (A full identity overlay would be ACCEPTED: same-room alignments
    # legitimately overlap, salve/utils/overlap_utils.py:85-88.)
    low_conf[(1, 2)] = _s2(1.0, 0.0)
    reports = {(1, 2): TwoViewEstimationReport(gt_class=0, confidence=0.99)}
    layouts = {i: square for i in range(4)}
    merged = merge_clusters(low_conf, consistent, reports, pano_layouts=layouts)
    assert merged is None


class TestResolvePenetrationConflicts:
    """Contested wing attachment (the 0038 mode): a node held by two
    mutually-exclusive high-confidence edge families must keep the family
    the physical evidence supports (composite wall penetration first, then
    RANSAC-style pool support), with the rescue re-attaching anything the
    cut splits off."""

    def _scene(self, bad_t, bad_deg):
        """4 panos in a row of 4x4 rooms at x=0,4,8,12; edge keys store
        maxSmin. The bad edge (0,3) places pano 3 at `bad_t` rotated
        `bad_deg` instead of (12,0)."""
        import types

        from salve_tpu.geometry.sim2 import Sim2

        def pose(t, deg=0.0):
            th = np.radians(deg)
            R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
            return Sim2(R, np.asarray(t, dtype=float), 1.0)

        wS = [pose((0, 0)), pose((4, 0)), pose((8, 0)), pose((12, 0))]
        layouts = {
            i: np.array([[-2.0, -2.0], [2.0, -2.0], [2.0, 2.0], [-2.0, 2.0]])
            for i in range(4)
        }

        def rel(i2, i1, wSi1=None):  # i2Si1
            return wS[i2].inverse().compose(wSi1 if wSi1 is not None else wS[i1])

        wS3_bad = pose(bad_t, bad_deg)
        accepted = {
            (0, 1): rel(1, 0),
            (1, 2): rel(2, 1),
            (0, 2): rel(2, 0),
            (2, 3): rel(3, 2),                       # true family
            (0, 3): wS3_bad.inverse().compose(wS[0]),  # bad family: 3S0 wrong
        }
        # key (0,3) must store 3S0 = wS3^-1 wS0 — with pano 3 BAD-placed,
        # the measured 3S0 equals wS3_bad^-1 wS0.
        pool = dict(accepted)
        pool[(1, 3)] = rel(3, 1)  # extra sub-threshold TRUE support
        reports = {
            e: types.SimpleNamespace(confidence=0.99) for e in pool
        }
        return accepted, pool, reports, layouts

    def _run(self, bad_t, bad_deg):
        from salve_tpu.algorithms.cluster_merging import (
            resolve_penetration_conflicts,
        )

        accepted, pool, reports, layouts = self._scene(bad_t, bad_deg)
        pruned, removed = resolve_penetration_conflicts(
            accepted, reports, layouts,
            rescue_pool_i2Si1=pool, rescue_pool_reports=reports,
            all_nodes={0, 1, 2, 3}, min_conf=0.5,
        )
        return pruned, removed

    def test_drops_penetrating_family(self):
        # Bad placement right on top of room 1: composite wall penetration.
        pruned, removed = self._run(bad_t=(4.0, 0.5), bad_deg=90.0)
        assert removed == [(0, 3)]
        assert (2, 3) in pruned

    def test_drops_empty_space_family_by_pool_support(self):
        # Bad placement in empty space (no penetration): decided by pool
        # support — (2,3) accepted + (1,3) sub-threshold agree with the
        # true placement, only (0,3) with the bad one.
        pruned, removed = self._run(bad_t=(0.0, -7.0), bad_deg=90.0)
        assert removed == [(0, 3)]
        assert (2, 3) in pruned

    def test_clean_graph_untouched(self):
        import types

        from salve_tpu.algorithms.cluster_merging import (
            resolve_penetration_conflicts,
        )

        accepted, pool, reports, layouts = self._scene((12.0, 0.0), 0.0)
        # make the "bad" edge actually true -> no contest
        pruned, removed = resolve_penetration_conflicts(
            accepted, reports, layouts,
            rescue_pool_i2Si1=pool, rescue_pool_reports=reports,
            all_nodes={0, 1, 2, 3}, min_conf=0.5,
        )
        assert removed == []
        assert pruned == accepted
