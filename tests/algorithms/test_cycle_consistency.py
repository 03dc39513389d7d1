"""Tests for cycle-consistency filtering."""

import numpy as np

from salve_tpu.algorithms import cycle_consistency
from salve_tpu.common.two_view_estimation_report import TwoViewEstimationReport
from salve_tpu.geometry.rotations import rotmat2d
from salve_tpu.geometry.sim2 import Sim2


def _sim2(theta_deg, tx, ty):
    return Sim2.from_theta_deg(theta_deg, np.array([tx, ty]))


class TestExtractTriplets:
    def test_one_triplet(self) -> None:
        edges = {(0, 1): 1, (1, 2): 1, (0, 2): 1, (2, 3): 1}
        triplets = cycle_consistency.extract_triplets(edges)
        assert triplets == [(0, 1, 2)]

    def test_none_edges_skipped(self) -> None:
        edges = {(0, 1): 1, (1, 2): 1, (0, 2): None}
        assert cycle_consistency.extract_triplets(edges) == []


class TestSE2CycleError:
    def test_perfect_cycle_zero_error(self) -> None:
        """Consistent poses compose to identity around the cycle."""
        wS = [_sim2(0, 0, 0), _sim2(90, 2, 0), _sim2(-45, 2, 2)]
        i2Si1_dict = {}
        for (i1, i2) in [(0, 1), (1, 2), (0, 2)]:
            i2Si1_dict[(i1, i2)] = wS[i2].inverse().compose(wS[i1])
        rot_err, trans_err = cycle_consistency.compute_SE2_cycle_error(
            i2Si1_dict, (0, 1, 2)
        )
        assert rot_err < 1e-4
        assert trans_err < 1e-4

    def test_corrupted_cycle_nonzero_error(self) -> None:
        wS = [_sim2(0, 0, 0), _sim2(90, 2, 0), _sim2(-45, 2, 2)]
        i2Si1_dict = {
            (0, 1): wS[1].inverse().compose(wS[0]),
            (1, 2): wS[2].inverse().compose(wS[1]),
            (0, 2): _sim2(30, 5, 5),  # bogus
        }
        rot_err, trans_err = cycle_consistency.compute_SE2_cycle_error(
            i2Si1_dict, (0, 1, 2)
        )
        assert rot_err > 10
        assert trans_err > 1


class TestFilterSE2:
    def test_keeps_consistent_drops_isolated(self) -> None:
        wS = [_sim2(0, 0, 0), _sim2(90, 2, 0), _sim2(-45, 2, 2), _sim2(10, 9, 9)]
        i2Si1_dict = {}
        for (i1, i2) in [(0, 1), (1, 2), (0, 2)]:
            i2Si1_dict[(i1, i2)] = wS[i2].inverse().compose(wS[i1])
        # Edge (2,3) participates in no triplet -> dropped.
        i2Si1_dict[(2, 3)] = wS[3].inverse().compose(wS[2])

        kept = cycle_consistency.filter_to_SE2_cycle_consistent_edges(i2Si1_dict)
        assert set(kept.keys()) == {(0, 1), (1, 2), (0, 2)}

    def test_inconsistent_triplet_dropped(self) -> None:
        i2Si1_dict = {
            (0, 1): _sim2(0, 2, 0),
            (1, 2): _sim2(0, 2, 0),
            (0, 2): _sim2(45, 1, 1),  # breaks the cycle
        }
        kept = cycle_consistency.filter_to_SE2_cycle_consistent_edges(i2Si1_dict)
        assert kept == {}


class TestRotCycleFiltering:
    def test_rotation_filter_and_accuracy(self) -> None:
        wR = [rotmat2d(a) for a in [0, 90, -45]]
        i2Ri1_dict = {
            (i1, i2): wR[i2].T @ wR[i1] for (i1, i2) in [(0, 1), (1, 2), (0, 2)]
        }
        # Add a bogus edge in no triplet.
        i2Ri1_dict[(2, 5)] = rotmat2d(33)
        kept, _ = cycle_consistency.filter_to_rotation_cycle_consistent_edges(i2Ri1_dict)
        assert set(kept.keys()) == {(0, 1), (1, 2), (0, 2)}

        reports = {
            e: TwoViewEstimationReport(gt_class=1) for e in [(0, 1), (1, 2), (0, 2)]
        }
        acc = cycle_consistency.estimate_rot_cycle_filtering_classification_acc(
            i2Ri1_dict, kept, reports
        )
        assert acc == 1.0
