"""Tests for global/local rotation-consistency filtering."""

import numpy as np

from salve_tpu.algorithms import global_local_consistency as glc
from salve_tpu.geometry.rotations import rotmat2d
from salve_tpu.geometry.sim2 import Sim2


def _sim2(theta_deg, tx=0.0, ty=0.0):
    return Sim2.from_theta_deg(theta_deg, np.array([tx, ty]))


class TestFilterToAbsoluteRotations:
    def test_consistent_kept_outlier_dropped(self) -> None:
        wR = [rotmat2d(a) for a in [0, 30, 60]]
        i2Ri1_dict = {
            (0, 1): wR[1].T @ wR[0],
            (1, 2): wR[2].T @ wR[1],
            (0, 2): rotmat2d(45),  # outlier: true relative is -60
        }
        kept = glc.filter_measurements_to_absolute_rotations(
            wR, i2Ri1_dict, max_allowed_deviation_deg=5.0
        )
        assert set(kept.keys()) == {(0, 1), (1, 2)}


class TestFilterByGlobalLocalConsistency:
    def test_end_to_end(self) -> None:
        """Many consistent edges + one outlier; averaging exposes the outlier."""
        angles = [0, 20, 40, 60, 80]
        wS = [_sim2(a) for a in angles]
        i2Si1_dict = {}
        for i in range(5):
            for j in range(i + 1, 5):
                i2Si1_dict[(i, j)] = wS[j].inverse().compose(wS[i])
        # Overwrite one edge with a moderate outlier (true value is -80 deg).
        # Averaging is least-squares (non-robust, like Shonan), so the
        # outlier's own deviation stays large while the contamination it
        # spreads to other edges stays under the 5-degree gate.
        i2Si1_dict[(0, 4)] = _sim2(-60)

        kept = glc.filter_measurements_by_global_local_consistency(dict(i2Si1_dict))
        assert (0, 4) not in kept
        assert len(kept) == len(i2Si1_dict) - 1

    def test_consistency_fraction(self) -> None:
        wS = [_sim2(0), _sim2(90)]
        i2Si1_dict = {(0, 1): wS[1].inverse().compose(wS[0])}
        frac = glc.compute_edge_consistency_fraction(
            wS, i2Si1_dict, max_allowed_deviation_deg=5.0
        )
        assert frac == 1.0
