"""Tests for batched RANSAC Sim(3) pose-graph alignment.

Fixtures ported from the reference's GTSFM-backed test
(tests/utils/test_ransac.py in zillow/salve).
"""

import copy

import numpy as np

from salve_tpu.algorithms.pose_alignment import ransac_align_poses_sim3_ignore_missing
from salve_tpu.geometry.poses import Pose3


def _pose(R, t):
    return Pose3(np.asarray(R, dtype=np.float64), np.asarray(t, dtype=np.float64))


def test_pure_identity_alignment() -> None:
    """Aligning a pose graph to itself returns it unchanged."""
    aTi_list = [
        _pose([[0.771176, -0.636622, 0], [0.636622, 0.771176, 0], [0, 0, 1]], [6.94918, 2.4749, 0]),
        _pose([[0.124104, -0.992269, 0], [0.992269, 0.124104, 0], [0, 0, 1]], [6.06848, 4.57841, 0]),
        _pose([[0.914145, 0.405387, 0], [-0.405387, 0.914145, 0], [0, 0, 1]], [6.47869, 5.29594, 0]),
        _pose([[0.105365, -0.994434, 0], [0.994434, 0.105365, 0], [0, 0, 1]], [5.59441, 5.22469, 0]),
        _pose([[-0.991652, -0.12894, 0], [0.12894, -0.991652, 0], [0, 0, 1]], [7.21399, 5.41445, 0]),
    ]
    aTi_list = aTi_list + aTi_list
    bTi_list = copy.deepcopy(aTi_list)

    aligned, aSb = ransac_align_poses_sim3_ignore_missing(aTi_list, bTi_list)
    for aTi, aTi_ in zip(aTi_list, aligned):
        assert np.allclose(aTi.R, aTi_.R, atol=1e-3)
        assert np.allclose(aTi.t, aTi_.t, atol=1e-3)


def test_outlier_rejected() -> None:
    """A pose with massive translation error is excluded by RANSAC."""
    I = np.eye(3)
    aTi_list = [
        None,
        _pose(I, [50, 0, 0]),
        _pose(I, [0, 10, 0]),
        _pose(I, [0, 0, 20]),
        None,
    ]
    bTi_list = [
        None,
        _pose(I, [50.1, 0, 0]),
        _pose(I, [0, 9.9, 0]),
        _pose(I, [0, 0, 2000]),  # outlier
        None,
    ]
    aligned, aSb = ransac_align_poses_sim3_ignore_missing(aTi_list, bTi_list)
    assert np.isclose(aSb.s, 1.0, atol=1e-2)
    # The two clean poses land close to their GT positions (the reference's
    # expected values to ~0.1; exact values differ by RANSAC subset choice).
    assert np.allclose(aligned[1].t[:2], [50.0, 0.0], atol=0.15)
    assert np.allclose(aligned[2].t[:2], [0.0, 9.9], atol=0.15)
    assert aligned[0] is None and aligned[4] is None
