"""Tests for the JAX Pose(2) SLAM solver.

Numeric fixtures are the reference's GTSAM-validated cases
(tests/algorithms/test_pose2_slam.py in zillow/salve, themselves ported
from GTSAM's Pose2SLAMExample) — the JAX LM solver must reproduce them.
"""

import math

import numpy as np

from salve_tpu.algorithms import pose2_slam
from salve_tpu.algorithms.pose2_slam import (
    BearingRangeMeasurement,
    OdometryMeasurement,
)
from salve_tpu.geometry.pose2 import Pose2


def test_planar_slam_pgo_only() -> None:
    """5-pose square with loop closure + 1 unknown camera (PGO only)."""
    wTi_list_init = [
        None,
        Pose2(0.5, 0.0, 0.2),
        Pose2(2.3, 0.1, -0.2),
        Pose2(4.1, 0.1, math.pi / 2),
        Pose2(4.0, 2.0, math.pi),
        Pose2(2.1, 2.1, -math.pi / 2),
    ]
    i2Ti1_measurements = [
        OdometryMeasurement(i1=1, i2=2, i2Ti1=Pose2(2, 0, 0).inverse()),
        OdometryMeasurement(i1=2, i2=3, i2Ti1=Pose2(2, 0, math.pi / 2).inverse()),
        OdometryMeasurement(i1=3, i2=4, i2Ti1=Pose2(2, 0, math.pi / 2).inverse()),
        OdometryMeasurement(i1=4, i2=5, i2Ti1=Pose2(2, 0, math.pi / 2).inverse()),
        OdometryMeasurement(i1=2, i2=5, i2Ti1=Pose2(2, 0, math.pi / 2)),
    ]

    wTi_list, landmark_positions = pose2_slam.planar_slam(
        wTi_list_init,
        i2Ti1_measurements,
        landmark_positions_init={},
        landmark_measurements=[],
        optimize_poses_only=True,
        use_robust=False,
    )

    expected = [
        None,
        Pose2(0, 0, 0),
        Pose2(2, 0, 0),
        Pose2(4, 0, math.pi / 2),
        Pose2(4, 2, math.pi),
        Pose2(2, 2, -math.pi / 2),
    ]
    for wTi, wTi_exp in zip(wTi_list, expected):
        if wTi_exp is None:
            assert wTi is None
            continue
        assert np.isclose(
            np.sin(wTi.theta - wTi_exp.theta), 0.0, atol=1e-6
        ), (wTi, wTi_exp)
        assert np.allclose(wTi.translation(), wTi_exp.translation(), atol=1e-6)
    assert landmark_positions == {}


def test_planar_slam_with_landmarks() -> None:
    """3 poses + 2 landmarks, bearing-range measurements."""
    wTi_list_init = [
        None,
        Pose2(-0.25, 0.20, 0.15),
        Pose2(2.30, 0.10, -0.20),
        Pose2(4.10, 0.10, 0.10),
    ]
    i2Ti1_measurements = [
        OdometryMeasurement(i1=1, i2=2, i2Ti1=Pose2(-2.0, 0.0, 0.0)),
        OdometryMeasurement(i1=2, i2=3, i2Ti1=Pose2(-2.0, 0.0, 0.0)),
    ]
    landmark_positions_init = {
        1: np.array([1.80, 2.10]),
        2: np.array([4.10, 1.80]),
    }
    landmark_measurements = [
        BearingRangeMeasurement(pano_id=1, l_idx=1, bearing_deg=45, range=np.sqrt(8.0)),
        BearingRangeMeasurement(pano_id=2, l_idx=1, bearing_deg=90, range=2),
        BearingRangeMeasurement(pano_id=3, l_idx=2, bearing_deg=90, range=2),
    ]
    wTi_list, landmark_positions = pose2_slam.planar_slam(
        wTi_list_init,
        i2Ti1_measurements,
        landmark_positions_init,
        landmark_measurements,
        optimize_poses_only=False,
    )

    expected_wTi = [None, Pose2(0, 0, 0), Pose2(2, 0, 0), Pose2(4, 0, 0)]
    for wTi, wTi_exp in zip(wTi_list, expected_wTi):
        if wTi_exp is None:
            assert wTi is None
            continue
        assert np.isclose(np.sin(wTi.theta - wTi_exp.theta), 0.0, atol=1e-6)
        assert np.allclose(wTi.translation(), wTi_exp.translation(), atol=1e-6)

    expected_lms = {1: np.array([2.0, 2.0]), 2: np.array([4.0, 2.0])}
    assert expected_lms.keys() == landmark_positions.keys()
    for k in expected_lms:
        assert np.allclose(landmark_positions[k], expected_lms[k], atol=1e-6)


def test_measurement_beyond_init_list_is_ignored() -> None:
    """Edge-filtering stages (cycle / global-local consistency) can leave
    measurements referencing panos beyond the spanning tree's pose list —
    they must be dropped, not crash with IndexError."""
    wTi_list_init = [Pose2(0.0, 0.0, 0.0), Pose2(2.1, 0.0, 0.0)]
    i2Ti1_measurements = [
        OdometryMeasurement(i1=0, i2=1, i2Ti1=Pose2(2.0, 0.0, 0.0).inverse()),
        # Pano 7 does not exist in the init list.
        OdometryMeasurement(i1=1, i2=7, i2Ti1=Pose2(2.0, 0.0, 0.0).inverse()),
    ]
    wTi_list, _ = pose2_slam.planar_slam(
        wTi_list_init, i2Ti1_measurements,
        landmark_positions_init={}, landmark_measurements=[],
        optimize_poses_only=True, use_robust=False,
    )
    assert len(wTi_list) == 2
    assert abs(wTi_list[1].x - 2.0) < 0.1


def test_all_unlocalized() -> None:
    wTi_list, lms = pose2_slam.planar_slam([None, None], [], {}, [], True)
    assert wTi_list == [None, None]


def test_execute_planar_slam_pgo() -> None:
    """Sim2-level wrapper: noisy ST init is snapped to consistent solution."""
    from types import SimpleNamespace

    from salve_tpu.geometry.sim2 import Sim2

    wSi_list = [
        Sim2.from_theta_deg(5.0, np.array([0.1, -0.1])),
        Sim2.from_theta_deg(-3.0, np.array([2.1, 0.2])),
        None,
    ]
    # One edge: i2Si1 with i1=0, i2=1; true relative pose: translation (-2, 0).
    m = SimpleNamespace(i1=0, i2=1, i2Si1=Sim2.from_theta_deg(0.0, np.array([-2.0, 0.0])))
    wSi_opt = pose2_slam.execute_planar_slam([m], wSi_list)
    assert wSi_opt[2] is None
    # Origin pose pulled toward identity by prior; relative pose respected.
    rel = wSi_opt[1].inverse().compose(wSi_opt[0])
    assert np.allclose(rel.translation, [-2.0, 0.0], atol=0.05)
    assert abs(rel.theta_deg) < 2.0
