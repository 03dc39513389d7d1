"""Tests for spanning-tree pose initialization (reference numeric fixtures)."""

from types import SimpleNamespace
from typing import Dict, List, Tuple

import numpy as np

from salve_tpu.algorithms import spanning_tree
from salve_tpu.algorithms.rotation_averaging import globalaveraging2d
from salve_tpu.geometry.pose2 import Pose2
from salve_tpu.geometry.rotations import rotmat2d, rotmat2theta_deg
from salve_tpu.geometry.sim2 import Sim2


def _create_synthetic_relative_pose_measurements(wRi_list_gt, edges):
    return {(i1, i2): wRi_list_gt[i2].T @ wRi_list_gt[i1] for (i1, i2) in edges}


def _get_ordered_chain_pose_data():
    wRi_list_gt = [rotmat2d(a) for a in [0, 90, 0, 0, 90]]
    edges = [(0, 1), (1, 2), (2, 3), (3, 4)]
    return (
        _create_synthetic_relative_pose_measurements(wRi_list_gt, edges),
        [0, 90, 0, 0, 90],
    )


def _get_mixed_order_chain_pose_data():
    wRi_list_gt = [rotmat2d(a) for a in [0, 90, 90, 0, 0]]
    edges = [(1, 4), (1, 3), (0, 3), (0, 2)]
    return (
        _create_synthetic_relative_pose_measurements(wRi_list_gt, edges),
        [0, 90, 90, 0, 0],
    )


def _wrap_angles(angles: np.ndarray) -> np.ndarray:
    return (angles + 180) % 360 - 180


class TestGreedyST:
    def test_ordered_chain(self) -> None:
        i2Ri1_dict, expected = _get_ordered_chain_pose_data()
        wRi_list = spanning_tree.greedily_construct_st(i2Ri1_dict)
        est = [rotmat2theta_deg(wRi) for wRi in wRi_list]
        assert np.allclose(est, expected)

    def test_mixed_order_chain(self) -> None:
        i2Ri1_dict, expected = _get_mixed_order_chain_pose_data()
        wRi_list = spanning_tree.greedily_construct_st(i2Ri1_dict)
        est = [rotmat2theta_deg(wRi) for wRi in wRi_list]
        assert np.allclose(est, expected)

    def test_sim2_chain(self) -> None:
        # Two nodes with a known relative pose.
        i2Si1_dict = {(0, 1): Sim2.from_theta_deg(90.0, np.array([1.0, 2.0]))}
        wSi_list = spanning_tree.greedily_construct_st_Sim2(i2Si1_dict)
        assert wSi_list[0] == Sim2.identity()
        # w = frame of node 0; node 1's pose is the inverse of i1Si0... i.e.
        # wS1 = (1S0)^-1 since origin=0.
        expected = i2Si1_dict[(0, 1)].inverse()
        assert np.allclose(wSi_list[1].rotation, expected.rotation)
        assert np.allclose(wSi_list[1].translation, expected.translation)

    def test_empty(self) -> None:
        assert spanning_tree.greedily_construct_st_Sim2({}) is None


class TestRotationAveraging:
    def test_ordered_chain(self) -> None:
        i2Ri1_dict, _ = _get_ordered_chain_pose_data()
        wRi_list = globalaveraging2d(i2Ri1_dict)
        est = np.array([rotmat2theta_deg(wRi) for wRi in wRi_list])
        est_shifted = _wrap_angles(est - est[0])
        assert np.allclose(est_shifted, [0, 90, 0, 0, 90], atol=0.01)

    def test_mixed_order_with_noncontiguous_gap(self) -> None:
        wRi_list_gt = [rotmat2d(a) for a in [0, 30, 0, 0, -45, 0, 60]]
        edges = [(0, 2), (2, 4), (4, 6)]  # nodes 1,3,5 unobserved
        i2Ri1_dict = _create_synthetic_relative_pose_measurements(wRi_list_gt, edges)
        wRi_list = globalaveraging2d(i2Ri1_dict)
        assert wRi_list[1] is None and wRi_list[3] is None and wRi_list[5] is None
        est = np.array([rotmat2theta_deg(wRi_list[i]) for i in [0, 2, 4, 6]])
        est_shifted = _wrap_angles(est - est[0])
        assert np.allclose(est_shifted, [0, 0, -45, 60], atol=0.01)

    def test_noisy_rotations_recovered(self) -> None:
        rng = np.random.default_rng(0)
        gt = [0, 25, 50, 75, 100, 125]
        wRi_list_gt = [rotmat2d(a) for a in gt]
        edges = [(i, j) for i in range(6) for j in range(i + 1, 6)]
        i2Ri1_dict = {}
        for (i1, i2) in edges:
            noise = rotmat2d(rng.normal(0, 2.0))
            i2Ri1_dict[(i1, i2)] = wRi_list_gt[i2].T @ wRi_list_gt[i1] @ noise
        wRi_list = globalaveraging2d(i2Ri1_dict)
        est = np.array([rotmat2theta_deg(w) for w in wRi_list])
        est_shifted = _wrap_angles(est - est[0])
        assert np.allclose(est_shifted, gt, atol=2.5)


def _edge(i1, i2, i2Si1):
    return SimpleNamespace(
        i1=i1, i2=i2, i2Si1=i2Si1, prob=0.99, y_hat=1, y_true=1
    )


class TestRansacST:
    def test_noisy_edge_rejected(self) -> None:
        """3 accurate edges + 1 noisy duplicate; RANSAC keeps the clean tree."""
        wT0 = Pose2(0, 0, 0)
        wT1 = Pose2(2, 0, 0)
        wT2 = Pose2(2, 2, 0)
        wT2_noisy = Pose2(3, 3, 0)

        def sim2_between(a, b):
            rel = a.between(b)  # a^-1 * b
            return Sim2(R=rel.rotation_matrix(), t=rel.translation(), s=1.0)

        measurements = [
            _edge(0, 1, sim2_between(wT1, wT0)),
            _edge(1, 2, sim2_between(wT2, wT1)),
            _edge(0, 2, sim2_between(wT2, wT0)),
            _edge(0, 2, sim2_between(wT2_noisy, wT0)),
        ]
        rng = np.random.default_rng(0)
        wSi_list, hypothesis = spanning_tree.ransac_spanning_trees(
            measurements, num_hypotheses=10, min_num_edges_for_hypothesis=3, rng=rng
        )
        assert len(wSi_list) == 3
        for wSi, wT in zip(wSi_list, [wT0, wT1, wT2]):
            assert np.allclose(wSi.translation, wT.translation(), atol=1e-6)

    def test_objective_function(self) -> None:
        win = spanning_tree.compute_objective_function_improvement(
            avg_rot_error=13.0,
            avg_rot_error_best=16.4,
            avg_trans_error=0.58,
            avg_trans_error_best=0.44,
            num_poses_estimated=104,
            num_poses_estimated_best=38,
        )
        # Large completeness gain dominates the small accuracy losses.
        assert win > 0
