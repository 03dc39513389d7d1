"""Minimal gtsam-compatible shims backed by salve_tpu's closed-form solvers.

Purpose: let the *reference* implementation at /root/reference (which calls
gtsam.Pose2.Align / gtsam.Similarity3.Align) execute in this environment so
its Stage-A output can be byte-compared against salve_tpu's exporter
(SURVEY.md §7 milestone #1). Both pipelines then share the identical
primitive fits — which are themselves validated against true GTSAM numeric
fixtures in tests/geometry/ — so any byte difference isolates a divergence
in the surrounding pipeline logic, not in the solver.

Only the API surface reachable from scripts/export_alignment_hypotheses.py
is implemented; everything else raises on use.
"""

from __future__ import annotations

import numpy as np

from salve_tpu.geometry.point_alignment import _fit_se2_np, fit_sim3

# gtsam.Point2Pairs / Point3Pairs are list-like containers of (a, b) pairs.
Point2Pairs = list
Point3Pairs = list


class _Rot:
    def __init__(self, matrix: np.ndarray):
        self._matrix = np.asarray(matrix, dtype=np.float64)

    def matrix(self) -> np.ndarray:
        return self._matrix


class Pose2:
    """SE(2) pose; only the pieces used by salve/utils/se2_estimation.py."""

    def __init__(self, R: np.ndarray, t: np.ndarray):
        self._R = np.asarray(R, dtype=np.float64)
        self._t = np.asarray(t, dtype=np.float64)

    @staticmethod
    def Align(ab_pairs):
        pts_a = np.asarray([a for a, _ in ab_pairs], dtype=np.float64)
        pts_b = np.asarray([b for _, b in ab_pairs], dtype=np.float64)
        R, t = _fit_se2_np(pts_a, pts_b)
        return Pose2(R, t)

    def rotation(self) -> _Rot:
        return _Rot(self._R)

    def translation(self) -> np.ndarray:
        return self._t


class Similarity3:
    """Sim(3); only the pieces used by salve/utils/sim3_estimation.py."""

    def __init__(self, R: np.ndarray, t: np.ndarray, s: float):
        self._R = np.asarray(R, dtype=np.float64)
        self._t = np.asarray(t, dtype=np.float64)
        self._s = float(s)

    @staticmethod
    def Align(ab_pairs):
        import jax.numpy as jnp

        pts_a = np.asarray([a for a, _ in ab_pairs], dtype=np.float64)
        pts_b = np.asarray([b for _, b in ab_pairs], dtype=np.float64)
        R, t, s = (np.asarray(x) for x in fit_sim3(jnp.asarray(pts_a), jnp.asarray(pts_b)))
        return Similarity3(R, t, float(s))

    def rotation(self) -> _Rot:
        return _Rot(self._R)

    def translation(self) -> np.ndarray:
        return self._t

    def scale(self) -> float:
        return self._s


class _Unused:
    """Placeholder for gtsam symbols imported but not exercised on the Stage-A path."""

    _name = "gtsam symbol"

    def __init__(self, *args, **kwargs):
        raise NotImplementedError(
            f"fake gtsam: {type(self).__name__} is not implemented by the parity shim"
        )


class Pose3(_Unused):
    pass


class Rot3(_Unused):
    pass


class Point3(_Unused):
    pass
