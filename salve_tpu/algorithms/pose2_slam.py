"""Planar Pose(2) SLAM: robust Levenberg-Marquardt in JAX.

TPU-native replacement for the reference's GTSAM factor graph
(salve/algorithms/pose2_slam.py:57-172): a prior on the first localized
pano, BetweenFactorPose2 per verified edge, optional BearingRangeFactor2D
to W/D/O landmarks, Huber(1.345) robust noise, Levenberg-Marquardt.

Instead of a C++ NonlinearFactorGraph, residuals are batched array ops over
padded factor tables and the whole LM loop (jacobian via jax.jacfwd, dense
normal equations, damping schedule) runs as one jitted program. Floor
graphs are small (tens of poses, hundreds of factors), so a dense solve is
exact and trivially fast; batching across floors comes free via vmap.

Conventions match GTSAM's defaults: the between-factor residual is the
(x, y, theta) chart of  m^-1 * (x_i2^-1 * x_i1)  (Pose2::localCoordinates
without SLOW_BUT_CORRECT_EXPMAP), the retract composes the increment, and
Huber reweights each factor by sqrt(min(1, k/||whitened r||)).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from salve_tpu.geometry.pose2 import Pose2
from salve_tpu.geometry.sim2 import Sim2

# Noise sigmas (parity: salve/algorithms/pose2_slam.py:20-22).
PRIOR_SIGMAS = np.array([0.3, 0.3, 0.1])
ODOMETRY_SIGMAS = np.array([0.2, 0.2, 0.1])
MEASUREMENT_SIGMAS = np.array([0.1, 0.2])  # (bearing rad, range)
HUBER_K = 1.345

MAX_LM_ITERS = 100
LAMBDA_INIT = 1e-5
LAMBDA_FACTOR = 10.0


@dataclass
class BearingRangeMeasurement:
    """Bearing-range measurement between camera and landmark (degrees)."""

    pano_id: int
    l_idx: int
    bearing_deg: float
    range: float


@dataclass
class OdometryMeasurement:
    """Relative pose measurement i2Ti1 between two panoramas."""

    i1: int
    i2: int
    i2Ti1: Pose2


def _wrap(theta):
    return jnp.arctan2(jnp.sin(theta), jnp.cos(theta))


def _compose(a, b):
    """Compose (…,3) pose arrays."""
    c, s = jnp.cos(a[..., 2]), jnp.sin(a[..., 2])
    return jnp.stack(
        [
            a[..., 0] + c * b[..., 0] - s * b[..., 1],
            a[..., 1] + s * b[..., 0] + c * b[..., 1],
            _wrap(a[..., 2] + b[..., 2]),
        ],
        axis=-1,
    )


def _inverse(a):
    c, s = jnp.cos(a[..., 2]), jnp.sin(a[..., 2])
    return jnp.stack(
        [
            -(c * a[..., 0] + s * a[..., 1]),
            -(-s * a[..., 0] + c * a[..., 1]),
            -a[..., 2],
        ],
        axis=-1,
    )


def _residuals(
    poses,          # (N,3)
    landmarks,      # (L,2)
    odo_idx,        # (E,2) int32 (i1_idx, i2_idx)
    odo_meas,       # (E,3) i2Ti1
    odo_valid,      # (E,)
    prior_idx,      # scalar int
    brm_idx,        # (M,2) int32 (pose_idx, lm_idx)
    brm_meas,       # (M,2) (bearing_rad, range)
    brm_valid,      # (M,)
    use_robust: bool,
):
    """Whitened, robustly-reweighted residuals of every factor, flattened."""

    def robustify(r):
        """Huber: scale the whitened residual block by sqrt(min(1, k/|r|))."""
        if not use_robust:
            return r
        norm = jnp.linalg.norm(r, axis=-1, keepdims=True)
        w = jnp.sqrt(jnp.minimum(1.0, HUBER_K / jnp.maximum(norm, 1e-12)))
        return r * w

    # Prior factor: chart of prior^-1 * x_origin with prior = identity.
    r_prior = poses[prior_idx] / jnp.asarray(PRIOR_SIGMAS)
    r_prior = r_prior.at[2].set(_wrap(poses[prior_idx, 2]) / PRIOR_SIGMAS[2])
    r_prior = robustify(r_prior)

    # Between factors: chart of m^-1 * (x_i2^-1 * x_i1).
    x_i1 = poses[odo_idx[:, 0]]
    x_i2 = poses[odo_idx[:, 1]]
    rel = _compose(_inverse(x_i2), x_i1)
    err = _compose(_inverse(odo_meas), rel)
    err = err.at[:, 2].set(_wrap(err[:, 2]))
    r_odo = err / jnp.asarray(ODOMETRY_SIGMAS)
    r_odo = robustify(r_odo) * odo_valid[:, None]

    # Bearing-range factors.
    x_p = poses[brm_idx[:, 0]]
    lm = landmarks[brm_idx[:, 1]] if landmarks.shape[0] > 0 else jnp.zeros((brm_idx.shape[0], 2))
    d = lm - x_p[:, :2]
    c, s = jnp.cos(x_p[:, 2]), jnp.sin(x_p[:, 2])
    # Rotate into the pose frame: R(theta)^T d.
    local = jnp.stack([c * d[:, 0] + s * d[:, 1], -s * d[:, 0] + c * d[:, 1]], axis=-1)
    pred_bearing = jnp.arctan2(local[:, 1], local[:, 0])
    pred_range = jnp.linalg.norm(local, axis=-1)
    r_brm = jnp.stack(
        [
            _wrap(pred_bearing - brm_meas[:, 0]) / MEASUREMENT_SIGMAS[0],
            (pred_range - brm_meas[:, 1]) / MEASUREMENT_SIGMAS[1],
        ],
        axis=-1,
    )
    r_brm = robustify(r_brm) * brm_valid[:, None]

    return jnp.concatenate([r_prior.ravel(), r_odo.ravel(), r_brm.ravel()])


def _lm_solve(
    poses0, landmarks0, odo_idx, odo_meas, odo_valid, prior_idx,
    brm_idx, brm_meas, brm_valid, use_robust: bool,
):
    """Levenberg-Marquardt over the flattened (poses, landmarks) state."""
    n_poses = poses0.shape[0]
    n_lms = landmarks0.shape[0]

    def unpack(state):
        return state[: n_poses * 3].reshape(n_poses, 3), state[n_poses * 3 :].reshape(
            n_lms, 2
        )

    def retract(state, delta):
        """Pose blocks compose the increment; landmark blocks add."""
        poses, lms = unpack(state)
        dp, dl = unpack(delta)
        new_poses = _compose(poses, dp)
        return jnp.concatenate([new_poses.ravel(), (lms + dl).ravel()])

    def res_at(state):
        poses, lms = unpack(state)
        return _residuals(
            poses, lms, odo_idx, odo_meas, odo_valid, prior_idx,
            brm_idx, brm_meas, brm_valid, use_robust,
        )

    def res_local(delta, state):
        return res_at(retract(state, delta))

    state0 = jnp.concatenate([poses0.ravel(), landmarks0.ravel()])
    dim = state0.shape[0]

    def cost(state):
        r = res_at(state)
        return 0.5 * jnp.dot(r, r)

    def body(carry, _):
        state, lam, c_prev = carry
        zero = jnp.zeros(dim, dtype=state.dtype)
        J = jax.jacfwd(res_local)(zero, state)
        r = res_at(state)
        JtJ = J.T @ J
        g = J.T @ r
        A = JtJ + lam * jnp.eye(dim, dtype=state.dtype)
        delta = -jnp.linalg.solve(A, g)
        new_state = retract(state, delta)
        c_new = cost(new_state)
        accept = c_new < c_prev
        state = jnp.where(accept, new_state, state)
        lam = jnp.where(accept, lam / LAMBDA_FACTOR, lam * LAMBDA_FACTOR)
        c = jnp.where(accept, c_new, c_prev)
        return (state, lam, c), c

    init = (state0, jnp.asarray(LAMBDA_INIT, state0.dtype), cost(state0))
    (state, _, _), _ = jax.lax.scan(body, init, None, length=MAX_LM_ITERS)
    return unpack(state)


_lm_solve_jit = jax.jit(_lm_solve, static_argnames=("use_robust",))


def planar_slam(
    wTi_list_init: List[Optional[Pose2]],
    i2Ti1_measurements: List[OdometryMeasurement],
    landmark_positions_init: Dict[int, np.ndarray],
    landmark_measurements: List[BearingRangeMeasurement],
    optimize_poses_only: bool,
    use_robust: bool = True,
) -> Tuple[List[Optional[Pose2]], Dict[int, np.ndarray]]:
    """Execute SLAM in the 2D plane (parity: pose2_slam.py:57).

    Args:
        wTi_list_init: initial global poses (None = unlocalized, stays None).
        i2Ti1_measurements: odometry measurements.
        landmark_positions_init: landmark ID -> initial 2D position.
        landmark_measurements: bearing-range measurements to landmarks.
        optimize_poses_only: ignore landmarks (pure PGO).
        use_robust: Huber(1.345) robust loss on all factors.

    Returns:
        (optimized poses with None preserved, landmark ID -> position).
    """
    n = len(wTi_list_init)
    est_ids = [i for i, p in enumerate(wTi_list_init) if p is not None]
    if not est_ids:
        return list(wTi_list_init), {}
    id2idx = {pid: k for k, pid in enumerate(est_ids)}
    poses0 = np.array(
        [[wTi_list_init[i].x, wTi_list_init[i].y, wTi_list_init[i].theta] for i in est_ids],
        dtype=np.float64,
    )
    # Prior goes on the first localized pano (pose2_slam.py:103-106).
    prior_idx = 0

    def _localized(pid: int) -> bool:
        # Edge-filtering stages (cycle / global-local consistency) can leave
        # measurements referencing panos beyond the spanning tree's range —
        # treat out-of-range ids as un-localized rather than indexing past
        # the init list.
        return pid < n and wTi_list_init[pid] is not None

    odo = [m for m in i2Ti1_measurements if _localized(m.i1) and _localized(m.i2)]
    odo_idx = np.array([[id2idx[m.i1], id2idx[m.i2]] for m in odo], dtype=np.int32).reshape(-1, 2)
    odo_meas = np.array(
        [[m.i2Ti1.x, m.i2Ti1.y, m.i2Ti1.theta] for m in odo], dtype=np.float64
    ).reshape(-1, 3)
    odo_valid = np.ones(len(odo))

    if optimize_poses_only:
        lm_ids, landmarks0 = [], np.zeros((0, 2))
        brm_idx = np.zeros((0, 2), dtype=np.int32)
        brm_meas = np.zeros((0, 2))
        brm_valid = np.zeros(0)
    else:
        lm_ids = sorted(landmark_positions_init.keys())
        lid2idx = {lid: k for k, lid in enumerate(lm_ids)}
        landmarks0 = np.array(
            [np.asarray(landmark_positions_init[lid], dtype=np.float64) for lid in lm_ids]
        ).reshape(-1, 2)
        brms = [
            b for b in landmark_measurements if _localized(b.pano_id)
        ]
        brm_idx = np.array(
            [[id2idx[b.pano_id], lid2idx[b.l_idx]] for b in brms], dtype=np.int32
        ).reshape(-1, 2)
        brm_meas = np.array(
            [[np.deg2rad(b.bearing_deg), b.range] for b in brms], dtype=np.float64
        ).reshape(-1, 2)
        brm_valid = np.ones(len(brms))

    # Double precision for the solve: GTSAM-parity tolerances are ~1e-8.
    # Pinned to the host CPU backend: the factor graph is tiny (tens of
    # poses) and TPU has no f64 LU decomposition — the chip's job is the
    # image/batch work, not a 3Nx3N solve.
    with jax.enable_x64(True), jax.default_device(jax.devices("cpu")[0]):
        poses_opt, lms_opt = _lm_solve_jit(
            jnp.asarray(poses0, dtype=jnp.float64),
            jnp.asarray(landmarks0, dtype=jnp.float64),
            jnp.asarray(odo_idx),
            jnp.asarray(odo_meas, dtype=jnp.float64),
            jnp.asarray(odo_valid, dtype=jnp.float64),
            0,
            jnp.asarray(brm_idx),
            jnp.asarray(brm_meas, dtype=jnp.float64),
            jnp.asarray(brm_valid, dtype=jnp.float64),
            use_robust,
        )
        poses_opt = np.asarray(poses_opt)
        lms_opt = np.asarray(lms_opt)

    wTi_list: List[Optional[Pose2]] = [None] * n
    for pid, k in id2idx.items():
        wTi_list[pid] = Pose2(*poses_opt[k])

    landmark_positions = {lid: lms_opt[k] for k, lid in enumerate(lm_ids)}
    return wTi_list, landmark_positions


def execute_planar_slam(
    measurements,
    wSi_list: List[Optional[Sim2]],
    per_edge_wdo_dict=None,
    inferred_floor_pose_graph=None,
    optimize_poses_only: bool = True,
) -> List[Optional[Sim2]]:
    """Gather odometry (+ landmark) measurements, run SLAM, return Sim2 poses.

    Parity: pose2_slam.py:175-321 — odometry from verified edge measurements,
    pose initialization from the spanning tree (wSi_list), and (optionally)
    W/D/O endpoints as landmarks via data association.

    Args:
        measurements: EdgeClassification-like objects with .i1/.i2/.i2Si1.
        wSi_list: spanning-tree initialization of global poses.
        per_edge_wdo_dict: (i1,i2) -> EdgeWDOPair, needed for landmark SLAM.
        inferred_floor_pose_graph: layouts, needed for landmark SLAM.
        optimize_poses_only: PGO-only if True.
    """
    wTi_list_init = [
        Pose2.from_theta_deg(wSi.theta_deg, *wSi.translation) if wSi is not None else None
        for wSi in wSi_list
    ]

    i2Ti1_measurements = []
    for m in measurements:
        theta_rad = np.deg2rad(m.i2Si1.theta_deg)
        x, y = m.i2Si1.translation
        i2Ti1_measurements.append(OdometryMeasurement(m.i1, m.i2, Pose2(x, y, theta_rad)))

    landmark_positions_init: Dict[int, np.ndarray] = {}
    landmark_measurements: List[BearingRangeMeasurement] = []
    if not optimize_poses_only:
        from salve_tpu.algorithms import data_association

        tracks = data_association.perform_data_association(
            measurements, per_edge_wdo_dict, inferred_floor_pose_graph
        )
        pano_dict = inferred_floor_pose_graph.nodes
        for l_idx, track in enumerate(tracks):
            for pano_id, kpt_idx in track:
                if wTi_list_init[pano_id] is None:
                    continue
                kpt = data_association.get_kpt_coordinate(
                    pano_dict[pano_id], kpt_idx
                )
                bearing_deg = float(np.rad2deg(np.arctan2(kpt[1], kpt[0])))
                rng = float(np.linalg.norm(kpt))
                landmark_measurements.append(
                    BearingRangeMeasurement(pano_id, l_idx, bearing_deg, rng)
                )
                if l_idx not in landmark_positions_init:
                    wTi = wTi_list_init[pano_id]
                    landmark_positions_init[l_idx] = wTi.transform_from(
                        np.asarray(kpt).reshape(1, 2)
                    ).squeeze()

    wTi_list, _ = planar_slam(
        wTi_list_init,
        i2Ti1_measurements,
        landmark_positions_init,
        landmark_measurements,
        optimize_poses_only=optimize_poses_only,
        use_robust=True,
    )

    wSi_list_opt: List[Optional[Sim2]] = [None] * len(wSi_list)
    for i, wTi in enumerate(wTi_list):
        if wTi is None:
            continue
        wSi_list_opt[i] = Sim2(
            R=wTi.rotation_matrix(), t=wTi.translation(), s=1.0
        )
    return wSi_list_opt
