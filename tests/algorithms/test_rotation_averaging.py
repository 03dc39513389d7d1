"""Dedicated fixtures for the spectral+GN Shonan replacement.

Parity target: salve/algorithms/rotation_averaging.py:22,68 (GTSAM
ShonanAveraging2). The rebuild's solver must recover global 2D rotations
from relative measurements up to the gauge freedom (all results are
compared after anchoring to node 0).
"""

import numpy as np
import pytest

from salve_tpu.algorithms.rotation_averaging import globalaveraging2d
from salve_tpu.geometry.rotations import rotmat2d, rotmat2theta_deg


def _wrap(a: float) -> float:
    """Wrap an angle to [-180, 180) degrees."""
    return float((a + 180.0) % 360.0 - 180.0)


def _relative(wRi, wRj):
    """i2Ri1 convention: i2Ri1 = (wRi2)^T wRi1."""
    return wRj.T @ wRi


def _gauge_fixed_angles(wRi_list, anchor):
    out = {}
    for i, R in enumerate(wRi_list):
        if R is None:
            out[i] = None
        else:
            out[i] = _wrap(rotmat2theta_deg(R) - rotmat2theta_deg(wRi_list[anchor]))
    return out


def test_exact_measurements_square_loop():
    """4 panos at 0/90/180/270 deg, loop edges: exact recovery."""
    gt = [rotmat2d(th) for th in (0.0, 90.0, 180.0, 270.0)]
    i2Ri1 = {
        (0, 1): _relative(gt[0], gt[1]),
        (1, 2): _relative(gt[1], gt[2]),
        (2, 3): _relative(gt[2], gt[3]),
        (3, 0): _relative(gt[3], gt[0]),
        (0, 2): _relative(gt[0], gt[2]),
    }
    wRi = globalaveraging2d(i2Ri1)
    assert wRi is not None and len(wRi) == 4
    est = _gauge_fixed_angles(wRi, 0)
    for i, th_gt in enumerate((0.0, 90.0, 180.0, 270.0)):
        assert abs(_wrap(est[i] - th_gt)) < 1e-6, (i, est)


def test_noisy_measurements_average_out():
    """Redundant noisy edges: errors shrink below the per-edge noise."""
    rng = np.random.default_rng(3)
    n = 8
    gt_angles = rng.uniform(-180, 180, n)
    gt = [rotmat2d(a) for a in gt_angles]
    i2Ri1 = {}
    for i in range(n):
        for j in range(i + 1, n):
            noise = rng.normal(0.0, 2.0)
            i2Ri1[(i, j)] = rotmat2d(noise) @ _relative(gt[i], gt[j])
    wRi = globalaveraging2d(i2Ri1)
    est = _gauge_fixed_angles(wRi, 0)
    errs = [
        abs(_wrap(est[i] - _wrap(gt_angles[i] - gt_angles[0])))
        for i in range(n)
    ]
    assert max(errs) < 1.5, errs  # fully-connected graph beats 2-deg noise


def test_non_contiguous_ids_and_disconnected_nodes():
    """IDs 2/5/9 measured; everything else None; output indexed to max id."""
    gt = {2: rotmat2d(10.0), 5: rotmat2d(40.0), 9: rotmat2d(-30.0)}
    i2Ri1 = {
        (2, 5): _relative(gt[2], gt[5]),
        (5, 9): _relative(gt[5], gt[9]),
    }
    wRi = globalaveraging2d(i2Ri1)
    assert len(wRi) == 10
    assert wRi[0] is None and wRi[3] is None
    d_25 = _wrap(rotmat2theta_deg(wRi[2]) - rotmat2theta_deg(wRi[5]))
    assert abs(_wrap(d_25 - (10.0 - 40.0))) < 1e-6


def test_empty_and_all_none_inputs():
    assert globalaveraging2d({}) is None
    assert globalaveraging2d({(0, 1): None}) is None


def test_gross_outlier_distributes_as_least_squares():
    """One 90-deg outlier on edge (0,1) in a complete 6-node graph.

    The solver is plain least squares (like Shonan; neither is robust —
    cycle filtering upstream removes gross outliers,
    algorithms/cycle_consistency.py). LS splits the outlier epsilon exactly:
    the involved pair separates by eps*2/n, every other node absorbs eps/n,
    and relative rotations among uninvolved nodes stay exact.
    """
    n = 6
    eps = 90.0
    gt_angles = np.linspace(0, 150, n)
    gt = [rotmat2d(a) for a in gt_angles]
    i2Ri1 = {
        (i, j): _relative(gt[i], gt[j]) for i in range(n) for j in range(i + 1, n)
    }
    i2Ri1[(0, 1)] = rotmat2d(eps) @ i2Ri1[(0, 1)]
    wRi = globalaveraging2d(i2Ri1)
    est = _gauge_fixed_angles(wRi, 0)
    errs = [_wrap(est[i] - (gt_angles[i] - gt_angles[0])) for i in range(n)]
    # Node 1 (the other endpoint of the bad edge) off by eps*2/n relative to
    # node 0; uninvolved nodes off by eps/n (the node-0 gauge shift).
    assert abs(abs(errs[1]) - eps * 2 / n) < 1e-6, errs
    for i in range(2, n):
        assert abs(abs(errs[i]) - eps / n) < 1e-6, errs
    # Pairwise rotations among uninvolved nodes remain exact.
    for i in range(2, n):
        for j in range(i + 1, n):
            rel = _wrap(est[j] - est[i] - (gt_angles[j] - gt_angles[i]))
            assert abs(rel) < 1e-6
