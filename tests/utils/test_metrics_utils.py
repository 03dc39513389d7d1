"""Tests for PR metrics, IoU utilities, and meters."""

import numpy as np

from salve_tpu.training.meters import (
    AverageMeter,
    PrecisionRecallMeter,
    SegmentationAverageMeter,
)
from salve_tpu.utils import iou_utils, pr_utils


class TestPrUtils:
    def test_perfect_predictions(self) -> None:
        y = np.array([1, 1, 0, 0])
        prec, rec, mAcc = pr_utils.compute_precision_recall(y, y)
        assert np.isclose(prec, 1.0, atol=1e-6)
        assert np.isclose(rec, 1.0, atol=1e-6)
        assert np.isclose(mAcc, 1.0, atol=1e-6)

    def test_all_wrong(self) -> None:
        y_true = np.array([1, 1, 0, 0])
        y_pred = 1 - y_true
        prec, rec, mAcc = pr_utils.compute_precision_recall(y_true, y_pred)
        assert prec < 1e-6 and rec < 1e-6 and mAcc < 1e-6

    def test_mixed(self) -> None:
        y_true = np.array([1, 1, 1, 0, 0, 0])
        y_pred = np.array([1, 1, 0, 1, 0, 0])
        # TP=2 FP=1 FN=1 TN=2
        prec, rec, mAcc = pr_utils.compute_precision_recall(y_true, y_pred)
        assert np.isclose(prec, 2 / 3, atol=1e-6)
        assert np.isclose(rec, 2 / 3, atol=1e-6)
        assert np.isclose(mAcc, 2 / 3, atol=1e-5)

    def test_masks(self) -> None:
        y_true = np.array([1, 0, 1, 0])
        y_pred = np.array([1, 1, 0, 0])
        tp, fp, fn, tn = pr_utils.assign_tp_fp_fn_tn(y_true, y_pred)
        assert tp.tolist() == [True, False, False, False]
        assert fp.tolist() == [False, True, False, False]
        assert fn.tolist() == [False, False, True, False]
        assert tn.tolist() == [False, False, False, True]


class TestIoUUtils:
    def test_binary_mask_iou(self) -> None:
        a = np.zeros((4, 4), bool)
        b = np.zeros((4, 4), bool)
        a[:2] = True  # 8 px
        b[1:3] = True  # 8 px, overlap 4
        assert np.isclose(iou_utils.binary_mask_iou(a, b), 4 / 12)

    def test_texture_map_iou(self) -> None:
        f1 = np.zeros((4, 4, 3))
        f2 = np.zeros((4, 4, 3))
        f1[0, 0] = 1
        f2[0, 0] = 1
        assert np.isclose(iou_utils.texture_map_iou(f1, f2), 1.0)

    def test_intersection_and_union(self) -> None:
        out = np.array([0, 1, 1, 0])
        tgt = np.array([0, 1, 0, 1])
        inter, union, target = iou_utils.intersectionAndUnion(out, tgt, K=2)
        assert inter.tolist() == [1, 1]
        assert union.tolist() == [3, 3]
        assert target.tolist() == [2, 2]


class TestMeters:
    def test_average_meter(self) -> None:
        m = AverageMeter()
        m.update(2.0, n=2)
        m.update(4.0, n=2)
        assert np.isclose(m.avg, 3.0)

    def test_segmentation_meter(self) -> None:
        m = SegmentationAverageMeter()
        m.update_metrics(np.array([1, 1, 0, 0]), np.array([1, 0, 0, 0]), num_classes=2)
        _, acc_class, _, mAcc, allAcc = m.get_metrics()
        # class 0: 2/3 correct; class 1: 1/1 correct.
        assert np.isclose(acc_class[0], 2 / 3, atol=1e-6)
        assert np.isclose(acc_class[1], 1.0, atol=1e-6)
        assert np.isclose(allAcc, 3 / 4, atol=1e-6)

    def test_pr_meter_accumulates(self) -> None:
        m = PrecisionRecallMeter()
        m.update(np.array([1, 0]), np.array([1, 0]))
        m.update(np.array([1]), np.array([0]))
        prec, rec, mAcc = m.get_metrics()
        assert np.isclose(rec, 0.5, atol=1e-6)
        assert np.isclose(prec, 1.0, atol=1e-6)


class TestAxisAlignment:
    def test_vp_correction(self) -> None:
        from salve_tpu.geometry.sim2 import Sim2
        from salve_tpu.utils.axis_alignment import compute_vp_correction

        i2Si1 = Sim2.from_theta_deg(30.0, np.array([0.0, 0.0]))
        # vp_i1 == vp_i2 -> correction = -30 mod 90 -> 60 -> -30
        corr = compute_vp_correction(i2Si1, vp_i1=10.0, vp_i2=10.0)
        assert np.isclose(corr, -30.0, atol=1e-6)

    def test_dominant_rotation_angle(self) -> None:
        from salve_tpu.utils.axis_alignment import determine_dominant_rotation_angle

        sq = np.array([[0, 0], [2, 0], [2, 2], [0, 2]], dtype=float)
        angle, frac = determine_dominant_rotation_angle(sq)
        assert np.isclose(angle % 90, 0.0, atol=1e-6)
        assert frac == 1.0

        rot = np.deg2rad(20.0)
        R = np.array([[np.cos(rot), -np.sin(rot)], [np.sin(rot), np.cos(rot)]])
        angle, _ = determine_dominant_rotation_angle(sq @ R.T)
        assert np.isclose(abs(angle), 20.0, atol=1e-4)
