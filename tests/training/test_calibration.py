"""Temperature scaling + frozen-operating-point calibration tests."""

import json

import numpy as np
import pytest

from salve_tpu.training import calibration


def _synthetic_overconfident(n=20000, k=3.0, seed=0):
    """True logits z; labels ~ Bernoulli(sigmoid(z)); reported p = sigmoid(k z).

    k > 1 models an over-confident verifier; the NLL-optimal temperature for
    the reported probabilities is T = k (dividing k z by k recovers z).
    """
    rng = np.random.default_rng(seed)
    z = rng.normal(0.0, 2.0, n)
    y = (rng.uniform(size=n) < 1.0 / (1.0 + np.exp(-z))).astype(np.int64)
    p_reported = 1.0 / (1.0 + np.exp(-k * z))
    return p_reported, y


class TestFitTemperature:
    def test_recovers_overconfidence_factor(self):
        p, y = _synthetic_overconfident(k=3.0)
        T = calibration.fit_temperature(p, y)
        assert T == pytest.approx(3.0, rel=0.1)

    def test_calibrated_input_gives_unit_temperature(self):
        p, y = _synthetic_overconfident(k=1.0)
        T = calibration.fit_temperature(p, y)
        assert T == pytest.approx(1.0, rel=0.1)

    def test_reduces_ece(self):
        p, y = _synthetic_overconfident(k=4.0)
        T = calibration.fit_temperature(p, y)
        p_cal = calibration.apply_temperature(p, T)
        assert calibration.expected_calibration_error(
            p_cal, y
        ) < 0.25 * calibration.expected_calibration_error(p, y)


class TestFrozenOperatingPoint:
    def test_raw_equivalent_threshold_is_exact(self):
        """Thresholding calibrated probs at t_cal == raw probs at t_raw."""
        p, _ = _synthetic_overconfident(n=5000, k=2.5)
        T = 2.5
        p_cal = calibration.apply_temperature(p, T)
        for t_cal in (0.6, 0.8, 0.93):
            t_raw = calibration.raw_threshold_for_calibrated(t_cal, T)
            np.testing.assert_array_equal(p_cal >= t_cal, p >= t_raw)

    def test_monotone_identity_at_T1(self):
        assert calibration.raw_threshold_for_calibrated(0.93, 1.0) == pytest.approx(
            0.93, abs=1e-9
        )

    def test_sweep_mAcc_picks_separating_threshold(self):
        p = np.array([0.1, 0.2, 0.3, 0.65, 0.7, 0.9])
        y = np.array([0, 0, 0, 1, 1, 1])
        t, info = calibration.sweep_mAcc(p, y)
        assert 0.3 < t <= 0.65
        assert info["best_mAcc"] == 1.0


class TestFitFromPreds:
    def test_reads_wire_format_and_freezes_point(self, tmp_path):
        """End-to-end over the batch_{i}.json Stage C->D wire format."""
        p, y = _synthetic_overconfident(n=4000, k=3.0, seed=1)
        yh = (p >= 0.5).astype(int)
        # y_hat_probs is p(predicted class) — the reference serialization.
        yh_probs = np.where(yh == 1, p, 1.0 - p)
        half = len(p) // 2
        for i, sl in enumerate((slice(0, half), slice(half, None))):
            with open(tmp_path / f"batch_{i}.json", "w") as f:
                json.dump(
                    {
                        "y_hat": yh[sl].tolist(),
                        "y_true": y[sl].tolist(),
                        "y_hat_probs": yh_probs[sl].tolist(),
                    },
                    f,
                )
        out = calibration.fit_from_preds(str(tmp_path))
        assert out["temperature"] == pytest.approx(3.0, rel=0.15)
        assert out["ece_calibrated"] < out["ece_raw"]
        # Frozen point round-trips through the raw-threshold plumbing.
        t_raw = calibration.raw_threshold_for_calibrated(
            out["threshold_calibrated"], out["temperature"]
        )
        assert t_raw == pytest.approx(out["threshold_raw_equivalent"], abs=1e-3)

    def test_missing_dir_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            calibration.fit_from_preds(str(tmp_path))
