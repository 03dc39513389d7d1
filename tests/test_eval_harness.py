"""Unit tests for the end-to-end eval harness helpers (cli/end_to_end_eval.py).

The harness itself is exercised on-chip (ACCURACY_r0*.json); these tests pin
the host-side helpers: per-building verifier grouping over the batch_{i}.json
wire format and the labeled reconstruction summary entries.
"""

import json

import pytest
from pathlib import Path

import numpy as np

from salve_tpu.cli.end_to_end_eval import _per_building_verifier, _report_dict
from salve_tpu.common.floor_reconstruction_report import FloorReconstructionReport


def _write_batch(preds_dir: Path, idx: int, rows) -> None:
    """rows: list of (building_id, y_hat, y_true)."""
    d = {"y_hat": [], "y_true": [], "y_hat_probs": [], "fp0": [], "fp1": []}
    for bid, yh, yt in rows:
        d["y_hat"].append(yh)
        d["y_true"].append(yt)
        d["y_hat_probs"].append(0.9)
        fp = f"/x/bev/gt_alignment_approx/{bid}/pair_0___door_0_0_ceiling_rgb_floor_01_partial_room_01_pano_1.jpg"
        d["fp0"].append(fp)
        d["fp1"].append(fp)
    with open(preds_dir / f"batch_{idx}.json", "w") as f:
        json.dump(d, f)


def test_per_building_verifier_grouping(tmp_path) -> None:
    # Building A: 2 TP, 1 FP, 1 FN, 2 TN -> prec 2/3, rec 2/3, mAcc 0.5*(2/3+2/3)
    # Building B: only negatives, one FP -> precision 0.0, recall None.
    _write_batch(tmp_path, 0, [
        ("000A", 1, 1), ("000A", 1, 1), ("000A", 1, 0),
        ("000B", 0, 0), ("000B", 1, 0),
    ])
    _write_batch(tmp_path, 1, [
        ("000A", 0, 1), ("000A", 0, 0), ("000A", 0, 0),
        ("000B", 0, 0),
    ])
    out = _per_building_verifier(tmp_path)
    assert set(out) == {"000A", "000B"}
    a = out["000A"]
    assert a["num_pairs"] == 6
    assert np.isclose(a["precision"], 2 / 3)
    assert np.isclose(a["recall"], 2 / 3)
    assert np.isclose(a["mAcc"], 2 / 3)
    b = out["000B"]
    assert b["num_pairs"] == 3
    assert b["precision"] == 0.0
    assert b["recall"] is None  # no positives to recall
    assert b["mAcc"] is None


def test_per_building_verifier_empty_dir(tmp_path) -> None:
    assert _per_building_verifier(tmp_path) == {}


def test_report_dict_carries_floor_identity() -> None:
    r = FloorReconstructionReport(
        avg_abs_rot_err=1.0,
        avg_abs_trans_err=0.2,
        percent_panos_localized=100.0,
        floorplan_iou=0.9,
        building_id="1210",
        floor_id="floor_01",
    )
    d = _report_dict(r)
    assert d["building_id"] == "1210"
    assert d["floor_id"] == "floor_01"
    assert d["floorplan_iou"] == 0.9
    # NaN completeness metrics serialize as None, not NaN (strict JSON).
    assert d["percent_in_top2_ccs"] is None


def test_eval_procedural_buildings_flag_exposed() -> None:
    from salve_tpu.cli.end_to_end_eval import run_end_to_end_eval

    params = {p.name for p in run_end_to_end_eval.params}
    assert "eval_procedural_buildings" in params


def test_calibrate_on_val_freezes_best_val_iou_point(tmp_path, monkeypatch) -> None:
    """_calibrate_on_val_split: fits T on val preds, sweeps Stage D on val,
    freezes the max-mean-IoU calibrated threshold (raw-equivalent returned)."""
    from salve_tpu.cli import end_to_end_eval as e2e

    val_preds = tmp_path / "val_preds_none"  # ckpt_fpath=None -> tag "none"
    val_preds.mkdir()
    rng = np.random.default_rng(0)
    z = rng.normal(0, 2.0, 400)
    y = (rng.uniform(size=400) < 1 / (1 + np.exp(-z))).astype(int)
    p = 1 / (1 + np.exp(-2.0 * z))  # overconfident by T=2
    yh = (p >= 0.5).astype(int)
    with open(val_preds / "batch_0.json", "w") as f:
        json.dump({
            "y_hat": yh.tolist(), "y_true": y.tolist(),
            "y_hat_probs": np.where(yh == 1, p, 1 - p).tolist(),
        }, f)

    # Stub Stage D: mean IoU peaks at raw threshold nearest calibrated 0.8.
    from salve_tpu.training import calibration as cal
    seen = []

    def fake_reconstruction(*, confidence_threshold, plot_save_dir, **kw):
        seen.append(confidence_threshold)
        iou = 1.0 - abs(confidence_threshold - seen_best_raw)
        return [FloorReconstructionReport(
            avg_abs_rot_err=0.1, avg_abs_trans_err=0.1,
            percent_panos_localized=100.0, floorplan_iou=iou,
            building_id="0011", floor_id="floor_01")]

    monkeypatch.setattr(
        "salve_tpu.cli.run_sfm.run_incremental_reconstruction",
        fake_reconstruction,
    )
    p_val, y_val = cal.load_serialized_probs(str(val_preds))
    T = cal.fit_temperature(p_val, y_val)
    seen_best_raw = cal.raw_threshold_for_calibrated(0.8, T)

    summary, frozen_raw = e2e._calibrate_on_val_split(
        cfg=None, ckpt_fpath=None, out=tmp_path, hyp_root=tmp_path,
        raw_dir=tmp_path, plots_dir=tmp_path, method="pose2_slam",
    )
    assert summary["temperature"] == pytest.approx(2.0, rel=0.25)
    assert summary["frozen_threshold_calibrated"] == 0.8
    assert frozen_raw == pytest.approx(seen_best_raw, abs=1e-4)
    assert len(seen) == 6  # full grid swept
    assert summary["ece_calibrated"] <= summary["ece_raw"]


def test_eval_only_requires_ckpt() -> None:
    from click.testing import CliRunner

    from salve_tpu.cli.end_to_end_eval import run_end_to_end_eval

    r = CliRunner().invoke(
        run_end_to_end_eval, ["--output_dir", "/tmp/_never_created", "--num_epochs", "0"]
    )
    assert r.exit_code == 2
    assert "eval-only" in r.output
