"""Stage-A export end-to-end on the real ZInD fixture building 0000."""

import json

import numpy as np

from salve_tpu.geometry.sim2 import Sim2
from salve_tpu.hypotheses.export import export_single_building_wdo_alignment_hypotheses


def test_export_building_0000_gt_mode(ref_test_data, tmp_path) -> None:
    raw = str(ref_test_data / "ZInD")
    report = export_single_building_wdo_alignment_hypotheses(
        hypotheses_save_root=str(tmp_path),
        building_id="0000",
        json_annot_fpath=f"{raw}/0000/zind_data.json",
        raw_dataset_dir=raw,
        use_inferred_wdos_layout=False,
    )
    # GT W/D/Os: nearly every pair's GT adjacency is consistent with the
    # hypotheses. (A couple of pairs — e.g. (14,15) — have known ZInD GT
    # annotation issues, acknowledged in the reference exporter too.)
    flags = report["floor_01"]
    assert np.mean(flags) >= 0.99

    floor_dir = tmp_path / "0000" / "floor_01"
    approx = sorted((floor_dir / "gt_alignment_approx").glob("*.json"))
    exact = sorted((floor_dir / "gt_alignment_exact").glob("*.json"))
    incorrect = sorted((floor_dir / "incorrect_alignment").glob("*.json"))
    assert len(approx) > 0 and len(exact) > 0 and len(incorrect) > 0

    # Filename grammar: {i1}_{i2}__{object}_{i}_{j}_{configuration}.json
    stem = approx[0].stem
    pair_part, hypo_part = stem.split("__")
    i1, i2 = map(int, pair_part.split("_"))
    assert i1 < i2
    obj, i, j, config = hypo_part.split("_")
    assert obj in ("door", "window", "opening")
    assert config in ("identity", "rotated")

    # Wire format: flat row-major R, flat t, scalar s; parse and round-trip.
    data = json.loads(approx[0].read_text())
    assert set(data) == {"R", "t", "s"}
    s2 = Sim2.from_json(approx[0])
    assert np.allclose(s2.rotation.T @ s2.rotation, np.eye(2), atol=1e-5)

    # Exact-GT files are named {i1}_{i2}.json.
    i1, i2 = map(int, exact[0].stem.split("_"))
    assert i1 < i2


def test_export_building_0000_inferred_mode(ref_test_data, tmp_path) -> None:
    raw = str(ref_test_data / "ZInD")
    report = export_single_building_wdo_alignment_hypotheses(
        hypotheses_save_root=str(tmp_path),
        building_id="0000",
        json_annot_fpath=f"{raw}/0000/zind_data.json",
        raw_dataset_dir=raw,
        use_inferred_wdos_layout=True,
        mhnet_predictions_data_root=str(ref_test_data / "ZInD_HorizonNet_predictions"),
    )
    flags = report["floor_01"]
    # Inferred (noisy) W/D/Os cannot be perfectly GT-consistent, but most pairs are.
    assert np.mean(flags) > 0.85
    floor_dir = tmp_path / "0000" / "floor_01"
    n_approx = len(list((floor_dir / "gt_alignment_approx").glob("*.json")))
    n_incorrect = len(list((floor_dir / "incorrect_alignment").glob("*.json")))
    assert n_approx > 50
    assert n_incorrect > n_approx  # negatives dominate
