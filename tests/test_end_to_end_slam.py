"""End-to-end test of the landmark-SLAM path with inferred W/D/Os.

Uses MHNet-inferred layouts (fixture building 0000) for Stage A, simulates
a perfect verifier, then runs the full run_sfm driver with
method=pose2_slam (landmark SLAM via data association) and vanishing-angle
axis alignment enabled — the deepest Stage D configuration.
"""

import glob
from pathlib import Path

import numpy as np
import pytest

from salve_tpu.cli.run_sfm import run_incremental_reconstruction
from salve_tpu.hypotheses.export import export_single_building_wdo_alignment_hypotheses
from salve_tpu.utils.io import save_json_file

REF = Path("/root/reference/tests/test_data")


@pytest.mark.skipif(not REF.exists(), reason="reference fixtures unavailable")
def test_pose2_slam_with_inferred_wdos(tmp_path) -> None:
    building_id = "0000"
    raw_dataset_dir = str(REF / "ZInD")
    preds_root = str(REF / "ZInD_HorizonNet_predictions")

    hyp_root = str(tmp_path / "hypotheses")
    export_single_building_wdo_alignment_hypotheses(
        hypotheses_save_root=hyp_root,
        building_id=building_id,
        json_annot_fpath=f"{raw_dataset_dir}/{building_id}/zind_data.json",
        raw_dataset_dir=raw_dataset_dir,
        use_inferred_wdos_layout=True,
        mhnet_predictions_data_root=preds_root,
    )

    # Simulate a perfect verifier over the generated hypotheses.
    preds_dir = tmp_path / "preds"
    preds_dir.mkdir()
    render_dir = tmp_path / "renders" / building_id
    render_dir.mkdir(parents=True)

    y_hat, y_true, probs, fp0s, fp1s = [], [], [], [], []
    pair_counter = 0
    for floor_dir in sorted(Path(hyp_root, building_id).iterdir()):
        floor_id = floor_dir.name
        for label_dirname, label in [("gt_alignment_approx", 1), ("incorrect_alignment", 0)]:
            for hyp_fpath in sorted(glob.glob(str(floor_dir / label_dirname / "*.json"))):
                stem = Path(hyp_fpath).stem
                i1, i2 = stem.split("__")[0].split("_")[:2]
                uuid_config = stem.split("__")[1]
                fp0s.append(
                    str(render_dir / f"pair_{pair_counter}___{uuid_config}_ceiling_rgb_{floor_id}_partial_room_00_pano_{i1}.jpg")
                )
                fp1s.append(
                    str(render_dir / f"pair_{pair_counter}___{uuid_config}_ceiling_rgb_{floor_id}_partial_room_00_pano_{i2}.jpg")
                )
                y_hat.append(label)
                y_true.append(label)
                probs.append(0.99)
                pair_counter += 1
    assert sum(y_true) > 0, "no positive hypotheses generated"

    save_json_file(
        str(preds_dir / "batch_0.json"),
        {"y_hat": y_hat, "y_true": y_true, "y_hat_probs": probs, "fp0": fp0s, "fp1": fp1s},
    )

    reports = run_incremental_reconstruction(
        hypotheses_save_root=hyp_root,
        serialized_preds_json_dir=str(preds_dir),
        raw_dataset_dir=raw_dataset_dir,
        method="pose2_slam",
        confidence_threshold=0.93,
        use_axis_alignment=True,
        allowed_wdo_types=["door", "window", "opening"],
        predictions_data_root=preds_root,
        plot_save_dir=str(tmp_path / "plots"),
    )
    finite = [r for r in reports if np.isfinite(r.avg_abs_rot_err)]
    assert finite, "no floor produced a finite report"
    best = min(finite, key=lambda r: r.avg_abs_rot_err)
    # Inferred W/D/Os are noisier than GT; allow looser gates than the GT test.
    assert best.avg_abs_rot_err < 20.0
    assert best.percent_panos_localized > 30.0
