"""End-to-end Stage A -> (simulated Stage C) -> Stage D -> report test.

Runs on the real ZInD fixture building 0000: generate alignment hypotheses
from GT W/D/O annotations, simulate perfect verifier predictions in the
serialized batch-JSON format, run global aggregation, and check the
reconstruction report against GT poses.
"""

import glob
import json
from pathlib import Path

import numpy as np
import pytest

from salve_tpu.cli.run_sfm import run_incremental_reconstruction
from salve_tpu.hypotheses.export import export_single_building_wdo_alignment_hypotheses
from salve_tpu.utils.io import save_json_file


@pytest.fixture(scope="module")
def sfm_workspace(tmp_path_factory, ref_test_data=None):
    """Hypotheses + simulated predictions for fixture building 0000."""
    ref = Path("/root/reference/tests/test_data")
    if not ref.exists():
        pytest.skip("reference test data unavailable")
    tmp_path = tmp_path_factory.mktemp("sfm_e2e")

    building_id = "0000"
    raw_dataset_dir = str(ref / "ZInD")
    hyp_root = str(tmp_path / "hypotheses")
    export_single_building_wdo_alignment_hypotheses(
        hypotheses_save_root=hyp_root,
        building_id=building_id,
        json_annot_fpath=f"{raw_dataset_dir}/{building_id}/zind_data.json",
        raw_dataset_dir=raw_dataset_dir,
        use_inferred_wdos_layout=False,
    )

    # Simulate a perfect verifier: y_hat == y_true, prob 0.99.
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
                stem = Path(hyp_fpath).stem  # {i1}_{i2}__{uuid}_{config}
                i1, i2 = stem.split("__")[0].split("_")[:2]
                uuid_config = stem.split("__")[1]
                fname0 = (
                    f"pair_{pair_counter}___{uuid_config}_ceiling_rgb_{floor_id}"
                    f"_partial_room_00_pano_{i1}.jpg"
                )
                fname1 = (
                    f"pair_{pair_counter}___{uuid_config}_ceiling_rgb_{floor_id}"
                    f"_partial_room_00_pano_{i2}.jpg"
                )
                fp0s.append(str(render_dir / fname0))
                fp1s.append(str(render_dir / fname1))
                y_hat.append(label)
                y_true.append(label)
                probs.append(0.99)
                pair_counter += 1

    save_json_file(
        str(preds_dir / "batch_0.json"),
        {"y_hat": y_hat, "y_true": y_true, "y_hat_probs": probs, "fp0": fp0s, "fp1": fp1s},
    )
    return {
        "hyp_root": hyp_root,
        "preds_dir": str(preds_dir),
        "raw_dataset_dir": raw_dataset_dir,
        "tmp_path": tmp_path,
        "num_positive": sum(y_true),
    }


class TestEndToEndSfM:
    def test_hypotheses_and_predictions_exist(self, sfm_workspace) -> None:
        assert sfm_workspace["num_positive"] > 0

    def test_rescue_clusters_recovers_split_floor(self, sfm_workspace) -> None:
        """Verifier FNs on every bridge edge strand half the floor; the
        connectivity rescue (sub-threshold crossings gated by the
        wall-penetration check) must win localization back. Models the
        building-0010 failure: panos 8-12 reachable only through pano 7,
        all three (7,x) crossings rejected -> 61.5% localized."""
        preds = json.load(
            open(Path(sfm_workspace["preds_dir"]) / "batch_0.json")
        )
        # Demote every GT-positive edge that crosses the median pano id to
        # sub-threshold confidence (0.7 < 0.93, above the 0.5 rescue floor).
        pano_ids = set()
        pairs = []
        for fp0 in preds["fp0"]:
            i1 = int(Path(fp0).stem.split("_pano_")[-1])
            pano_ids.add(i1)
        for fp1 in preds["fp1"]:
            pano_ids.add(int(Path(fp1).stem.split("_pano_")[-1]))
        cut = float(np.median(sorted(pano_ids)))
        probs = list(preds["y_hat_probs"])
        n_demoted = 0
        for k, (fp0, fp1, y) in enumerate(
            zip(preds["fp0"], preds["fp1"], preds["y_true"])
        ):
            i1 = int(Path(fp0).stem.split("_pano_")[-1])
            i2 = int(Path(fp1).stem.split("_pano_")[-1])
            if y == 1 and (i1 <= cut) != (i2 <= cut):
                probs[k] = 0.7
                n_demoted += 1
        assert n_demoted > 0, "fixture has no cross-partition positives"
        demoted_dir = sfm_workspace["tmp_path"] / "preds_fn_bridges"
        demoted_dir.mkdir(exist_ok=True)
        save_json_file(
            str(demoted_dir / "batch_0.json"), {**preds, "y_hat_probs": probs}
        )

        def run(rescue: bool):
            reports = run_incremental_reconstruction(
                hypotheses_save_root=sfm_workspace["hyp_root"],
                serialized_preds_json_dir=str(demoted_dir),
                raw_dataset_dir=sfm_workspace["raw_dataset_dir"],
                method="pose2_slam",
                confidence_threshold=0.93,
                use_axis_alignment=False,
                allowed_wdo_types=["door", "window", "opening"],
                predictions_data_root=None,
                plot_save_dir=str(
                    sfm_workspace["tmp_path"] / f"plots_rescue_{rescue}"
                ),
                rescue_clusters=rescue,
            )
            locs = [
                r.percent_panos_localized
                for r in reports
                if np.isfinite(r.avg_abs_rot_err)
            ]
            return float(np.mean(locs)) if locs else 0.0

        loc_plain, loc_rescued = run(False), run(True)
        assert loc_rescued > loc_plain, (
            f"rescue did not improve localization ({loc_plain} -> {loc_rescued})"
        )
        assert loc_rescued > 90.0

    @pytest.mark.parametrize("method", ["spanning_tree", "pgo", "SE2_cycles", "filtered_spanning_tree"])
    def test_reconstruction(self, sfm_workspace, method) -> None:
        reports = run_incremental_reconstruction(
            hypotheses_save_root=sfm_workspace["hyp_root"],
            serialized_preds_json_dir=sfm_workspace["preds_dir"],
            raw_dataset_dir=sfm_workspace["raw_dataset_dir"],
            method=method,
            confidence_threshold=0.93,
            use_axis_alignment=False,
            allowed_wdo_types=["door", "window", "opening"],
            predictions_data_root=None,
            plot_save_dir=str(sfm_workspace["tmp_path"] / f"plots_{method}"),
        )
        assert len(reports) >= 1
        # At least one floor should reconstruct with decent quality: GT-derived
        # hypotheses + perfect verifier => small pose errors.
        best = min(
            (r for r in reports if np.isfinite(r.avg_abs_rot_err)),
            key=lambda r: r.avg_abs_rot_err,
            default=None,
        )
        assert best is not None, "no floor produced a finite report"
        assert best.avg_abs_rot_err < 10.0
        assert best.percent_panos_localized > 50.0
        assert best.floorplan_iou > 0.3
        # Paper completeness metric (index.html:246): top-k CC percentages
        # are populated, ordered, and can only add panos beyond the
        # spanning tree's single-component localization.
        for r in reports:
            if not np.isfinite(r.avg_abs_rot_err):
                continue
            assert 0.0 <= r.percent_in_top2_ccs <= r.percent_in_top3_ccs <= 100.0
            assert r.percent_in_top2_ccs >= r.percent_panos_localized - 1e-6
