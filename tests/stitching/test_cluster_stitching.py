"""Full fusion flow on the reference's example_input_stiching fixture.

Drives the complete cluster -> dense-shape -> grouping -> refinement ->
raster-IoU pipeline that the reference's scripts/stitch_floor_plan.py
intended (WIP there), and pins the fused-floorplan quality.
"""

import json
import pathlib

import pytest

FIXTURE = pathlib.Path("/root/reference/tests/test_data/example_input_stiching")


@pytest.mark.skipif(not FIXTURE.exists(), reason="fixture unavailable")
def test_stitch_clusters_full_flow(tmp_path) -> None:
    from salve_tpu.stitching.cluster_stitching import stitch_clusters

    scores = stitch_clusters(
        est_localization_fpath=str(FIXTURE / "cluster_pred.json"),
        hnet_pred_dir=str(FIXTURE / "pano"),
        path_gt_floor_map=str(FIXTURE / "floor_map_gt.json"),
        output_dir=str(tmp_path),
        render=False,
    )
    assert len(scores) == 1
    score = scores[0]
    assert score["n_panos"] == 56
    # Measured 0.8456 (cluster rooms) / 0.8120 (whole GT floor) — regression
    # guard with slack for raster resolution changes.
    assert score["iou"] > 0.80
    assert score["iou_all"] > 0.77
    # score.json serialized next to the fused renders.
    with open(tmp_path / "score.json") as f:
        assert json.load(f)[0]["iou"] == pytest.approx(score["iou"])
