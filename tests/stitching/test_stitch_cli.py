"""End-to-end stitching test on fixture building 0000 with real MHNet preds."""

from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference/tests/test_data")


@pytest.mark.skipif(not REF.exists(), reason="reference fixtures unavailable")
def test_stitch_building_layouts(tmp_path) -> None:
    from salve_tpu.cli.stitch_floor_plan import stitch_building_layouts
    from salve_tpu.common import posegraph2d
    from salve_tpu.utils.io import save_json_file

    building_id = "0000"
    raw_dataset_dir = str(REF / "ZInD")
    hnet_pred_dir = str(REF / "ZInD_HorizonNet_predictions")

    # Build an est-localization JSON from the GT pose graph (a perfect SfM run).
    gt_pg = posegraph2d.get_gt_pose_graph(building_id, "floor_01", raw_dataset_dir)
    wSi_dict = {}
    for i, pano in gt_pg.nodes.items():
        S = pano.global_Sim2_local
        wSi_dict[i] = {"R": S.rotation.tolist(), "t": S.translation.tolist(), "s": S.scale}
    loc_fpath = tmp_path / "0000__floor_01.json"
    save_json_file(
        str(loc_fpath),
        {
            "building_id": building_id,
            "floor_id": "floor_01",
            "scale_meters_per_coordinate": gt_pg.scale_meters_per_coordinate,
            "wSi_dict": wSi_dict,
        },
    )

    # Guard against layout degeneracy from the SfM result loader: corner
    # layouts must span 2D (a bad worldmetric column pick collapses them).
    from salve_tpu.dataset import salve_sfm_result_loader
    from salve_tpu.dataset.salve_sfm_result_loader import EstimatedBoundaryType

    pg_corners = salve_sfm_result_loader.load_estimated_pose_graph(
        json_fpath=loc_fpath,
        boundary_type=EstimatedBoundaryType.HNET_CORNERS,
        raw_dataset_dir=raw_dataset_dir,
        predictions_data_root=hnet_pred_dir,
    )
    for pano in pg_corners.nodes.values():
        verts = pano.room_vertices_local_2d
        if verts.shape[0] >= 3:
            assert np.ptp(verts[:, 0]) > 0.1
            assert np.ptp(verts[:, 1]) > 0.1

    out_dir = tmp_path / "stitched"
    stitch_building_layouts(
        building_id=building_id,
        hnet_pred_dir=hnet_pred_dir,
        raw_dataset_dir=raw_dataset_dir,
        est_localization_fpath=str(loc_fpath),
        output_dir=str(out_dir),
    )
    assert (out_dir / "fused" / "final.png").exists()
