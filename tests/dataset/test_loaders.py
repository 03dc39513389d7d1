"""Dataset-layer integration tests on the real ZInD mini-fixtures."""

import numpy as np

import salve_tpu.common.posegraph2d as posegraph2d
import salve_tpu.dataset.hnet_prediction_loader as hnet_prediction_loader
from salve_tpu.dataset.mhnet_prediction import MHNetDWO, merge_wdos_straddling_img_border
from salve_tpu.dataset.zind_partition import DATASET_SPLITS


def test_dataset_splits_counts() -> None:
    """Official ZInD partition: 1575 tours total."""
    assert len(DATASET_SPLITS["train"]) == 1260
    assert len(DATASET_SPLITS["val"]) == 157
    assert len(DATASET_SPLITS["test"]) == 158
    all_ids = DATASET_SPLITS["train"] + DATASET_SPLITS["val"] + DATASET_SPLITS["test"]
    assert len(set(all_ids)) == 1575


def test_get_gt_pose_graph_building_0000(ref_test_data) -> None:
    pg = posegraph2d.get_gt_pose_graph("0000", "floor_01", str(ref_test_data / "ZInD"))
    assert len(pg.nodes) > 0
    pano = next(iter(pg.nodes.values()))
    assert pano.room_vertices_local_2d.shape[1] == 2
    # Rotation must be orthonormal after the handedness conversion.
    R = pano.global_Sim2_local.rotation
    assert np.allclose(R.T @ R, np.eye(2), atol=1e-5)
    assert pg.scale_meters_per_coordinate > 0
    # Camera height: scale product, in plausible meters.
    h = pg.get_camera_height_m(pano.id)
    assert 0.5 < h < 3.0


def test_load_inferred_floor_pose_graphs_building_0000(ref_test_data) -> None:
    graphs = hnet_prediction_loader.load_inferred_floor_pose_graphs(
        building_id="0000",
        raw_dataset_dir=str(ref_test_data / "ZInD"),
        predictions_data_root=str(ref_test_data / "ZInD_HorizonNet_predictions"),
    )
    assert "floor_01" in graphs
    pg = graphs["floor_01"]
    assert len(pg.nodes) > 5
    pano = next(iter(pg.nodes.values()))
    # RDP-simplified layout should be much smaller than the 1024-pt contour.
    assert 4 <= len(pano.room_vertices_local_2d) < 200
    # MHNet predictions carry no W/D/O heights.
    for wdo in pano.all_wdos:
        assert np.isnan(wdo.top_z)


def test_merge_wdos_straddling_img_border() -> None:
    # Two halves of one door wrapping the pano seam.
    wdos = [MHNetDWO(s=0.001, e=0.05), MHNetDWO(s=0.9, e=0.995)]
    merged = merge_wdos_straddling_img_border(wdos)
    assert len(merged) == 1
    assert merged[0].s == 0.9 and merged[0].e == 0.05
    # Nothing straddles: unchanged.
    wdos = [MHNetDWO(s=0.2, e=0.3), MHNetDWO(s=0.5, e=0.6)]
    assert merge_wdos_straddling_img_border(wdos) == wdos
