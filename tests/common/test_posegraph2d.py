"""PoseGraph2d evaluation tests (fixtures from reference tests/common/test_posegraph2d.py)."""

import numpy as np

from salve_tpu.common import posegraph2d
from salve_tpu.common.posegraph2d import PoseGraph2d
from salve_tpu.geometry.poses import Sim3
from salve_tpu.geometry.rotations import rotmat2d


def test_convert_Sim3_to_Sim2() -> None:
    """(x,y,z) -> (x,y) projection of a near-planar Similarity(3)."""
    R3 = np.array([[0.999997, 0.00256117, 0], [-0.00256117, 0.999997, 0], [0, 0, 1]])
    a_Sim3_b = Sim3(R3, np.array([0.02309136, -0.00173048, 0.0]), 1.0653604360576439)

    a_Sim2_b = posegraph2d.convert_Sim3_to_Sim2(a_Sim3_b)

    assert np.allclose(a_Sim2_b.rotation, np.array([[0.999997, 0.00256117], [-0.00256117, 0.999997]]))
    assert np.allclose(a_Sim2_b.translation, np.array([0.02309136, -0.00173048]))
    assert np.isclose(a_Sim2_b.scale, 1.0653604360576439)


def test_measure_avg_rel_rotation_err() -> None:
    """Relative-rotation error, all nodes estimated.

    A common +5 deg shift on panos 0 and 1 cancels on edge (0,1); the 3-edge
    case spreads 10 deg of total error across 3 edges.
    """
    wRi_list = [rotmat2d(5), rotmat2d(95), rotmat2d(0)]
    est = PoseGraph2d.from_wRi_list(wRi_list, "000", "floor_01")
    wRi_list_gt = [rotmat2d(0), rotmat2d(90), rotmat2d(0)]
    gt = PoseGraph2d.from_wRi_list(wRi_list_gt, "000", "floor_01")

    assert est.measure_avg_rel_rotation_err(gt_floor_pg=gt, gt_edges=[(0, 1)]) == 0
    err3 = est.measure_avg_rel_rotation_err(gt_floor_pg=gt, gt_edges=[(0, 1), (1, 2), (0, 2)])
    assert np.isclose(err3, 10 / 3, atol=1e-3)


def test_measure_avg_rel_rotation_err_unestimated() -> None:
    """Edges touching an unestimated node are excluded: only (0,1) counts."""
    wRi_list = [rotmat2d(105), rotmat2d(190), None]
    est = PoseGraph2d.from_wRi_list(wRi_list, "000", "floor_01")
    wRi_list_gt = [rotmat2d(0), rotmat2d(90), rotmat2d(0)]
    gt = PoseGraph2d.from_wRi_list(wRi_list_gt, "000", "floor_01")

    err = est.measure_avg_rel_rotation_err(gt_floor_pg=gt, gt_edges=[(0, 1), (1, 2), (0, 2)])
    assert np.isclose(err, 5.0, atol=1e-5)


def test_measure_avg_abs_rotation_err() -> None:
    """Absolute rotation error after global angular alignment.

    Raw offsets (105, 105, 100) align to ~103.3, leaving (1.7, 1.7, 3.3)-deg
    residuals -> mean 2.222.
    """
    est = PoseGraph2d.from_wRi_list([rotmat2d(105), rotmat2d(195), rotmat2d(100)], "000", "floor_01")
    gt = PoseGraph2d.from_wRi_list([rotmat2d(0), rotmat2d(90), rotmat2d(0)], "000", "floor_01")

    assert np.isclose(est.measure_avg_abs_rotation_err(gt_floor_pg=gt), 2.222, atol=1e-3)


def test_measure_abs_pose_error_shifted() -> None:
    """Two pose graphs identical besides a (-1, 0) shift: Sim(3) alignment
    resolves the shift, so both error terms are ~0."""
    wRi_list = [rotmat2d(0), rotmat2d(90), rotmat2d(0)]
    wti_list = [np.array([-1, 0]), np.array([-1, 4]), np.array([3, 0])]
    wti_list_gt = [np.array([0, 0]), np.array([0, 4]), np.array([4, 0])]

    # Donor graph supplying (empty) layouts/W/D/Os for from_wRi_wti_lists.
    donor = PoseGraph2d.from_wRi_list(wRi_list, "000", "floor_01")
    est = PoseGraph2d.from_wRi_wti_lists(wRi_list, wti_list, donor)
    gt = PoseGraph2d.from_wRi_wti_lists(wRi_list, wti_list_gt, donor)

    avg_rot_error, avg_trans_error, _, _ = est.measure_unaligned_abs_pose_error(gt_floor_pg=gt)
    assert np.isclose(avg_rot_error, 0.0, atol=1e-3)
    assert np.isclose(avg_trans_error, 0.0, atol=1e-3)


def test_as_json_roundtrip(tmp_path):
    """as_json/from_json round-trips poses, layouts, and scale.

    The reference declares as_json but raises NotImplementedError
    (salve/common/posegraph2d.py:277); the rebuild implements it.
    """
    import numpy as np

    from salve_tpu.common.pano_data import PanoData
    from salve_tpu.common.posegraph2d import PoseGraph2d
    from salve_tpu.geometry.sim2 import Sim2

    nodes = {
        3: PanoData(
            id=3,
            global_Sim2_local=Sim2.from_theta_deg(30.0, np.array([1.0, 2.0]), 1.5),
            room_vertices_local_2d=np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0]]),
            image_path="panos/floor_01_pano_3.jpg",
            label="kitchen",
        )
    }
    pg = PoseGraph2d("0000", "floor_01", nodes, scale_meters_per_coordinate=3.5)
    fpath = str(tmp_path / "pg.json")
    pg.as_json(fpath)
    pg2 = PoseGraph2d.from_json(fpath)
    assert pg2.building_id == "0000" and pg2.floor_id == "floor_01"
    assert pg2.scale_meters_per_coordinate == 3.5
    assert np.allclose(
        pg2.nodes[3].global_Sim2_local.matrix, pg.nodes[3].global_Sim2_local.matrix
    )
    assert np.allclose(pg2.nodes[3].room_vertices_local_2d, nodes[3].room_vertices_local_2d)
    assert pg2.nodes[3].label == "kitchen"


def test_draw_edge_plots_dotted_line():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    from salve_tpu.common.pano_data import PanoData
    from salve_tpu.common.posegraph2d import PoseGraph2d
    from salve_tpu.geometry.sim2 import Sim2

    nodes = {
        0: PanoData(0, Sim2(np.eye(2), np.array([0.0, 0.0]), 1.0), np.zeros((3, 2)), "a", "x"),
        1: PanoData(1, Sim2(np.eye(2), np.array([2.0, 1.0]), 1.0), np.zeros((3, 2)), "b", "y"),
    }
    pg = PoseGraph2d("0000", "floor_01", nodes, 1.0)
    plt.figure()
    pg.draw_edge(0, 1, color="g")
    line = plt.gca().lines[-1]
    assert list(line.get_xdata()) == [0.0, 2.0]
    assert list(line.get_ydata()) == [0.0, 1.0]
    plt.close("all")
