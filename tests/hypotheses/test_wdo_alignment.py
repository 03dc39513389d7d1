"""Stage-A hypothesis generation — numeric fixtures mirror the reference's
tests/utils/test_wdo_alignment.py (two real ZInD panos with window detections)."""

import numpy as np

import salve_tpu.hypotheses.wdo_alignment as wdo_alignment
from salve_tpu.common.pano_data import PanoData
from salve_tpu.common.wdo import WDO
from salve_tpu.geometry.sim2 import Sim2
from salve_tpu.hypotheses.wdo_alignment import AlignTransformType


def _make_pano_pair():
    wTi5 = Sim2(
        R=np.array([[0.999897, -0.01435102], [0.01435102, 0.999897]], dtype=np.float32),
        t=np.array([0.7860708, -1.57248], dtype=np.float32),
        s=0.4042260417272217,
    )
    wTi8 = Sim2(
        R=np.array([[0.02998102, -0.99955046], [0.99955046, 0.02998102]], dtype=np.float32),
        t=np.array([0.91035557, -3.2141], dtype=np.float32),
        s=0.4042260417272217,
    )
    pano1_obj = PanoData(
        id=5,
        global_Sim2_local=wTi5,
        room_vertices_local_2d=np.array(
            [
                [1.46363621, -2.43808616],
                [1.3643741, 0.5424695],
                [0.73380685, 0.52146958],
                [0.7149462, 1.08780075],
                [0.4670652, 1.07954551],
                [0.46914653, 1.01704912],
                [-1.2252865, 0.96061904],
                [-1.10924507, -2.5237714],
            ]
        ),
        image_path="panos/floor_01_partial_room_05_pano_5.jpg",
        label="living room",
        doors=[],
        windows=[
            WDO(
                global_Sim2_local=wTi5,
                pt1=(-1.0367953294361147, -2.5213585867749635),
                pt2=(-0.4661345615720372, -2.5023537435761822),
                bottom_z=-0.5746298535133153,
                top_z=0.38684337323286566,
                type="windows",
            ),
            WDO(
                global_Sim2_local=wTi5,
                pt1=(0.823799786466513, -2.45939477144822),
                pt2=(1.404932996095547, -2.4400411621788427),
                bottom_z=-0.5885416433689703,
                top_z=0.3591070365687572,
                type="windows",
            ),
        ],
        openings=[],
    )
    pano2_obj = PanoData(
        id=8,
        global_Sim2_local=wTi8,
        room_vertices_local_2d=np.array(
            [
                [-0.7336625, -1.3968136],
                [2.23956454, -1.16554334],
                [2.19063694, -0.53652654],
                [2.75557561, -0.4925832],
                [2.73634178, -0.2453117],
                [2.67399906, -0.25016098],
                [2.54252291, 1.44010577],
                [-0.93330008, 1.16974146],
            ]
        ),
        image_path="panos/floor_01_partial_room_05_pano_8.jpg",
        label="living room",
        doors=[],
        windows=[
            WDO(
                global_Sim2_local=wTi8,
                pt1=(-0.9276784906829552, 1.0974698581331057),
                pt2=(-0.8833992085857922, 0.5282122352406332),
                bottom_z=-0.5746298535133153,
                top_z=0.38684337323286566,
                type="windows",
            ),
            WDO(
                global_Sim2_local=wTi8,
                pt1=(-0.7833093301499523, -0.758550412558342),
                pt2=(-0.7382174598580689, -1.338254727497497),
                bottom_z=-0.5885416433689703,
                top_z=0.3591070365687572,
                type="windows",
            ),
        ],
        openings=[],
    )
    return pano1_obj, pano2_obj


def test_align_rooms_by_wd_two_windows() -> None:
    """Of 4 window-window hypotheses, only 2 survive freespace constraints."""
    pano1_obj, pano2_obj = _make_pano_pair()
    hypotheses, num_invalid = wdo_alignment.align_rooms_by_wd(
        pano1_obj,
        pano2_obj,
        transform_type=AlignTransformType.SE2,
        use_inferred_wdos_layout=False,
    )
    assert len(hypotheses) == 2
    assert num_invalid == 2
    # Windows only admit the identity configuration.
    assert all(h.configuration == "identity" for h in hypotheses)
    assert all(h.wdo_alignment_object == "window" for h in hypotheses)
    # The surviving matches must be the corresponding window pairs (0-0, 1-1):
    # windows share bottom/top z across the pair by construction.
    assert sorted((h.i1_wdo_idx, h.i2_wdo_idx) for h in hypotheses) == [(0, 0), (1, 1)]


def test_align_rooms_by_wd_inferred_mode_width_only() -> None:
    """Inferred mode skips the freespace check: all width-plausible pairs pass."""
    pano1_obj, pano2_obj = _make_pano_pair()
    hypotheses, num_invalid = wdo_alignment.align_rooms_by_wd(
        pano1_obj,
        pano2_obj,
        transform_type=AlignTransformType.SE2,
        use_inferred_wdos_layout=True,
    )
    assert len(hypotheses) + num_invalid == 4


def test_obj_almost_equal() -> None:
    i2Ti1_pred = Sim2(
        R=np.array([[-0.99928814, 0.03772511], [-0.03772511, -0.99928814]], dtype=np.float32),
        t=np.array([-3.0711207, -0.5683456], dtype=np.float32),
        s=1.0,
    )
    i2Ti1_gt = Sim2(
        R=np.array([[-0.9999569, -0.00928213], [0.00928213, -0.9999569]], dtype=np.float32),
        t=np.array([-3.0890038, -0.5540818], dtype=np.float32),
        s=0.9999999999999999,
    )
    for obj in ["door", "window", "opening"]:
        assert wdo_alignment.obj_almost_equal(i2Ti1_pred, i2Ti1_gt, obj)
        assert wdo_alignment.obj_almost_equal(i2Ti1_gt, i2Ti1_pred, obj)


def test_are_visibly_adjacent() -> None:
    pano1_obj, pano2_obj = _make_pano_pair()
    # These two panos image the same living room: shared windows in world frame.
    assert wdo_alignment.are_visibly_adjacent(pano1_obj, pano2_obj)


def test_segment_hausdorff_distance() -> None:
    seg1 = np.array([[0.0, 0.0], [1.0, 0.0]])
    seg2 = np.array([[0.0, 0.5], [1.0, 0.5]])
    assert np.isclose(wdo_alignment.segment_hausdorff_distance(seg1, seg2), 0.5)
    # Identical segments regardless of orientation.
    assert np.isclose(wdo_alignment.segment_hausdorff_distance(seg1, seg1[::-1]), 0.0)
