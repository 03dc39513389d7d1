"""Tests for W/D/O landmark data association (parity fixtures)."""

from types import SimpleNamespace

import numpy as np

from salve_tpu.algorithms import data_association
from salve_tpu.common.pano_data import PanoData
from salve_tpu.common.wdo import WDO
from salve_tpu.geometry.sim2 import Sim2


def _wdo(pt1, pt2, wtype):
    return WDO(
        global_Sim2_local=Sim2.identity(),
        pt1=tuple(pt1),
        pt2=tuple(pt2),
        bottom_z=0.0,
        top_z=2.0,
        type=wtype,
    )


def _pano(pano_id, openings=(), windows=(), doors=()):
    return PanoData(
        id=pano_id,
        global_Sim2_local=Sim2.identity(),
        room_vertices_local_2d=np.zeros((4, 2)),
        image_path="",
        label="",
        doors=list(doors),
        windows=list(windows),
        openings=list(openings),
    )


class TestKptIdx:
    def test_ordering_openings_windows_doors(self) -> None:
        pano = _pano(
            0,
            openings=[_wdo((0, 0), (1, 0), "openings")],
            windows=[_wdo((2, 0), (3, 0), "windows"), _wdo((4, 0), (5, 0), "windows")],
            doors=[_wdo((6, 0), (7, 0), "doors")],
        )
        assert data_association.get_kpt_idx(0, "opening", pano) == 0
        assert data_association.get_kpt_idx(0, "window", pano) == 2
        assert data_association.get_kpt_idx(1, "window", pano) == 4
        assert data_association.get_kpt_idx(0, "door", pano) == 6

    def test_kpt_coordinate(self) -> None:
        pano = _pano(
            0,
            openings=[_wdo((0, 0), (1, 0), "openings")],
            doors=[_wdo((6, 0), (7, 1), "doors")],
        )
        assert np.allclose(data_association.get_kpt_coordinate(pano, 0), [0, 0])
        assert np.allclose(data_association.get_kpt_coordinate(pano, 3), [7, 1])


class TestPerformDataAssociation:
    def test_identity_and_rotated_matches(self) -> None:
        pano_dict = {
            0: _pano(0, doors=[_wdo((0, 0), (1, 0), "doors")]),
            1: _pano(1, doors=[_wdo((5, 0), (6, 0), "doors")]),
            2: _pano(2, doors=[_wdo((9, 0), (10, 0), "doors")]),
        }
        measurements = [
            SimpleNamespace(i1=0, i2=1, wdo_pair_uuid="door_0_0", configuration="identity"),
            SimpleNamespace(i1=1, i2=2, wdo_pair_uuid="door_0_0", configuration="rotated"),
        ]
        tracks = data_association.perform_data_association(
            measurements, pano_dict_inferred=pano_dict
        )
        # Start of pano 0's door joins start of pano 1's door, which joins
        # END of pano 2's door (rotated config swaps endpoints).
        assert sorted(map(tuple, tracks)) == [
            [(0, 0), (1, 0), (2, 1)],
            [(0, 1), (1, 1), (2, 0)],
        ] or len(tracks) == 2
        flat = {tuple(t) for t in map(tuple, tracks)}
        assert ((0, 0), (1, 0), (2, 1)) in flat
        assert ((0, 1), (1, 1), (2, 0)) in flat

    def test_erroneous_track_dropped(self) -> None:
        """A track visiting the same pano twice is rejected."""
        pano_dict = {
            0: _pano(0, doors=[_wdo((0, 0), (1, 0), "doors"), _wdo((2, 0), (3, 0), "doors")]),
            1: _pano(1, doors=[_wdo((5, 0), (6, 0), "doors")]),
        }
        measurements = [
            SimpleNamespace(i1=0, i2=1, wdo_pair_uuid="door_0_0", configuration="identity"),
            SimpleNamespace(i1=0, i2=1, wdo_pair_uuid="door_1_0", configuration="identity"),
        ]
        tracks = data_association.perform_data_association(
            measurements, pano_dict_inferred=pano_dict
        )
        # Both of pano 0's doors merge into pano 1's single door ->
        # every resulting track has pano 0 twice -> all dropped.
        assert tracks == []
