"""MHNet prediction parsing tests (fixtures from reference tests/dataset/test_mhnet_prediction.py)."""

from pathlib import Path

import numpy as np
import pytest

from salve_tpu.dataset.mhnet_prediction import (
    MHNetDWO,
    MHNetPanoStructurePrediction,
    merge_wdos_straddling_img_border,
)

_PREDICTIONS_SAMPLE_ROOT = Path("/root/reference/tests/test_data/ZInD_HorizonNet_predictions")
_ZIND_SAMPLE_ROOT = Path("/root/reference/tests/test_data/ZInD")


def test_merge_wdos_straddling_img_border_empty() -> None:
    """Empty W/D/O list stays an empty list."""
    merged = merge_wdos_straddling_img_border(wdo_instances=[])
    assert merged == []
    assert isinstance(merged, list)


def test_merge_wdos_straddling_img_border_doors_no_straddle() -> None:
    """Doors not touching the seam pass through unchanged (ZInD 0000 pano 17)."""
    doors = [
        MHNetDWO(s=0.14467253176930597, e=0.3704789833822092),
        MHNetDWO(s=0.45356793743890517, e=0.46920821114369504),
        MHNetDWO(s=0.47702834799608995, e=0.5278592375366569),
        MHNetDWO(s=0.5376344086021505, e=0.5865102639296188),
        MHNetDWO(s=0.6217008797653959, e=0.8084066471163245),
    ]
    merged = merge_wdos_straddling_img_border(wdo_instances=doors)
    assert merged == doors
    assert len(merged) == 5


def test_merge_wdos_straddling_img_border_openings() -> None:
    """Seam-straddling opening halves merge into one wrap-around span."""
    openings = [
        MHNetDWO(s=0.0009775171065493646, e=0.10361681329423265),
        MHNetDWO(s=0.9354838709677419, e=1.0),
    ]
    merged = merge_wdos_straddling_img_border(wdo_instances=openings)
    assert len(merged) == 1
    assert merged[0] == MHNetDWO(s=0.9354838709677419, e=0.10361681329423265)


@pytest.mark.skipif(not _PREDICTIONS_SAMPLE_ROOT.exists(), reason="reference fixtures unavailable")
def test_from_json_fpath_building_0000_pano_2() -> None:
    """Full MHNet JSON -> prediction parse on the real fixture file."""
    building_id = "0000"
    stem = "floor_01_partial_room_09_pano_2"
    json_fpath = _PREDICTIONS_SAMPLE_ROOT / "horizon_net" / building_id / f"{stem}.json"
    image_fpath = _ZIND_SAMPLE_ROOT / building_id / "panos" / f"{stem}.jpg"

    result = MHNetPanoStructurePrediction.from_json_fpath(json_fpath=json_fpath, image_fpath=image_fpath)

    assert result.image_width == 1024
    assert result.image_height == 512
    assert result.image_fpath == image_fpath

    assert isinstance(result.corners_in_uv, np.ndarray)
    assert result.corners_in_uv.shape == (20, 2)
    assert np.allclose(
        result.corners_in_uv[:2],
        np.array([[0.02813019, 0.35113618], [0.02813019, 0.64691073]]),
    )

    assert result.floor_boundary.shape == (1024,)
    assert np.allclose(
        result.floor_boundary[:6],
        np.array([326.23584, 325.536102, 324.849243, 324.179382, 323.147888, 322.917572]),
    )
    assert result.floor_boundary_uncertainty.shape == (1024,)
    assert np.allclose(
        result.floor_boundary_uncertainty[:6],
        np.array([10.536544, 10.46075, 10.376159, 10.330658, 9.964458, 9.891422]),
    )

    assert result.doors == [MHNetDWO(s=0.4359726295210166, e=0.5640273704789834)]
    assert result.windows == [
        MHNetDWO(s=0.6383186705767351, e=0.6598240469208211),
        MHNetDWO(s=0.6695992179863147, e=0.6930596285434996),
    ]
    # Two openings merge into one wrap-around span (straddles the seam).
    assert result.openings == [
        MHNetDWO(s=0.8299120234604106, e=0.8690127077223851),
        MHNetDWO(s=0.9130009775171065, e=0.024437927663734114),
    ]


@pytest.mark.skipif(not _PREDICTIONS_SAMPLE_ROOT.exists(), reason="reference fixtures unavailable")
def test_floor_corner_rows_match_floor_boundary() -> None:
    """Floor corners are the ODD interleave rows: their v-coords coincide with

    the dense floor boundary at the same pixel column (guards against the
    ceiling/floor swap present in the reference's debug getter)."""
    building_id = "0000"
    stem = "floor_01_partial_room_09_pano_2"
    json_fpath = _PREDICTIONS_SAMPLE_ROOT / "horizon_net" / building_id / f"{stem}.json"
    result = MHNetPanoStructurePrediction.from_json_fpath(
        json_fpath=json_fpath, image_fpath=_ZIND_SAMPLE_ROOT / building_id / "panos" / f"{stem}.jpg"
    )
    floor_uv = result.get_floor_corners_image()
    ceil_uv = result.get_ceiling_corners_image()
    cols = np.clip(floor_uv[:, 0].astype(int), 0, 1023)
    floor_err = np.abs(floor_uv[:, 1] - result.floor_boundary[cols])
    ceil_err = np.abs(ceil_uv[:, 1] - result.floor_boundary[cols])
    # Corner columns sit on boundary discontinuities, so allow some pixels of
    # slack; the swapped choice is two orders of magnitude off.
    assert np.median(floor_err) < 15.0
    assert np.median(ceil_err) > 100.0
