"""Parity test: batched Stage A kernel vs the host per-pair implementation."""

from pathlib import Path

import numpy as np
import pytest

from salve_tpu.common.pano_data import FloorData
from salve_tpu.hypotheses import batched, wdo_alignment
from salve_tpu.hypotheses.wdo_alignment import AlignTransformType
from salve_tpu.utils.io import read_json_file

REF = Path("/root/reference/tests/test_data")


@pytest.mark.skipif(not REF.exists(), reason="reference fixtures unavailable")
class TestBatchedMatchesHost:
    @pytest.mark.parametrize("building_id", ["0000", "1210"])
    def test_inferred_mode_parity(self, building_id) -> None:
        """Same hypotheses (object, idxs, config, pose) as the host loop."""
        d = read_json_file(REF / "ZInD" / building_id / "zind_data.json")
        for floor_id, floor_data in d["merger"].items():
            fd = FloorData.from_json(floor_data, floor_id)
            pano_dict = {p.id: p for p in fd.panos}
            ids = sorted(pano_dict.keys())
            pairs = [(i1, i2) for i1 in ids for i2 in ids if i1 < i2]
            if not pairs:
                continue

            batched_out = batched.align_floor_pairs_batched(
                pano_dict, pairs, use_inferred_wdos_layout=True
            )
            for (i1, i2) in pairs:
                host_hyps, _ = wdo_alignment.align_rooms_by_wd(
                    pano_dict[i1],
                    pano_dict[i2],
                    transform_type=AlignTransformType.SE2,
                    use_inferred_wdos_layout=True,
                )
                dev_hyps = batched_out[(i1, i2)]
                key = lambda h: (h.wdo_alignment_object, h.i1_wdo_idx, h.i2_wdo_idx, h.configuration)
                host_sorted = sorted(host_hyps, key=key)
                dev_sorted = sorted(dev_hyps, key=key)
                assert [key(h) for h in host_sorted] == [key(h) for h in dev_sorted], (
                    building_id, floor_id, i1, i2,
                )
                for hh, dh in zip(host_sorted, dev_sorted):
                    assert np.allclose(hh.i2Ti1.rotation, dh.i2Ti1.rotation, atol=1e-4)
                    assert np.allclose(hh.i2Ti1.translation, dh.i2Ti1.translation, atol=1e-4)
