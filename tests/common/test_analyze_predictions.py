"""Tests for the verifier error-analysis CLI (cli/analyze_predictions.py).

No reference counterpart — the reference eyeballs serialized
visualizations instead; this tool automates the edge-level taxonomy the
round-3 floor_01 forensics established (ACCURACY_r03.json).
"""

import json

import numpy as np

from salve_tpu.cli.analyze_predictions import (
    analyze_floor,
    classify_fp_families,
    load_hypothesis_records,
)
from salve_tpu.geometry.sim2 import Sim2

RAW = "/root/reference/tests/test_data/ZInD"


def _bev_fname(pair_idx, wdo, i, j, config, pano_id):
    return (
        f"pair_{pair_idx}___{wdo}_{i}_{j}_{config}_floor_rgb_"
        f"floor_01_partial_room_01_pano_{pano_id}.jpg"
    )


class TestLoadHypothesisRecords:
    def test_parses_batch_wire_format(self, tmp_path) -> None:
        batch = {
            "y_hat": [1, 0],
            "y_true": [0, 1],
            "y_hat_probs": [0.9, 0.8],
            "fp0": [
                _bev_fname(0, "opening", 2, 0, "rotated", 3),
                _bev_fname(1, "door", 0, 0, "identity", 5),
            ],
            "fp1": [
                _bev_fname(0, "opening", 2, 0, "rotated", 5),
                _bev_fname(1, "door", 0, 0, "identity", 7),
            ],
        }
        (tmp_path / "batch_0.json").write_text(json.dumps(batch))
        recs = load_hypothesis_records(str(tmp_path))
        assert len(recs) == 2
        # P(positive) is argmax-class prob re-signed.
        assert recs[0]["p_pos"] == 0.9 and recs[0]["y_true"] == 0
        assert abs(recs[1]["p_pos"] - 0.2) < 1e-9
        assert recs[0]["wdo"] == "opening"
        assert recs[0]["wdo_idxs"] == (2, 0)
        assert recs[0]["edge"] == (3, 5)


class TestConnectivityAudit:
    def test_bridge_fn_edges_and_stranded_panos(self) -> None:
        """The 0010 failure shape: a wing reachable only through one hub.
        Edges (0,1),(1,2) confident; (2,3) is a GT-positive bridge below
        threshold; (3,4) confident within the stranded wing."""

        def rec(edge, p, y=1):
            return {
                "y_true": y, "p_pos": p, "wdo": "door", "wdo_idxs": (0, 0),
                "config": "identity", "floor": "floor_01",
                "rooms": ("01", "02"), "edge": edge,
            }

        records = [
            rec((0, 1), 0.99), rec((1, 2), 0.98),
            rec((2, 3), 0.7),               # bridge FN at 0.93
            rec((3, 4), 0.97),
            rec((0, 4), 0.99, y=0),          # accepted FP also keeps edges
        ]
        out = analyze_floor(records, [0.93])
        conn = out["thresholds"][0.93]["connectivity"]
        # The FP edge (0,4) joins the wing back -> single component.
        assert conn["n_components"] == 1
        # Without the FP: two components, (2,3) is the bridge FN.
        out2 = analyze_floor(records[:4], [0.93])
        conn2 = out2["thresholds"][0.93]["connectivity"]
        assert conn2["n_components"] == 2
        assert conn2["component_sizes"] == [3, 2]
        assert conn2["stranded_panos"] == [3, 4]
        assert conn2["pct_in_largest_cc"] == 60.0
        assert conn2["bridge_fn_edges"] == [
            {"edge": [2, 3], "best_p": 0.7, "joins_component_sizes": [2, 3]}
        ]
        # At a permissive threshold everything is one component.
        conn3 = analyze_floor(records[:4], [0.5])["thresholds"][0.5][
            "connectivity"
        ]
        assert conn3["n_components"] == 1 and not conn3["bridge_fn_edges"]


class TestClassifyFpFamilies:
    def test_slide_rotation_near_miss(self, tmp_path) -> None:
        """Synthesized FPs against the real 1210 GT graph land in the
        right families."""
        from salve_tpu.common import posegraph2d

        gt = posegraph2d.get_gt_pose_graph("1210", "floor_01", RAW)
        gt_rel = (
            gt.nodes[5].global_Sim2_local.inverse()
            .compose(gt.nodes[3].global_Sim2_local)
        )
        hyp_dir = tmp_path / "hyp" / "1210" / "floor_01" / "incorrect_alignment"
        hyp_dir.mkdir(parents=True)

        def hyp(name, dtheta, dt):
            s = Sim2.from_theta_deg(
                gt_rel.theta_deg + dtheta, gt_rel.translation + np.array(dt)
            )
            s.save_as_json(str(hyp_dir / name))

        hyp("3_5__door_0_0_identity.json", 0.0, (0.8, 0.0))  # slide
        hyp("3_5__door_0_1_rotated.json", 90.0, (0.0, 0.0))  # rotation
        hyp("3_5__door_1_0_identity.json", 0.0, (0.05, 0.0))  # near_miss

        records = [
            {
                "y_true": 0, "p_pos": p, "wdo": "door", "wdo_idxs": idxs,
                "config": cfg, "floor": "floor_01", "rooms": ("01", "02"),
                "edge": (3, 5),
            }
            for p, idxs, cfg in [
                (0.99, (0, 0), "identity"),
                (0.8, (0, 1), "rotated"),
                (0.7, (1, 0), "identity"),
            ]
        ]
        fams = classify_fp_families(
            records, str(tmp_path / "hyp"), RAW, "1210", threshold=0.5
        )
        by_wdo = {d["wdo"] + "/" + d["config"]: d for d in fams["floor_01"]}
        assert by_wdo["door_0_0/identity"]["family"] == "slide"
        assert by_wdo["door_0_1/rotated"]["family"] == "rotation"
        assert by_wdo["door_1_0/identity"]["family"] == "near_miss"
        assert abs(by_wdo["door_0_0/identity"]["trans_err_m"] - 0.8) < 0.05
        # Sorted by confidence, below-threshold records excluded.
        assert fams["floor_01"][0]["p_pos"] == 0.99
        fams2 = classify_fp_families(
            records, str(tmp_path / "hyp"), RAW, "1210", threshold=0.95
        )
        assert len(fams2["floor_01"]) == 1
