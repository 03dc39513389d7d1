"""Integration test: fused Stage B+C CLI writes Stage-D-parsable predictions.

Builds a minimal on-disk building (panos + depth cache + hypothesis JSONs in
the exporter grammar), scores it through cli/test_fused.score_building_fused
with a tiny verifier, and asserts the batch_{i}.json output round-trips
through common/edge_classification.get_edge_classifications_from_serialized_preds
— the same parser Stage D (cli/run_sfm.py) uses in production.
"""

import glob
import json

import jax
import numpy as np
import pytest

from salve_tpu.cli.test_fused import score_building_fused
from salve_tpu.common.edge_classification import (
    get_edge_classifications_from_serialized_preds,
)
from salve_tpu.geometry.sim2 import Sim2
from salve_tpu.rendering.bev_pair import BEVRenderConfig
from salve_tpu.training import train as train_lib
from salve_tpu.training.config import TrainingConfig


@pytest.fixture(scope="module")
def tiny_state_cfg():
    cfg = TrainingConfig(
        num_layers=18,
        resize_h=64, resize_w=64,
        train_h=56, train_w=56,
        modalities=("ceiling_rgb_texture", "floor_rgb_texture"),
        compute_dtype="float32",
    )
    state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0), max_iter=10)
    return state, cfg


def _write_building(root, building_id="0999", floor_id="floor_01"):
    """Panos, depth cache, and hypothesis JSONs for a 3-pano floor."""
    import imageio.v2 as imageio

    rng = np.random.default_rng(0)
    pano_dir = root / "zind" / building_id / "panos"
    pano_dir.mkdir(parents=True)
    depth_dir = root / "depth" / building_id
    depth_dir.mkdir(parents=True)
    for pid in (0, 2, 7):
        stem = f"{floor_id}_partial_room_{pid:02d}_pano_{pid}"
        imageio.imwrite(
            str(pano_dir / f"{stem}.jpg"),
            rng.integers(0, 255, (64, 128, 3)).astype(np.uint8),
        )
        imageio.imwrite(
            str(depth_dir / f"{stem}.depth.png"),
            rng.integers(1000, 4000, (512, 1024)).astype(np.uint16),
        )

    hyp_dir_pos = root / "hyp" / building_id / floor_id / "gt_alignment_approx"
    hyp_dir_neg = root / "hyp" / building_id / floor_id / "incorrect_alignment"
    hyp_dir_pos.mkdir(parents=True)
    hyp_dir_neg.mkdir(parents=True)
    Sim2.from_theta_deg(30.0, np.array([1.0, 0.5])).save_as_json(
        str(hyp_dir_pos / "0_2__door_0_1_identity.json")
    )
    Sim2.from_theta_deg(120.0, np.array([-2.0, 0.0])).save_as_json(
        str(hyp_dir_neg / "0_2__door_0_0_rotated.json")
    )
    Sim2.from_theta_deg(-45.0, np.array([0.0, 3.0])).save_as_json(
        str(hyp_dir_neg / "2_7__window_1_0_identity.json")
    )
    return building_id, floor_id


def test_fused_cli_roundtrips_through_stage_d_parser(tmp_path, tiny_state_cfg):
    state, cfg = tiny_state_cfg
    building_id, floor_id = _write_building(tmp_path)
    preds_dir = tmp_path / "preds"
    preds_dir.mkdir()

    n = score_building_fused(
        building_id,
        hypotheses_save_root=str(tmp_path / "hyp"),
        raw_dataset_dir=str(tmp_path / "zind"),
        depth_save_root=str(tmp_path / "depth"),
        state=state,
        cfg=cfg,
        serialization_save_dir=str(preds_dir),
        batch_size=2,
        render_cfg=BEVRenderConfig(img_px=100, meters_per_px=0.1, crop_ratio=0.1),
    )
    assert n >= 1

    batch_files = sorted(glob.glob(str(preds_dir / "batch_*.json")))
    total = 0
    for bf in batch_files:
        data = json.load(open(bf))
        total += len(data["y_hat"])
        assert set(data) == {"y_hat", "y_true", "y_hat_probs", "fp0", "fp1"}
    assert total == 3  # every hypothesis scored exactly once

    # The production Stage D parser reconstructs every measurement.
    measurements = get_edge_classifications_from_serialized_preds(
        query_building_id=building_id,
        query_floor_id=floor_id,
        serialized_preds_json_dir=str(preds_dir),
        hypotheses_save_root=str(tmp_path / "hyp"),
    )
    mlist = measurements[(building_id, floor_id)]
    assert len(mlist) == 3
    keyed = {(m.i1, m.i2, m.wdo_pair_uuid, m.configuration) for m in mlist}
    assert keyed == {
        (0, 2, "door_0_1", "identity"),
        (0, 2, "door_0_0", "rotated"),
        (2, 7, "window_1_0", "identity"),
    }
    for m in mlist:
        assert m.y_hat in (0, 1)
        assert 0.0 <= m.prob <= 1.0
