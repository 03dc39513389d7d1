"""Capstone integration test: the COMPLETE pipeline through file contracts.

Synthesizes a ZInD-format building from fixture 0000's GT geometry (pano
JPGs random, depth maps ray-cast from the GT layouts), then runs every
stage through its real on-disk interface:

    Stage A  export_single_building_wdo_alignment_hypotheses -> hypothesis JSONs
    Stage B  render_building_floor_pairs (device renders) -> BEV JPG tree
    Stage C  evaluate() with a (tiny, untrained) verifier -> batch_{i}.json
    Stage D  run_incremental_reconstruction -> reports + serialized poses
    Stitch   (covered separately; needs MHNet dense boundaries)

With an untrained verifier the reconstruction quality is meaningless, so
assertions check the mechanics: every stage consumes the previous stage's
files, the grammar round-trips, and Stage D completes with a report.
"""

import glob
import json
import shutil
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference/tests/test_data")


@pytest.mark.skipif(not REF.exists(), reason="reference fixtures unavailable")
def test_full_pipeline_files_to_report(tmp_path) -> None:
    import imageio.v2 as imageio

    from salve_tpu.cli.run_sfm import run_incremental_reconstruction
    from salve_tpu.common import posegraph2d
    from salve_tpu.hypotheses.export import (
        export_single_building_wdo_alignment_hypotheses,
    )
    from salve_tpu.models.depth_net import synthesize_depth_from_layout
    from salve_tpu.rendering.dataset_renderer import render_building_floor_pairs
    from salve_tpu.training.config import TrainingConfig
    from salve_tpu.training.loop import evaluate
    from salve_tpu.training import train as train_lib

    building_id = "0000"
    floor_id = "floor_01"

    # --- Synthesize the raw dataset: GT JSON + panos + depth cache. -------
    raw_dir = tmp_path / "zind"
    bdir = raw_dir / building_id
    (bdir / "panos").mkdir(parents=True)
    shutil.copy(REF / "ZInD" / building_id / "zind_data.json", bdir / "zind_data.json")

    gt_pg = posegraph2d.get_gt_pose_graph(building_id, floor_id, str(raw_dir))
    depth_root = tmp_path / "depth"
    (depth_root / building_id).mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i, pano in gt_pg.nodes.items():
        stem = Path(pano.image_path).stem
        rgb = rng.integers(0, 255, (1024, 2048, 3), dtype=np.uint8)
        imageio.imwrite(str(bdir / "panos" / f"{stem}.jpg"), rgb)
        depth_m = synthesize_depth_from_layout(
            pano.room_vertices_local_2d,
            camera_height_m=gt_pg.get_camera_height_m(i),
            ceiling_height_m=2 * gt_pg.get_camera_height_m(i),
        )
        depth_mm = np.clip(np.round(depth_m * 1000), 0, 65535).astype(np.uint16)
        imageio.imwrite(
            str(depth_root / building_id / f"{stem}.depth.png"), depth_mm
        )

    # --- Stage A ----------------------------------------------------------
    hyp_root = tmp_path / "hypotheses"
    export_single_building_wdo_alignment_hypotheses(
        hypotheses_save_root=str(hyp_root),
        building_id=building_id,
        json_annot_fpath=str(bdir / "zind_data.json"),
        raw_dataset_dir=str(raw_dir),
        use_inferred_wdos_layout=False,
    )
    hyp_files = glob.glob(str(hyp_root / building_id / "*" / "*" / "*.json"))
    assert hyp_files, "Stage A produced no hypotheses"

    # Keep the test fast on the 1-core CI host: cap hypotheses per label
    # (the mechanics are identical; Stage B renders 2 surfaces per file).
    import os

    for label_dir in glob.glob(str(hyp_root / building_id / "*" / "*")):
        for extra in sorted(glob.glob(f"{label_dir}/*.json"))[4:]:
            os.remove(extra)

    # --- Stage B (RGB texture + layout modalities) -------------------------
    bev_root = tmp_path / "bev"
    layout_root = tmp_path / "layout"
    n = render_building_floor_pairs(
        depth_save_root=str(depth_root),
        bev_save_root=str(bev_root),
        hypotheses_save_root=str(hyp_root),
        raw_dataset_dir=str(raw_dir),
        building_id=building_id,
        floor_id=floor_id,
        layout_save_root=str(layout_root),
        render_modalities=["rgb_texture", "layout"],
        floor_pose_graph=gt_pg,
        batch_size=4,
    )
    assert n > 0, "Stage B rendered nothing"
    rendered = glob.glob(str(bev_root / "*" / building_id / "*.jpg"))
    assert len(rendered) >= 4
    layout_rendered = glob.glob(str(layout_root / "*" / building_id / "*.jpg"))
    # One layout pair (2 files) per hypothesis pair, floor surface only.
    assert len(layout_rendered) == len(rendered) // 2

    # --- Stage C (tiny untrained verifier; mechanics only) ----------------
    import jax

    cfg = TrainingConfig(
        num_layers=18,
        resize_h=64,
        resize_w=64,
        train_h=56,
        train_w=56,
        batch_size=4,
        workers=2,
        compute_dtype="float32",
        data_root=str(bev_root),
    )
    state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0), max_iter=1)
    ckpt = train_lib.save_checkpoint(str(tmp_path / "ckpt"), state, 0, 0.5, cfg)

    # Building 0000 belongs to the train split.
    preds_dir = tmp_path / "preds"
    evaluate(cfg, ckpt, "train", str(preds_dir))
    batch_files = glob.glob(str(preds_dir / "batch_*.json"))
    assert batch_files, "Stage C serialized no predictions"
    data = json.load(open(batch_files[0]))
    assert building_id in data["fp0"][0]

    # Sextuplet modality: the same rendered trees feed the 18-channel fusion
    # verifier (4 RGB textures + 2 layout rasters per example).
    cfg6 = TrainingConfig(
        num_layers=18,
        resize_h=64,
        resize_w=64,
        train_h=56,
        train_w=56,
        batch_size=4,
        workers=2,
        compute_dtype="float32",
        modalities=("ceiling_rgb_texture", "floor_rgb_texture", "layout"),
        data_root=str(bev_root),
        layout_data_root=str(layout_root),
    )
    state6 = train_lib.create_train_state(cfg6, jax.random.PRNGKey(0), max_iter=1)
    ckpt6 = train_lib.save_checkpoint(str(tmp_path / "ckpt6"), state6, 0, 0.5, cfg6)
    preds6_dir = tmp_path / "preds6"
    evaluate(cfg6, ckpt6, "train", str(preds6_dir))
    batch6 = glob.glob(str(preds6_dir / "batch_*.json"))
    assert batch6, "sextuplet Stage C serialized no predictions"

    # --- Stage D ----------------------------------------------------------
    reports = run_incremental_reconstruction(
        hypotheses_save_root=str(hyp_root),
        serialized_preds_json_dir=str(preds_dir),
        raw_dataset_dir=str(raw_dir),
        method="spanning_tree",
        confidence_threshold=0.0,  # untrained verifier: accept everything
        use_axis_alignment=False,
        allowed_wdo_types=["door", "window", "opening"],
        predictions_data_root=None,
        plot_save_dir=str(tmp_path / "plots"),
    )
    assert len(reports) >= 1
    # Every report is labeled with the floor it scores (multi-building
    # evaluations key on this).
    assert all(r.building_id is not None and r.floor_id is not None
               for r in reports)
    # Serialized pose graphs must exist for downstream stitching.
    serialized = glob.glob(str(tmp_path / "plots_serialized" / "*.json"))
    assert serialized, "Stage D serialized no pose graphs"
    loc = json.load(open(serialized[0]))
    assert set(loc.keys()) == {
        "building_id", "floor_id", "scale_meters_per_coordinate", "wSi_dict",
    }
