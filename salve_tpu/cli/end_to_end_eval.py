"""CLI: end-to-end accuracy evaluation on synthesized ZInD buildings.

Runs the ENTIRE pipeline through its real file contracts — Stage A
hypotheses -> depth cache -> Stage B BEV renders -> Stage C verifier
training + inference -> Stage D reconstruction -> FloorReconstructionReport
— and emits one JSON with verifier and reconstruction metrics.

This is the round-2 accuracy harness (VERDICT items #3/#7/#9): the fixture
geometry is redistributable but the imagery is not, so panos are ray-cast
from GT layouts (rendering/synthetic.py). The verifier trains on the train-
split building(s) and is scored on the held-out test building.

No reference analog as a single script; it chains the same stages as the
reference's README pipeline (export_alignment_hypotheses.py ->
batch_hohonet_inference.py -> render_dataset_bev.py -> train.py -> test.py
-> run_sfm.py).
"""

from __future__ import annotations

import glob
import json
import logging
import time
from pathlib import Path

import click
import numpy as np

logger = logging.getLogger(__name__)


def _finite(x):
    """float(x), or None when missing/non-finite (keeps the JSON strict)."""
    return float(x) if x is not None and np.isfinite(x) else None


def _report_dict(r):
    """One reconstruction summary entry (shared by full + stage-D-only runs)."""
    return {
        "building_id": r.building_id,
        "floor_id": r.floor_id,
        "avg_abs_rot_err_deg": _finite(r.avg_abs_rot_err),
        "avg_abs_trans_err": _finite(r.avg_abs_trans_err),
        "percent_panos_localized": _finite(r.percent_panos_localized),
        "floorplan_iou": _finite(r.floorplan_iou),
        "percent_in_top2_ccs": _finite(r.percent_in_top2_ccs),
        "percent_in_top3_ccs": _finite(r.percent_in_top3_ccs),
    }


def _per_building_verifier(preds_dir: Path) -> dict:
    """Group the serialized batch_{i}.json predictions by building id (the
    BEV render's parent directory) and compute per-building precision /
    recall / mAcc, so multi-building test splits stay comparable with
    single-building runs."""
    counts: dict = {}
    for fpath in sorted(preds_dir.glob("batch_*.json")):
        d = json.load(open(fpath))
        for yh, yt, fp0 in zip(d["y_hat"], d["y_true"], d["fp0"]):
            c = counts.setdefault(
                Path(fp0).parent.name, {"tp": 0, "fp": 0, "fn": 0, "tn": 0}
            )
            key = ("fn", "tn")[yh == yt] if yh == 0 else ("fp", "tp")[yh == yt]
            c[key] += 1
    out = {}
    for bid, c in sorted(counts.items()):
        npos, nneg = c["tp"] + c["fn"], c["tn"] + c["fp"]
        out[bid] = {
            "precision": c["tp"] / (c["tp"] + c["fp"]) if c["tp"] + c["fp"] else None,
            "recall": c["tp"] / npos if npos else None,
            "mAcc": (
                0.5 * (c["tp"] / npos + c["tn"] / nneg) if npos and nneg else None
            ),
            "num_pairs": npos + nneg,
        }
    return out


@click.command(help="End-to-end accuracy run on synthesized fixture buildings.")
@click.option("--src_zind_dir", type=click.Path(exists=True),
              default="/root/reference/tests/test_data/ZInD")
@click.option("--output_dir", type=str, required=True)
@click.option("--train_building", type=str, default="0000")
@click.option("--eval_building", type=str, default="1210")
@click.option("--num_layers", type=int, default=18)
@click.option("--num_epochs", type=int, default=8)
@click.option("--batch_size", type=int, default=16)
@click.option("--resize_px", type=int, default=128)
@click.option("--crop_px", type=int, default=112)
@click.option("--depth_ckpt", type=str, default=None,
              help="Trained PanoDepthNet msgpack; default uses exact GT depth.")
@click.option("--depth_num_layers", type=int, default=50)
@click.option("--confidence_threshold", type=float, default=0.5)
@click.option("--method", type=str, default="pose2_slam")
@click.option("--modalities", multiple=True,
              default=("ceiling_rgb_texture", "floor_rgb_texture"),
              type=click.Choice(["ceiling_rgb_texture", "floor_rgb_texture",
                                 "layout"]),
              help="Verifier input modalities. Including 'layout' renders "
                   "rasterized room-layout pairs (rendering/layout.py) next "
                   "to the RGB textures and trains the widened-stem fusion "
                   "model on the 2/4/6-image tuple the set implies.")
@click.option("--procedural_train_buildings", type=int, default=0,
              help="Additionally generate N procedural buildings (ids from the "
                   "train split) to scale verifier training data.")
@click.option("--procedural_val_buildings", type=int, default=0,
              help="Generate N procedural buildings with val-split ids so "
                   "best-checkpoint selection uses a real held-out val mAcc.")
@click.option("--procedural_val_pathological", type=int, default=0,
              help="Generate N ADDITIONAL val-split buildings with "
                   "style='pathological' (dataset/procedural.py): two wings "
                   "joined by single-door bridge edges. Round-4 val was too "
                   "clean to discriminate Stage-D configs (rescue/GLC never "
                   "fired); these give the val method freeze failures to "
                   "select on.")
@click.option("--procedural_val_rotation_traps", type=int, default=0,
              help="Generate N ADDITIONAL val-split buildings with "
                   "style='rotation_trap' (dataset/procedural.py): "
                   "exactly-equal door widths + forced same-width door "
                   "twins, seeding accepted 90-deg rotation-FP families ON "
                   "VAL so the method freeze can elect the rotation-"
                   "conflict resolver (--rotfix) when it deserves it. The "
                   "bridge-FN pathological style alone never fires rotfix "
                   "(ACCURACY_r05 findings.val_discrimination_limit).")
@click.option("--procedural_version", type=int, default=11,
              help="Generator vintage for TRAIN and VAL procedural ids "
                   "(v12 adds standard door widths + door twins). Eval ids "
                   "always use v11 so held-out geometry stays frozen across "
                   "rounds.")
@click.option("--eval_procedural_buildings", type=int, default=0,
              help="Generate N never-trained-on procedural buildings with "
                   "TEST-split ids and score the verifier + reconstruction "
                   "on them alongside --eval_building — widens held-out "
                   "accuracy evidence from one fixture building to N+1.")
@click.option("--photometric_augmentation", is_flag=True, default=False)
@click.option("--append_pair_difference", is_flag=True, default=False,
              help="Feed explicit per-pair difference channels to the "
                   "verifier stem (from-scratch training aid).")
@click.option("--resume_ckpt", type=str, default=None,
              help="Checkpoint to restore params/opt_state from before "
                   "training (training/loop.py resume_from) — continue an "
                   "interrupted Stage-C run without retraining from scratch.")
@click.option("--finetune_ckpt", type=str, default=None,
              help="Checkpoint to restore params/batch_stats ONLY (fresh "
                   "optimizer + LR schedule) — short follow-on training "
                   "over a grown corpus (training/loop.py finetune_from).")
@click.option("--calibrate_on_val", is_flag=True, default=False,
              help="Fit temperature scaling + ONE frozen operating point on "
                   "the val split (training/calibration.py): score val, fit "
                   "T by NLL, choose the threshold by a val reconstruction "
                   "sweep, then run the held-out Stage D at that single "
                   "frozen point (overrides --confidence_threshold). The "
                   "deployment story of the reference's fixed 0.93 "
                   "(scripts/run_sfm.py:617), earned on val instead of "
                   "swept on test.")
@click.option("--warp_corpus/--no_warp_corpus", default=None,
              help="Render the training/eval corpus img1s as Sim(2) warps of "
                   "per-pano identity banks (rendering/dataset_renderer.py; "
                   "default: on for TPU backends).")
@click.option("--decoded_cache_gb", type=float, default=None,
              help="In-RAM decoded-image cache budget for the train loop "
                   "(TrainingConfig.decoded_cache_gb; default 8). The "
                   "reference 234px recipe over a ~55k-pair corpus needs "
                   "~18 GB to avoid per-epoch JPEG re-decodes.")
@click.option("--device_corpus_gb", type=float, default=None,
              help="HBM budget for an on-device uint8 train corpus "
                   "(TrainingConfig.device_corpus_gb): upload the resized "
                   "train split to the mesh once and gather batches on "
                   "device — epochs run at device speed instead of "
                   "host-link speed. 0/unset streams from host.")
@click.option("--stage_d_only", is_flag=True, default=False,
              help="Reuse an existing output_dir (hypotheses + serialized "
                   "preds from a prior full run) and re-run only Stage D — "
                   "for confidence-threshold / method sweeps without "
                   "retraining. Writes a suffixed summary JSON.")
@click.option("--rescue_clusters", is_flag=True, default=False,
              help="Stage D connectivity rescue: re-join split components / "
                   "stranded panos with the most confident sub-threshold "
                   "crossings, gated by the wall-penetration validity check "
                   "(algorithms/cluster_merging.py). Applied consistently to "
                   "the calibration sweep and the held-out reconstruction.")
@click.option("--glc", is_flag=True, default=False,
              help="Filter edges by global/local consistency before "
                   "aggregation (algorithms/global_local_consistency.py), "
                   "applied consistently to calibration and held-out runs.")
@click.option("--rotfix", is_flag=True, default=False,
              help="Resolve contested wing attachments among accepted edges "
                   "(wall-penetration + pool-support tournament, "
                   "algorithms/cluster_merging.py:resolve_penetration_conflicts); "
                   "pairs with --rescue_clusters for re-attachment.")
@click.option("--freeze_method_on_val", is_flag=True, default=False,
              help="Extend --calibrate_on_val to ALSO elect the Stage-D "
                   "config on val: sweep {base, rescue, glc, glc+rescue} x "
                   "thresholds through the val reconstruction, freeze the "
                   "best (config, threshold) pair, and run held-out Stage D "
                   "once at that frozen point. Ties prefer the simpler "
                   "config. The deployment analog of the reference's one "
                   "shipped config (scripts/run_sfm.py:617).")
def run_end_to_end_eval(
    src_zind_dir, output_dir, train_building, eval_building, num_layers,
    num_epochs, batch_size, resize_px, crop_px, depth_ckpt, depth_num_layers,
    confidence_threshold, method, modalities, procedural_train_buildings,
    procedural_val_buildings, procedural_val_pathological,
    procedural_val_rotation_traps, procedural_version,
    eval_procedural_buildings,
    photometric_augmentation, append_pair_difference,
    calibrate_on_val, warp_corpus, resume_ckpt, finetune_ckpt,
    decoded_cache_gb, device_corpus_gb,
    stage_d_only, rescue_clusters, glc, rotfix, freeze_method_on_val,
) -> None:
    logging.basicConfig(level=logging.INFO)
    if num_epochs == 0 and not (finetune_ckpt or resume_ckpt) and not stage_d_only:
        raise click.UsageError(
            "--num_epochs 0 is eval-only: pass the checkpoint to score via "
            "--finetune_ckpt or --resume_ckpt"
        )
    t_start = time.time()
    out = Path(output_dir)
    raw_dir, depth_root = out / "zind", out / "depth"
    hyp_root, bev_root = out / "hypotheses", out / "bev"
    preds_dir, plots_dir = out / "preds", out / "plots"
    layout_root = out / "layout"
    use_layout = "layout" in modalities
    for d in (raw_dir, depth_root, hyp_root, bev_root, preds_dir, plots_dir):
        d.mkdir(parents=True, exist_ok=True)
    if use_layout:
        layout_root.mkdir(parents=True, exist_ok=True)

    if stage_d_only:
        _run_stage_d_only(
            out, hyp_root, raw_dir, preds_dir, plots_dir, method,
            confidence_threshold, t_start, rescue_clusters, glc, rotfix,
        )
        return

    from salve_tpu.common import floor_reconstruction_report, posegraph2d
    from salve_tpu.dataset.synthetic_zind import materialize_synthetic_building
    from salve_tpu.hypotheses.export import (
        export_single_building_wdo_alignment_hypotheses,
    )
    from salve_tpu.rendering.dataset_renderer import render_building_floor_pairs
    from salve_tpu.training.config import TrainingConfig
    from salve_tpu.training import loop as train_loop

    depth_provider = None
    if depth_ckpt:
        from salve_tpu.models.depth_net import load_depth_provider

        depth_provider = load_depth_provider(depth_ckpt, num_layers=depth_num_layers)

    src_dirs = {train_building: src_zind_dir, eval_building: src_zind_dir}
    eval_proc_ids: list = []
    if (procedural_train_buildings > 0 or procedural_val_buildings > 0
            or procedural_val_pathological > 0 or procedural_val_rotation_traps > 0
            or eval_procedural_buildings > 0):
        from salve_tpu.dataset.procedural import write_procedural_buildings
        from salve_tpu.dataset.zind_partition import DATASET_SPLITS

        # Procedural geometry rides unused train/val/test-split ids so the
        # split discovery (dataset/bev_pairs.py) picks it up without changes.
        proc_ids = [
            bid for bid in sorted(DATASET_SPLITS["train"])
            if bid not in (train_building, eval_building)
        ][:procedural_train_buildings]
        val_pool = [
            bid for bid in sorted(DATASET_SPLITS["val"])
            if bid not in (train_building, eval_building)
        ]
        proc_ids += val_pool[:procedural_val_buildings]
        # Pathological val buildings take the NEXT unused val ids: the clean
        # val set keeps its round-4 ids/geometry (calibration stays
        # comparable) and the pathological additions extend it.
        patho_ids = val_pool[
            procedural_val_buildings
            : procedural_val_buildings + procedural_val_pathological
        ]
        proc_ids += patho_ids
        # Rotation-trap val buildings take the ids AFTER the pathological
        # block, for the same reason: earlier val ids keep their geometry.
        rot_ids = val_pool[
            procedural_val_buildings + procedural_val_pathological
            : procedural_val_buildings + procedural_val_pathological
            + procedural_val_rotation_traps
        ]
        proc_ids += rot_ids
        # Held-out reconstruction targets: test-split ids seed NEVER-trained
        # geometry (seed derives from the id), scored exactly like
        # --eval_building through the same Stage A->D contracts. ALWAYS
        # generated at v11 so held-out geometry is frozen across rounds
        # (tests/dataset/test_procedural.py:test_v11_heldout_geometry_frozen).
        eval_proc_ids = [
            bid for bid in sorted(DATASET_SPLITS["test"])
            if bid not in (train_building, eval_building)
        ][:eval_procedural_buildings]
        proc_src = out / "procedural_zind"
        styles = {bid: "pathological" for bid in patho_ids}
        styles.update({bid: "rotation_trap" for bid in rot_ids})
        write_procedural_buildings(
            str(proc_src), proc_ids, base_seed=7,
            version=procedural_version,
            styles=styles,
        )
        write_procedural_buildings(
            str(proc_src), eval_proc_ids, base_seed=7, version=11
        )
        proc_ids += eval_proc_ids
        for bid in proc_ids:
            src_dirs[bid] = str(proc_src)
        logger.info(
            "generated %d procedural buildings (%d train / %d val / %d patho-val"
            " / %d rot-trap-val / %d eval ids)",
            len(proc_ids), procedural_train_buildings, procedural_val_buildings,
            len(patho_ids), len(rot_ids), len(eval_proc_ids),
        )

    buildings = sorted(src_dirs)
    timings = {}
    for bid in buildings:
        t0 = time.time()
        floors = materialize_synthetic_building(
            src_dirs[bid], bid, str(raw_dir),
            depth_save_root=str(depth_root), depth_provider=depth_provider,
        )
        timings[f"materialize_{bid}_s"] = round(time.time() - t0, 2)
        logger.info("materialized %s: %s", bid, floors)

        t0 = time.time()
        # Resume contract (same as depth cache / renders): a building whose
        # hypothesis JSONs are already on disk is not re-exported, so a
        # restarted run skips straight to the first incomplete stage.
        if not any(Path(hyp_root, bid).rglob("*.json")):
            export_single_building_wdo_alignment_hypotheses(
                hypotheses_save_root=str(hyp_root),
                building_id=bid,
                json_annot_fpath=str(raw_dir / bid / "zind_data.json"),
                raw_dataset_dir=str(raw_dir),
                use_inferred_wdos_layout=False,
            )
        timings[f"stage_a_{bid}_s"] = round(time.time() - t0, 2)

        t0 = time.time()
        n_pairs = 0
        for floor_id in posegraph2d.compute_available_floors_for_building(
            bid, str(raw_dir)
        ):
            # The synthesized buildings carry GT geometry, so the layout
            # modality (when requested) rasterizes the GT pose graph's room
            # polygons — the same source the RGB raycasts come from.
            floor_pg = (
                posegraph2d.get_gt_pose_graph(bid, floor_id, str(raw_dir))
                if use_layout else None
            )
            n_pairs += render_building_floor_pairs(
                depth_save_root=str(depth_root),
                bev_save_root=str(bev_root),
                hypotheses_save_root=str(hyp_root),
                raw_dataset_dir=str(raw_dir),
                building_id=bid,
                floor_id=floor_id,
                layout_save_root=str(layout_root) if use_layout else None,
                render_modalities=(
                    ["rgb_texture", "layout"] if use_layout else ["rgb_texture"]
                ),
                floor_pose_graph=floor_pg,
                use_warp=warp_corpus,
            )
        timings[f"stage_b_{bid}_s"] = round(time.time() - t0, 2)
        logger.info("rendered %d pairs for %s", n_pairs, bid)

    # --- Stage C: train on the train split, score the test split. ---------
    cfg = TrainingConfig(
        num_layers=num_layers,
        resize_h=resize_px, resize_w=resize_px,
        train_h=crop_px, train_w=crop_px,
        batch_size=batch_size,
        num_epochs=num_epochs,
        workers=4,
        modalities=tuple(modalities),
        # Layout-only tuples are discovered by globbing data_root itself
        # (dataset/bev_pairs.py:56), so it must point at the layout tree.
        data_root=str(layout_root) if set(modalities) == {"layout"} else str(bev_root),
        layout_data_root=str(layout_root) if use_layout else "",
        model_save_dirpath=str(out / "ckpts"),
        # Fixture-scale data is ~1:8 imbalanced; plain CE collapses.
        class_balanced_loss=True,
        apply_photometric_augmentation=photometric_augmentation,
        append_pair_difference=append_pair_difference,
        # Pin the requested train/eval buildings to their roles regardless of
        # the official ZInD partition, so cross-validation flips (e.g.
        # --train_building 1210 --eval_building 0000) actually flip.
        split_overrides={train_building: "train", eval_building: "test"},
    )
    if decoded_cache_gb is not None:
        cfg.decoded_cache_gb = decoded_cache_gb
    if device_corpus_gb is not None:
        cfg.device_corpus_gb = device_corpus_gb
    if num_epochs == 0:
        # Eval-only (validated up front): score an existing checkpoint on
        # the (possibly widened) test split without any Stage-C training.
        ckpt_fpath = finetune_ckpt or resume_ckpt
        results = None
        timings["stage_c_train_s"] = 0.0
    else:
        t0 = time.time()
        results = train_loop.train(
            cfg, resume_from=resume_ckpt, finetune_from=finetune_ckpt
        )
        timings["stage_c_train_s"] = round(time.time() - t0, 2)

        ckpts = sorted(glob.glob(str(out / "ckpts" / "*" / "train_ckpt.flax")))
        assert ckpts, "training saved no checkpoint"
        ckpt_fpath = ckpts[-1]

    t0 = time.time()
    prec, rec, mAcc = train_loop.evaluate(cfg, ckpt_fpath, "test", str(preds_dir))
    timings["stage_c_eval_s"] = round(time.time() - t0, 2)
    logger.info("verifier on test split: prec %.3f rec %.3f mAcc %.3f", prec, rec, mAcc)

    # --- Stage D: reconstruction + metrics on the held-out building. ------
    from salve_tpu.cli.run_sfm import run_incremental_reconstruction

    calibration_summary = None
    frozen_flags = {
        "rescue_clusters": rescue_clusters, "glc": glc, "rotfix": rotfix,
    }
    if calibrate_on_val or freeze_method_on_val:
        if freeze_method_on_val:
            # Ordered simplest-first: ties elect the simpler config (a
            # mechanism must EARN its place on val, the round-4 lesson in
            # reverse — this round val contains pathological geometry the
            # mechanisms can actually win on).
            config_grid = [
                ("pose2_slam",
                 {"rescue_clusters": False, "glc": False, "rotfix": False}),
                ("pose2_slam_rescue",
                 {"rescue_clusters": True, "glc": False, "rotfix": False}),
                ("pose2_slam_glc",
                 {"rescue_clusters": False, "glc": True, "rotfix": False}),
                ("pose2_slam_glc_rescue",
                 {"rescue_clusters": True, "glc": True, "rotfix": False}),
                ("pose2_slam_rotfix_rescue",
                 {"rescue_clusters": True, "glc": False, "rotfix": True}),
                ("pose2_slam_glc_rotfix_rescue",
                 {"rescue_clusters": True, "glc": True, "rotfix": True}),
            ]
        else:
            config_grid = [(method, dict(frozen_flags))]
        t0 = time.time()
        calibration_summary, confidence_threshold, frozen_flags = (
            _calibrate_on_val_split(
                cfg, ckpt_fpath, out, hyp_root, raw_dir, plots_dir, method,
                config_grid=config_grid,
            )
        )
        timings["calibration_s"] = round(time.time() - t0, 2)
        logger.info(
            "frozen operating point from val: raw conf %.4f (T=%.3f) config=%s",
            confidence_threshold, calibration_summary["temperature"],
            calibration_summary.get("frozen_config"),
        )

    t0 = time.time()
    reports = run_incremental_reconstruction(
        hypotheses_save_root=str(hyp_root),
        serialized_preds_json_dir=str(preds_dir),
        raw_dataset_dir=str(raw_dir),
        method=method,
        confidence_threshold=confidence_threshold,
        use_axis_alignment=False,
        allowed_wdo_types=["door", "window", "opening"],
        predictions_data_root=None,
        plot_save_dir=str(plots_dir),
        rescue_clusters=frozen_flags["rescue_clusters"],
        filter_edges_by_global_local_consistency=frozen_flags["glc"],
        resolve_rot_conflicts=frozen_flags["rotfix"],
    )
    timings["stage_d_s"] = round(time.time() - t0, 2)

    summary = {
        "train_building": train_building,
        "eval_building": eval_building,
        "eval_procedural_buildings": eval_proc_ids,
        "verifier": {
            "precision": float(prec),
            "recall": float(rec),
            "mAcc": float(mAcc),
            "per_building": _per_building_verifier(preds_dir),
            "ckpt": ckpt_fpath,
            "train_mAcc_last": (
                float(results["train_mAcc"][-1]) if results else None
            ),
            "val_mAcc_best": (
                float(max(results["val_mAcc"])) if results else None
            ),
            "train_mAcc_history": (
                [float(v) for v in results["train_mAcc"]] if results else []
            ),
            "num_layers": num_layers,
            "num_epochs": num_epochs,
            "modalities": list(modalities),
        },
        "depth": "model:" + depth_ckpt if depth_ckpt else "gt_raycast",
        "reconstruction": [_report_dict(r) for r in reports],
        # Corpus rollup in the reference's summarize_reports format
        # (floor_reconstruction_report.py:353): mean+median of the four
        # metrics + top-2/3-CC completeness over all held-out floors.
        "reconstruction_summary": {
            k: _finite(v)
            for k, v in floor_reconstruction_report.summarize_reports(reports).items()
        },
        "method": method,
        "rescue_clusters": frozen_flags["rescue_clusters"],
        "glc": frozen_flags["glc"],
        "rotfix": frozen_flags["rotfix"],
        "confidence_threshold": confidence_threshold,
        "calibration": calibration_summary,
        "warp_corpus": warp_corpus,
        "timings_s": timings,
        "total_wallclock_s": round(time.time() - t_start, 2),
    }
    with open(out / "end_to_end_eval.json", "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


def _calibrate_on_val_split(
    cfg, ckpt_fpath, out, hyp_root, raw_dir, plots_dir, method,
    threshold_grid=(0.5, 0.7, 0.8, 0.9, 0.93),
    config_grid=None,
):
    """Fit temperature + freeze ONE operating point using the val split only.

    1. Score the val split (procedural val-id buildings) -> val batch JSONs.
    2. Fit scalar temperature by NLL (training/calibration.py).
    3. Sweep CALIBRATED thresholds — and, when `config_grid` has several
       entries, Stage-D configs (rescue / GLC combinations) — through the
       full Stage D reconstruction of the val buildings; freeze the
       (config, threshold) with the best mean floorplan IoU (ties -> higher
       localization, then higher threshold, then the EARLIER = simpler
       config).
    Returns (summary_dict, frozen_raw_threshold, frozen_flags). Everything
    here reads val data only — the held-out split stays untouched until the
    caller applies the frozen point once.
    """
    from salve_tpu.cli.run_sfm import run_incremental_reconstruction
    from salve_tpu.training import calibration
    from salve_tpu.training import loop as train_loop

    if config_grid is None:
        config_grid = [
            (method,
             {"rescue_clusters": False, "glc": False, "rotfix": False})
        ]

    # Key the val predictions by checkpoint so a later run over the same
    # output_dir (e.g. an RN152 recipe pass reusing the rendered corpus)
    # never calibrates against a stale model's predictions.
    ckpt_tag = Path(ckpt_fpath).parent.name if ckpt_fpath else "none"
    val_preds_dir = out / f"val_preds_{ckpt_tag}"
    val_preds_dir.mkdir(parents=True, exist_ok=True)
    if not any(val_preds_dir.glob("batch_*.json")):
        train_loop.evaluate(cfg, ckpt_fpath, "val", str(val_preds_dir))
    if not any(val_preds_dir.glob("batch_*.json")):
        raise click.UsageError(
            "--calibrate_on_val needs a non-empty val split: pass "
            "--procedural_val_buildings N so val-id buildings are rendered."
        )

    fit = calibration.fit_from_preds(str(val_preds_dir))
    temperature = fit["temperature"]

    sweep = {}
    # best key: (iou, loc, t_cal, -config_rank) — earlier config wins ties.
    best = None
    best_sel = None  # (t_raw, flags, config_name)
    for rank, (config_name, flags) in enumerate(config_grid):
        cfg_sweep = {}
        for t_cal in threshold_grid:
            t_raw = calibration.raw_threshold_for_calibrated(t_cal, temperature)
            reports = run_incremental_reconstruction(
                hypotheses_save_root=str(hyp_root),
                serialized_preds_json_dir=str(val_preds_dir),
                raw_dataset_dir=str(raw_dir),
                method=method,
                confidence_threshold=t_raw,
                use_axis_alignment=False,
                allowed_wdo_types=["door", "window", "opening"],
                predictions_data_root=None,
                plot_save_dir=str(plots_dir / f"val_calib_{config_name}_{t_cal:g}"),
                rescue_clusters=flags["rescue_clusters"],
                filter_edges_by_global_local_consistency=flags["glc"],
                resolve_rot_conflicts=flags.get("rotfix", False),
                save_plots=False,
            )
            ious = [r.floorplan_iou for r in reports if r.floorplan_iou is not None]
            locs = [
                r.percent_panos_localized
                for r in reports
                if r.percent_panos_localized is not None
            ]
            mean_iou = float(np.mean(ious)) if ious else 0.0
            mean_loc = float(np.mean(locs)) if locs else 0.0
            cfg_sweep[f"{t_cal:g}"] = {
                "raw_equivalent": round(float(t_raw), 4),
                "val_mean_iou": round(mean_iou, 4),
                "val_mean_loc": round(mean_loc, 2),
                "n_floors": len(ious),
            }
            key = (round(mean_iou, 4), round(mean_loc, 2), t_cal, -rank)
            if best is None or key > best:
                best = key
                best_sel = (float(t_raw), dict(flags), config_name, t_cal)
        sweep[config_name] = cfg_sweep

    t_raw, flags, config_name, t_cal = best_sel
    summary = dict(fit)
    summary["val_reconstruction_sweep"] = sweep
    summary["frozen_threshold_calibrated"] = t_cal
    summary["frozen_threshold_raw"] = round(t_raw, 4)
    summary["frozen_config"] = config_name
    summary["frozen_flags"] = flags
    summary["selection_rule"] = (
        "max val mean IoU (ties: loc, then threshold, then simpler config)"
    )
    return summary, t_raw, flags


def _run_stage_d_only(
    out, hyp_root, raw_dir, preds_dir, plots_dir, method,
    confidence_threshold, t_start, rescue_clusters=False, glc=False,
    rotfix=False,
) -> None:
    """Stage D over a prior run's hypotheses + serialized predictions."""
    from salve_tpu.cli.run_sfm import run_incremental_reconstruction

    assert any(preds_dir.glob("*.json")), (
        f"--stage_d_only needs serialized predictions in {preds_dir} "
        "(run the full pipeline once first)"
    )
    reports = run_incremental_reconstruction(
        hypotheses_save_root=str(hyp_root),
        serialized_preds_json_dir=str(preds_dir),
        raw_dataset_dir=str(raw_dir),
        method=method,
        confidence_threshold=confidence_threshold,
        use_axis_alignment=False,
        allowed_wdo_types=["door", "window", "opening"],
        predictions_data_root=None,
        plot_save_dir=str(plots_dir),
        rescue_clusters=rescue_clusters,
        filter_edges_by_global_local_consistency=glc,
        resolve_rot_conflicts=rotfix,
    )
    from salve_tpu.common import floor_reconstruction_report

    summary = {
        "stage_d_only": True,
        "method": method,
        "rescue_clusters": rescue_clusters,
        "glc": glc,
        "rotfix": rotfix,
        "confidence_threshold": confidence_threshold,
        "reconstruction": [_report_dict(r) for r in reports],
        "reconstruction_summary": {
            k: _finite(v)
            for k, v in floor_reconstruction_report.summarize_reports(reports).items()
        },
        "total_wallclock_s": round(time.time() - t_start, 2),
    }
    tag = f"{method}_conf{confidence_threshold:g}"
    if glc:
        tag += "_glc"
    if rotfix:
        tag += "_rotfix"
    if rescue_clusters:
        tag += "_rescue"
    with open(out / f"end_to_end_eval_stage_d_{tag}.json", "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    run_end_to_end_eval()
