"""CLI: evaluate oracle-pose + predicted-layout floorplans (parity: scripts/eval_floorplan.py)."""

from __future__ import annotations

import glob
import logging
from pathlib import Path

import click

from salve_tpu.common import posegraph2d
from salve_tpu.common.floor_reconstruction_report import (
    FloorReconstructionReport,
    summarize_reports,
)
from salve_tpu.common.posegraph2d import PoseGraph2d
from salve_tpu.dataset import hnet_prediction_loader
from salve_tpu.dataset.zind_partition import DATASET_SPLITS

logger = logging.getLogger(__name__)


def eval_oraclepose_predictedlayout(
    raw_dataset_dir: str,
    predictions_data_root: str,
    split: str,
    viz_save_dir: str,
) -> list:
    """GT poses + inferred MHNet layouts vs GT floorplan (upper bound)."""
    reports = []
    building_ids = sorted(
        Path(p).stem for p in glob.glob(f"{raw_dataset_dir}/*") if Path(p).is_dir()
    )
    for building_id in building_ids:
        if building_id not in DATASET_SPLITS[split]:
            continue
        floor_pose_graphs = hnet_prediction_loader.load_inferred_floor_pose_graphs(
            building_id=building_id,
            raw_dataset_dir=raw_dataset_dir,
            predictions_data_root=predictions_data_root,
        )
        if floor_pose_graphs is None:
            continue
        for floor_id, inferred_pg in floor_pose_graphs.items():
            gt_pg = posegraph2d.get_gt_pose_graph(building_id, floor_id, raw_dataset_dir)
            # Oracle poses: GT poses with inferred layouts.
            est_pg = PoseGraph2d.from_aligned_est_poses_and_inferred_layouts(
                gt_pg, inferred_pg
            )
            reports.append(
                FloorReconstructionReport.from_est_floor_pose_graph(
                    est_pg, gt_pg, plot_save_dir=viz_save_dir
                )
            )
    return reports


@click.command(help="Evaluate oracle-pose + predicted-layout floorplans against GT.")
@click.option("--raw_dataset_dir", type=click.Path(exists=True), required=True)
@click.option("--mhnet_predictions_data_root", type=click.Path(exists=True), required=True)
@click.option("--split", type=click.Choice(["train", "val", "test"]), default="test")
@click.option("--viz_save_dir", type=str, default="oraclepose_predicted_layout")
def run_eval_floorplan(raw_dataset_dir, mhnet_predictions_data_root, split, viz_save_dir) -> None:
    logging.basicConfig(level=logging.INFO)
    reports = eval_oraclepose_predictedlayout(
        raw_dataset_dir, mhnet_predictions_data_root, split, viz_save_dir
    )
    for k, v in summarize_reports(reports).items():
        click.echo(f"{k} = {v:.3f}")


if __name__ == "__main__":
    run_eval_floorplan()
