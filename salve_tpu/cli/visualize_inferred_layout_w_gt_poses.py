"""CLI: render inferred MHNet layouts at GT poses
(parity: scripts/visualize_inferred_layout_w_gt_poses.py)."""

from __future__ import annotations

import os

import click

from salve_tpu.common import posegraph2d
from salve_tpu.common.posegraph2d import PoseGraph2d
from salve_tpu.common.floor_reconstruction_report import render_floorplans_side_by_side
from salve_tpu.dataset import hnet_prediction_loader


@click.command(help="Render inferred layouts placed at GT poses, next to GT floorplan.")
@click.option("--raw_dataset_dir", type=click.Path(exists=True), required=True)
@click.option("--mhnet_predictions_data_root", type=click.Path(exists=True), required=True)
@click.option("--building_id", type=str, required=True)
@click.option("--save_dir", type=str, default="inferred_layout_w_gt_poses")
def run_visualize_inferred_layout_w_gt_poses(
    raw_dataset_dir, mhnet_predictions_data_root, building_id, save_dir
) -> None:
    os.makedirs(save_dir, exist_ok=True)
    floor_pose_graphs = hnet_prediction_loader.load_inferred_floor_pose_graphs(
        building_id=building_id,
        raw_dataset_dir=raw_dataset_dir,
        predictions_data_root=mhnet_predictions_data_root,
    )
    for floor_id, inferred_pg in (floor_pose_graphs or {}).items():
        gt_pg = posegraph2d.get_gt_pose_graph(building_id, floor_id, raw_dataset_dir)
        est_pg = PoseGraph2d.from_aligned_est_poses_and_inferred_layouts(gt_pg, inferred_pg)
        render_floorplans_side_by_side(
            est_pg, save_plot=True, plot_save_dir=save_dir, gt_floor_pg=gt_pg
        )
        click.echo(f"Rendered {building_id} {floor_id}")


if __name__ == "__main__":
    run_visualize_inferred_layout_w_gt_poses()
