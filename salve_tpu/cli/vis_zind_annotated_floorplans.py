"""CLI: render GT annotated floorplans (parity: scripts/vis_zind_annotated_floorplans.py)."""

from __future__ import annotations

import glob
import os
from pathlib import Path

import click

from salve_tpu.common import posegraph2d
from salve_tpu.common.floor_reconstruction_report import render_floorplans_side_by_side


@click.command(help="Render ZInD GT annotated floorplans to images.")
@click.option("--raw_dataset_dir", type=click.Path(exists=True), required=True)
@click.option("--save_dir", type=str, default="zind_gt_floorplans")
@click.option("--building_id", type=str, default=None)
def run_vis_zind_annotated_floorplans(raw_dataset_dir, save_dir, building_id) -> None:
    os.makedirs(save_dir, exist_ok=True)
    if building_id:
        building_ids = [building_id]
    else:
        building_ids = sorted(
            Path(p).stem for p in glob.glob(f"{raw_dataset_dir}/*") if Path(p).is_dir()
        )
    for bid in building_ids:
        try:
            floor_ids = posegraph2d.compute_available_floors_for_building(bid, raw_dataset_dir)
        except (FileNotFoundError, KeyError):
            continue
        for floor_id in floor_ids:
            gt_pg = posegraph2d.get_gt_pose_graph(bid, floor_id, raw_dataset_dir)
            render_floorplans_side_by_side(
                gt_pg, save_plot=True, plot_save_dir=save_dir, gt_floor_pg=gt_pg
            )
            click.echo(f"Rendered {bid} {floor_id}")


if __name__ == "__main__":
    run_vis_zind_annotated_floorplans()
