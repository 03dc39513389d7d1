"""CLI: render verifier verdicts as multigraphs over GT poses
(parity: scripts/visualize_edge_classifications.py)."""

from __future__ import annotations

import logging

import click

from salve_tpu.common import edge_classification, posegraph2d
from salve_tpu.utils.graph_rendering_utils import draw_multigraph


@click.command(help="Visualize verifier edge classifications as multigraphs.")
@click.option("--serialized_preds_json_dir", type=click.Path(exists=True), required=True)
@click.option("--hypotheses_save_root", type=click.Path(exists=True), required=True)
@click.option("--raw_dataset_dir", type=click.Path(exists=True), required=True)
@click.option("--confidence_threshold", type=float, default=0.93)
@click.option("--save_dir", type=str, default="multigraph_visualizations")
def run_visualize_edge_classifications(
    serialized_preds_json_dir, hypotheses_save_root, raw_dataset_dir,
    confidence_threshold, save_dir,
) -> None:
    logging.basicConfig(level=logging.INFO)
    pairs = edge_classification.get_available_floor_ids_building_ids_from_serialized_preds(
        serialized_preds_json_dir
    )
    for building_id, floor_id in sorted(pairs):
        ec_dict = edge_classification.get_edge_classifications_from_serialized_preds(
            building_id, floor_id, serialized_preds_json_dir, hypotheses_save_root
        )
        measurements = ec_dict[(building_id, floor_id)]
        if not measurements:
            continue
        gt_pg = posegraph2d.get_gt_pose_graph(building_id, floor_id, raw_dataset_dir)
        draw_multigraph(
            measurements, gt_pg,
            confidence_threshold=confidence_threshold, save_dir=save_dir,
        )
        click.echo(f"Rendered {building_id} {floor_id}")


if __name__ == "__main__":
    run_visualize_edge_classifications()
