"""CLI: verifier accuracy vs layout-overlap analysis
(parity: scripts/measure_acc_vs_overlap.py)."""

from __future__ import annotations

import logging
from collections import defaultdict

import click
import numpy as np

from salve_tpu.common import edge_classification, posegraph2d
from salve_tpu.geometry.polygons import polygon_iou_and_overlap


@click.command(help="Bin verifier accuracy by GT room-layout overlap (IoU).")
@click.option("--serialized_preds_json_dir", type=click.Path(exists=True), required=True)
@click.option("--hypotheses_save_root", type=click.Path(exists=True), required=True)
@click.option("--raw_dataset_dir", type=click.Path(exists=True), required=True)
def run_measure_acc_vs_overlap(
    serialized_preds_json_dir, hypotheses_save_root, raw_dataset_dir
) -> None:
    logging.basicConfig(level=logging.INFO)
    bins = np.array([0.0, 0.1, 0.2, 0.3, 0.5, 1.0])
    correct = defaultdict(int)
    total = defaultdict(int)

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
        for m in measurements:
            if m.i1 not in gt_pg.nodes or m.i2 not in gt_pg.nodes:
                continue
            poly1 = gt_pg.nodes[m.i1].room_vertices_global_2d
            poly2 = gt_pg.nodes[m.i2].room_vertices_global_2d
            iou, _ = polygon_iou_and_overlap(poly1, poly2)
            b = int(np.digitize(iou, bins)) - 1
            total[b] += 1
            correct[b] += int(m.y_hat == m.y_true)

    for b in sorted(total):
        lo, hi = bins[b], bins[min(b + 1, len(bins) - 1)]
        acc = correct[b] / total[b]
        click.echo(f"overlap IoU [{lo:.1f},{hi:.1f}): acc {acc:.3f} over {total[b]} edges")


if __name__ == "__main__":
    run_measure_acc_vs_overlap()
