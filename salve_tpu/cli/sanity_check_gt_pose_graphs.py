"""CLI: validate all GT pose graphs load cleanly (parity: scripts/sanity_check_gt_pose_graphs.py)."""

from __future__ import annotations

import glob
from pathlib import Path

import click

from salve_tpu.common import posegraph2d


@click.command(help="Sanity-check that every building's GT pose graphs parse.")
@click.option("--raw_dataset_dir", type=click.Path(exists=True), required=True)
def run_sanity_check_dataset_pose_graphs(raw_dataset_dir: str) -> None:
    building_ids = sorted(
        Path(p).stem for p in glob.glob(f"{raw_dataset_dir}/*") if Path(p).is_dir()
    )
    num_ok, num_failed = 0, 0
    for building_id in building_ids:
        try:
            floor_ids = posegraph2d.compute_available_floors_for_building(
                building_id, raw_dataset_dir
            )
            for floor_id in floor_ids:
                pg = posegraph2d.get_gt_pose_graph(building_id, floor_id, raw_dataset_dir)
                assert len(pg.nodes) > 0
            num_ok += 1
        except Exception as e:  # noqa: BLE001 - report-everything sanity sweep
            click.echo(f"FAILED {building_id}: {e}")
            num_failed += 1
    click.echo(f"{num_ok} buildings OK, {num_failed} failed.")


if __name__ == "__main__":
    run_sanity_check_dataset_pose_graphs()
