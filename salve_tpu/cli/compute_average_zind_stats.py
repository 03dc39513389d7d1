"""CLI: corpus statistics over ZInD (parity: scripts/compute_average_zind_stats.py)."""

from __future__ import annotations

import glob
from pathlib import Path

import click
import numpy as np

from salve_tpu.common import posegraph2d


@click.command(help="Compute average #panos/#floors/scale statistics over ZInD.")
@click.option("--raw_dataset_dir", type=click.Path(exists=True), required=True)
def run_compute_average_zind_stats(raw_dataset_dir: str) -> None:
    building_ids = sorted(
        Path(p).stem for p in glob.glob(f"{raw_dataset_dir}/*") if Path(p).is_dir()
    )
    num_floors, num_panos, scales = [], [], []
    for building_id in building_ids:
        try:
            floor_ids = posegraph2d.compute_available_floors_for_building(
                building_id, raw_dataset_dir
            )
        except (FileNotFoundError, KeyError):
            continue
        num_floors.append(len(floor_ids))
        for floor_id in floor_ids:
            pg = posegraph2d.get_gt_pose_graph(building_id, floor_id, raw_dataset_dir)
            num_panos.append(len(pg.nodes))
            scales.append(pg.scale_meters_per_coordinate)

    click.echo(f"Buildings: {len(num_floors)}")
    click.echo(f"Avg floors/building: {np.mean(num_floors):.2f}")
    click.echo(f"Avg panos/floor: {np.mean(num_panos):.2f}")
    click.echo(f"Avg scale (m/coord): {np.mean(scales):.4f}")


if __name__ == "__main__":
    run_compute_average_zind_stats()
