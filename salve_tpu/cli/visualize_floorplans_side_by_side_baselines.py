"""CLI: side-by-side floorplans for baseline SfM results
(parity: scripts/visualize_floorplans_side_by_side_baselines.py)."""

from __future__ import annotations

import glob
from pathlib import Path

import click

from salve_tpu.baselines.sfm_eval import measure_algorithm_localization_accuracy


@click.command(help="Render side-by-side floorplans for OpenSfM/OpenMVG results.")
@click.option("--raw_dataset_dir", type=click.Path(exists=True), required=True)
@click.option("--results_dir", type=click.Path(exists=True), required=True)
@click.option("--algorithm_name", type=click.Choice(["opensfm", "openmvg"]), required=True)
@click.option("--save_dir", type=str, required=True)
def run_visualize_floorplans_side_by_side_baselines(
    raw_dataset_dir, results_dir, algorithm_name, save_dir
) -> None:
    # The report generation renders side-by-side floorplans as a side effect.
    for floor_dir in sorted(glob.glob(f"{results_dir}/ZinD_*__{algorithm_name}")):
        stem = Path(floor_dir).name
        parts = stem.split("__")[0].split("_")
        building_id, floor_id = parts[1], "_".join(parts[2:])
        recon_fpath = (
            f"{floor_dir}/reconstruction.json"
            if algorithm_name == "opensfm"
            else f"{floor_dir}/reconstruction/sfm_data.json"
        )
        measure_algorithm_localization_accuracy(
            building_id, floor_id, raw_dataset_dir, algorithm_name, save_dir, recon_fpath
        )
        click.echo(f"Rendered {building_id} {floor_id}")


if __name__ == "__main__":
    run_visualize_floorplans_side_by_side_baselines()
