"""CLI: evaluate OpenSfM/OpenMVG reconstructions vs GT (parity: scripts/evaluate_sfm_baseline.py)."""

from __future__ import annotations

import glob
import logging
from pathlib import Path

import click

from salve_tpu.baselines.sfm_eval import (
    analyze_algorithm_results,
    measure_algorithm_localization_accuracy,
)
from salve_tpu.common.floor_reconstruction_report import summarize_reports


@click.command(help="Evaluate OpenSfM/OpenMVG reconstructions against ZInD GT poses.")
@click.option("--raw_dataset_dir", type=click.Path(exists=True), required=True)
@click.option("--results_dir", type=click.Path(exists=True), required=True,
              help="Directory with per-floor reconstruction outputs "
                   "(ZinD_{building}_{floor}__{algo} subdirectories).")
@click.option("--algorithm_name", type=click.Choice(["opensfm", "openmvg"]), required=True)
@click.option("--save_dir", type=str, required=True)
@click.option("--visualize_3d", is_flag=True, default=False,
              help="Save before/after-alignment 3D pose-graph renderings "
                   "(visualization/pose_viz.py; reference used Open3D "
                   "interactively, salve/baselines/sfm_eval.py:177,184).")
def run_evaluate_sfm_baseline(
    raw_dataset_dir, results_dir, algorithm_name, save_dir, visualize_3d
) -> None:
    logging.basicConfig(level=logging.INFO)
    reports = []
    for floor_dir in sorted(glob.glob(f"{results_dir}/ZinD_*__{algorithm_name}")):
        stem = Path(floor_dir).name  # ZinD_{bid}_{floor_id}__{algo}
        parts = stem.split("__")[0].split("_")
        building_id, floor_id = parts[1], "_".join(parts[2:])
        if algorithm_name == "opensfm":
            recon_fpath = f"{floor_dir}/reconstruction.json"
        else:
            recon_fpath = f"{floor_dir}/reconstruction/sfm_data.json"
        report = measure_algorithm_localization_accuracy(
            building_id=building_id,
            floor_id=floor_id,
            raw_dataset_dir=raw_dataset_dir,
            algorithm_name=algorithm_name,
            save_dir=save_dir,
            reconstruction_json_fpath=recon_fpath,
            visualize_3d=visualize_3d,
        )
        reports.append(report)

    summary = summarize_reports(reports)
    for k, v in summary.items():
        click.echo(f"{k} = {v:.3f}")
    corpus = analyze_algorithm_results(raw_dataset_dir, f"{save_dir}/result_summaries")
    click.echo(str(corpus))


if __name__ == "__main__":
    run_evaluate_sfm_baseline()
