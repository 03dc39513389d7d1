"""CLI: run OpenSfM per building floor (parity: scripts/execute_opensfm.py).

OpenSfM is an external binary in the reference too; this driver prepares
per-floor image directories, shells out, and collects reconstruction.json
outputs for evaluation with evaluate_sfm_baseline.
"""

from __future__ import annotations

import glob
import os
import shutil
from pathlib import Path

import click

from salve_tpu.dataset.zind_partition import DATASET_SPLITS
from salve_tpu.utils.subprocess_utils import run_command


@click.command(help="Run OpenSfM on ZInD buildings (requires external OpenSfM install).")
@click.option("--raw_dataset_dir", type=click.Path(exists=True), required=True)
@click.option("--opensfm_repo_root", type=click.Path(exists=True), required=True,
              help="Path to cloned OpenSfM repo (bin/opensfm_run_all).")
@click.option("--overrides_fpath", type=click.Path(exists=True), required=False, default=None,
              help="Path to a config.yaml with spherical-camera overrides.")
@click.option("--output_dir", type=str, required=True)
@click.option("--split", type=click.Choice(["train", "val", "test"]), default="test")
@click.option("--building_id", type=str, default=None)
def run_execute_opensfm(
    raw_dataset_dir, opensfm_repo_root, overrides_fpath, output_dir, split, building_id
) -> None:
    building_ids = [building_id] if building_id else sorted(DATASET_SPLITS[split])
    for bid in building_ids:
        pano_fpaths = sorted(glob.glob(f"{raw_dataset_dir}/{bid}/panos/*.jpg"))
        floor_ids = sorted({Path(p).stem.split("_partial")[0] for p in pano_fpaths})
        for floor_id in floor_ids:
            floor_dir = f"{output_dir}/ZinD_{bid}_{floor_id}__opensfm"
            img_dir = f"{floor_dir}/images"
            os.makedirs(img_dir, exist_ok=True)
            for p in glob.glob(f"{raw_dataset_dir}/{bid}/panos/{floor_id}_*.jpg"):
                shutil.copy(p, img_dir)
            if overrides_fpath:
                shutil.copy(overrides_fpath, f"{floor_dir}/config.yaml")
            cmd = f"{opensfm_repo_root}/bin/opensfm_run_all {floor_dir}"
            click.echo(f"Running: {cmd}")
            run_command(cmd)


if __name__ == "__main__":
    run_execute_opensfm()
