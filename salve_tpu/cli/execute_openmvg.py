"""CLI: run OpenMVG per building floor (parity: scripts/execute_openmvg.py)."""

from __future__ import annotations

import glob
import os
import shutil
from pathlib import Path

import click

from salve_tpu.baselines.openmvg import find_seed_pair
from salve_tpu.dataset.zind_partition import DATASET_SPLITS
from salve_tpu.utils.subprocess_utils import run_command


@click.command(help="Run OpenMVG spherical SfM on ZInD buildings (requires external OpenMVG install).")
@click.option("--raw_dataset_dir", type=click.Path(exists=True), required=True)
@click.option("--openmvg_sfm_bin", type=click.Path(exists=True), required=True,
              help="Path to OpenMVG build bin directory.")
@click.option("--output_dir", type=str, required=True)
@click.option("--split", type=click.Choice(["train", "val", "test"]), default="test")
@click.option("--building_id", type=str, default=None)
def run_execute_openmvg(
    raw_dataset_dir, openmvg_sfm_bin, output_dir, split, building_id
) -> None:
    building_ids = [building_id] if building_id else sorted(DATASET_SPLITS[split])
    for bid in building_ids:
        pano_fpaths = sorted(glob.glob(f"{raw_dataset_dir}/{bid}/panos/*.jpg"))
        floor_ids = sorted({Path(p).stem.split("_partial")[0] for p in pano_fpaths})
        for floor_id in floor_ids:
            floor_dir = f"{output_dir}/ZinD_{bid}_{floor_id}__openmvg"
            img_dir = f"{floor_dir}/images"
            matches_dir = f"{floor_dir}/matches"
            recon_dir = f"{floor_dir}/reconstruction"
            for d in (img_dir, matches_dir, recon_dir):
                os.makedirs(d, exist_ok=True)
            for p in glob.glob(f"{raw_dataset_dir}/{bid}/panos/{floor_id}_*.jpg"):
                shutil.copy(p, img_dir)
            try:
                seed1, seed2 = find_seed_pair(img_dir)
            except (ValueError, IndexError):
                click.echo(f"No seed pair for {bid} {floor_id}, skipping.")
                continue
            cmds = [
                f"{openmvg_sfm_bin}/openMVG_main_SfMInit_ImageListing -i {img_dir}"
                f" -o {matches_dir} -c 7 -f 1",  # camera model 7 = spherical
                f"{openmvg_sfm_bin}/openMVG_main_ComputeFeatures"
                f" -i {matches_dir}/sfm_data.json -o {matches_dir} -m SIFT",
                f"{openmvg_sfm_bin}/openMVG_main_ComputeMatches"
                f" -i {matches_dir}/sfm_data.json -o {matches_dir}/matches.putative.bin",
                f"{openmvg_sfm_bin}/openMVG_main_GeometricFilter"
                f" -i {matches_dir}/sfm_data.json -m {matches_dir}/matches.putative.bin"
                f" -g a -o {matches_dir}/matches.f.bin",
                f"{openmvg_sfm_bin}/openMVG_main_IncrementalSfM"
                f" -i {matches_dir}/sfm_data.json -m {matches_dir} -o {recon_dir}"
                f" -a {seed1} -b {seed2}",
                f"{openmvg_sfm_bin}/openMVG_main_ConvertSfM_DataFormat"
                f" -i {recon_dir}/sfm_data.bin -o {recon_dir}/sfm_data.json",
            ]
            for cmd in cmds:
                click.echo(f"Running: {cmd}")
                run_command(cmd)


if __name__ == "__main__":
    run_execute_openmvg()
