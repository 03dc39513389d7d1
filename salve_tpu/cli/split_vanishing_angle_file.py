"""CLI: split a monolithic vanishing-angle CSV into per-building JSONs
(parity: scripts/split_vanishing_angle_file.py)."""

from __future__ import annotations

import csv
import json
import os

import click


def split_vanishing_angles(csv_path: str, out_dir: str) -> int:
    os.makedirs(out_dir, exist_ok=True)
    vanishing_angles = {}
    with open(csv_path, "r") as csv_file:
        for i_row, row in enumerate(csv.reader(csv_file, delimiter=",")):
            if i_row == 0:
                continue
            i_building, pano_id, degree = row
            building_id = "%04d" % int(i_building)
            pano_id = pano_id.split(".")[0]
            vanishing_angles.setdefault(building_id, {})[pano_id] = float(degree)

    for building_id, vps in vanishing_angles.items():
        with open(os.path.join(out_dir, f"{building_id}.json"), "w") as f:
            json.dump(vps, f)
    return len(vanishing_angles)


@click.command(help="Split a vanishing-angle CSV into per-building JSON files.")
@click.option("--csv", "csv_path", type=click.Path(exists=True), required=True)
@click.option("--out_dir", type=str, required=True)
def run_split_vanishing_angle_file(csv_path: str, out_dir: str) -> None:
    n = split_vanishing_angles(csv_path, out_dir)
    click.echo(f"Vanishing angle extraction complete ({n} buildings).")


if __name__ == "__main__":
    run_split_vanishing_angle_file()
