"""CLI: capture-order adjacency histograms (parity: scripts/analyze_capture_order.py)."""

from __future__ import annotations

import glob
from collections import defaultdict
from pathlib import Path

import click
import numpy as np


@click.command(help="Histogram temporal (capture-order) distance per hypothesis label type.")
@click.option("--hypotheses_save_root", type=click.Path(exists=True), required=True)
@click.option("--save_fpath", type=str, default="capture_order_histogram.png")
def run_analyze_capture_order(hypotheses_save_root: str, save_fpath: str) -> None:
    traj_distance_dict = defaultdict(list)
    building_ids = sorted(
        Path(p).stem for p in glob.glob(f"{hypotheses_save_root}/*") if Path(p).is_dir()
    )
    for building_id in building_ids:
        for floor_dir in glob.glob(f"{hypotheses_save_root}/{building_id}/*"):
            for label_type in ["gt_alignment_approx", "gt_alignment_exact", "incorrect_alignment"]:
                for json_fpath in glob.glob(f"{floor_dir}/{label_type}/*.json"):
                    i, j = (int(x) for x in Path(json_fpath).stem.split("_")[:2])
                    traj_distance_dict[label_type].append(abs(i - j))

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, max(len(traj_distance_dict), 1), figsize=(12, 4))
    if len(traj_distance_dict) == 1:
        axes = [axes]
    for ax, (label_type, dists) in zip(np.atleast_1d(axes), traj_distance_dict.items()):
        ax.hist(dists, bins=np.arange(0, 30))
        ax.set_title(label_type)
        ax.set_xlabel("|i - j| capture distance")
        click.echo(f"{label_type}: mean |i-j| = {np.mean(dists):.2f} over {len(dists)} pairs")
    plt.tight_layout()
    plt.savefig(save_fpath, dpi=200)


if __name__ == "__main__":
    run_analyze_capture_order()
