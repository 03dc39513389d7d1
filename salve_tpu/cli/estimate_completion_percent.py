"""CLI: query texture-map rendering progress (parity: scripts/estimate_completion_percent.py)."""

from __future__ import annotations

import glob
from pathlib import Path

import click

EPS = 1e-10


def query_completion_progress(hypotheses_save_root: str, bev_save_root: str) -> None:
    """Per-building rendering completion percent (4 files per hypothesis)."""
    building_ids = sorted(
        Path(d).name for d in glob.glob(f"{bev_save_root}/gt_alignment_approx/*")
    )
    for building_id in building_ids:
        for label, key in [("Pos.", "gt_alignment_approx"), ("Neg.", "incorrect_alignment")]:
            hyp_glob = f"{hypotheses_save_root}/{building_id}/*/{key}/*"
            render_glob = f"{bev_save_root}/{key}/{building_id}/*"
            num_rendered = len(glob.glob(render_glob)) / 4
            expected = len(glob.glob(hyp_glob))
            pct = num_rendered / (expected + EPS) * 100
            click.echo(f"Building {building_id} {label} {pct:.2f}%", nl=(label == "Neg."))


@click.command(help="Query completion progress of texture-map rendering during execution.")
@click.option("--hypotheses_save_root", type=click.Path(exists=True), required=True)
@click.option("--bev_save_root", type=click.Path(exists=True), required=True)
def run_estimate_completion_percent(hypotheses_save_root, bev_save_root) -> None:
    query_completion_progress(hypotheses_save_root, bev_save_root)


if __name__ == "__main__":
    run_estimate_completion_percent()
