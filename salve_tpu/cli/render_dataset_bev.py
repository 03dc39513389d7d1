"""CLI: render aligned BEV texture maps / layouts (parity: scripts/render_dataset_bev.py).

The reference's --num_processes / --multiprocess_building_panos knobs are
accepted for flag compatibility but map to host IO threads: the pixel work
runs as batched device programs, not forked workers.
"""

from __future__ import annotations

import logging
from typing import Optional

import click

from salve_tpu.rendering.dataset_renderer import render_pairs


@click.command(help="Render BEV texture maps or rasterized layouts for alignment hypotheses.")
@click.option(
    "--raw_dataset_dir",
    type=click.Path(exists=True),
    required=True,
    help="Path to where ZInD dataset is stored on disk.",
)
@click.option("--num_processes", type=int, default=15, help="Host IO worker threads.")
@click.option(
    "--depth_save_root",
    type=str,
    required=True,
    help="Path to where depth maps are stored (or will be saved to, if not computed yet).",
)
@click.option(
    "--hypotheses_save_root",
    type=click.Path(exists=True),
    required=True,
    help="Path to where alignment hypotheses are saved on disk.",
)
@click.option(
    "--bev_save_root",
    type=str,
    required=True,
    help="Directory where BEV texture maps should be written.",
)
@click.option("--split", type=click.Choice(["train", "val", "test"]), default=None)
@click.option(
    "--layout_save_root",
    type=str,
    default=None,
    help="If provided, rasterized layouts are rendered (instead of RGB texture maps).",
)
@click.option("--building_id", type=str, default=None, required=False)
@click.option("--multiprocess_building_panos", type=bool, default=True, help="Accepted for flag parity; batching is automatic.")
@click.option("--mhnet_predictions_data_root", type=str, default=None, required=False)
@click.option("--batch_size", type=int, default=8, help="Hypothesis pairs per device batch.")
@click.option(
    "--use_warp_renders/--no_use_warp_renders",
    default=None,
    help="Render img1 as a Sim(2) warp of a per-pano identity bank instead "
    "of a full per-hypothesis splat (default: on for TPU backends; "
    "SALVE_TPU_DISABLE_WARP=1 forces direct).",
)
def run_render_dataset_bev(
    raw_dataset_dir: str,
    num_processes: int,
    depth_save_root: str,
    hypotheses_save_root: str,
    bev_save_root: str,
    split: Optional[str],
    layout_save_root: Optional[str],
    building_id: Optional[str],
    multiprocess_building_panos: bool,
    mhnet_predictions_data_root: Optional[str],
    batch_size: int,
    use_warp_renders: Optional[bool],
) -> None:
    logging.basicConfig(level=logging.INFO)
    render_modalities = ["rgb_texture"] if layout_save_root is None else ["layout"]
    n = render_pairs(
        depth_save_root=depth_save_root,
        bev_save_root=bev_save_root,
        raw_dataset_dir=raw_dataset_dir,
        hypotheses_save_root=hypotheses_save_root,
        layout_save_root=layout_save_root,
        render_modalities=render_modalities,
        split=split,
        building_id=building_id,
        mhnet_predictions_data_root=mhnet_predictions_data_root,
        batch_size=batch_size,
        use_warp=use_warp_renders,
    )
    click.echo(f"Rendered {n} pair images.")


if __name__ == "__main__":
    run_render_dataset_bev()
