"""CLI: precompute depth maps for all panos (parity: scripts/batch_hohonet_inference.py).

The reference forked one GPU process per building (~4.3 GB each) running
HoHoNet; here panos stream through the registered JAX depth model on the
chip, writing the same u16 millimeter PNG cache. Without a registered
model, already-cached panos are verified and missing ones reported.
"""

from __future__ import annotations

import glob
import logging
from pathlib import Path
from typing import Optional

import click

from salve_tpu.dataset.zind_partition import DATASET_SPLITS
from salve_tpu.depth.cache import infer_depth_if_nonexistent

logger = logging.getLogger(__name__)


@click.command(help="Precompute (or verify) monocular depth maps for ZInD panos.")
@click.option("--raw_dataset_dir", type=click.Path(exists=True), required=True)
@click.option("--depth_save_root", type=str, required=True)
@click.option("--split", type=click.Choice(["train", "val", "test"]), default=None)
@click.option("--building_id", type=str, default=None, required=False)
@click.option("--num_processes", type=int, default=1, help="Accepted for flag parity.")
@click.option("--model_ckpt", type=click.Path(exists=True), default=None,
              help="Trained PanoDepthNet msgpack to produce missing depth maps.")
@click.option("--model_num_layers", type=int, default=50)
@click.option("--hohonet_input_hw", type=str, default="512,1024",
              help="Input resolution a .pth HoHoNet checkpoint was built "
                   "for (the EHC compression bakes the height into weight "
                   "shapes); ep60 is the production 512,1024.")
def run_batch_hohonet_inference(
    raw_dataset_dir: str,
    depth_save_root: str,
    split: Optional[str],
    building_id: Optional[str],
    num_processes: int,
    model_ckpt: Optional[str],
    model_num_layers: int,
    hohonet_input_hw: str,
) -> None:
    logging.basicConfig(level=logging.INFO)
    if model_ckpt:
        from salve_tpu.depth.cache import register_depth_model

        if model_ckpt.endswith(".pth"):
            # A real HoHoNet torch checkpoint (download_monodepth_model.sh).
            from salve_tpu.models.hohonet import load_hohonet_depth_provider

            hw = tuple(int(v) for v in hohonet_input_hw.split(","))
            register_depth_model(load_hohonet_depth_provider(model_ckpt, hw))
        else:
            from salve_tpu.models.depth_net import load_depth_provider

            register_depth_model(load_depth_provider(model_ckpt, model_num_layers))
    building_ids = [building_id] if building_id else sorted(DATASET_SPLITS[split])

    num_ok, num_missing = 0, 0
    for bid in building_ids:
        img_fpaths = sorted(glob.glob(f"{raw_dataset_dir}/{bid}/panos/*.jpg"))
        for img_fpath in img_fpaths:
            try:
                infer_depth_if_nonexistent(depth_save_root, bid, img_fpath)
                num_ok += 1
            except FileNotFoundError:
                logger.warning(
                    "No depth model registered and no cache for %s", Path(img_fpath).name
                )
                num_missing += 1
    click.echo(f"Depth maps ready: {num_ok}, missing: {num_missing}")


if __name__ == "__main__":
    run_batch_hohonet_inference()
