"""CLI: train the pano depth network on ZInD layout-raycast supervision.

No reference analog (the reference downloads a pretrained HoHoNet ckpt via
scripts/download_monodepth_model.sh); this provides the from-scratch path
that makes the framework self-contained. With --synthetic_rgb the imagery is
ray-cast from the GT layouts too (rendering/synthetic.py), so the net can be
trained and *measured* even without the ZInD pano JPGs on disk.
"""

from __future__ import annotations

import json
import logging
import os

import click
import flax
import jax

from salve_tpu.dataset.zind_partition import DATASET_SPLITS
from salve_tpu.training import depth as depth_train

logger = logging.getLogger(__name__)


@click.command(help="Train the monocular pano depth network (HoHoNet role).")
@click.option("--raw_dataset_dir", type=click.Path(exists=True), required=True)
@click.option("--model_save_fpath", type=str, required=True)
@click.option("--num_layers", type=int, default=50)
@click.option("--batch_size", type=int, default=4)
@click.option("--num_epochs", type=int, default=10)
@click.option("--learning_rate", type=float, default=1e-4)
@click.option("--max_steps", type=int, default=None, help="Debug cap.")
@click.option(
    "--synthetic_rgb", is_flag=True, default=False,
    help="Ray-cast imagery from GT layouts instead of reading pano JPGs.",
)
@click.option(
    "--train_buildings", type=str, default=None,
    help="Comma-separated building IDs (default: official train split).",
)
@click.option(
    "--eval_buildings", type=str, default=None,
    help="Comma-separated held-out building IDs to report depth metrics on.",
)
@click.option("--pano_h", type=int, default=512)
@click.option("--pano_w", type=int, default=1024)
@click.option(
    "--depth_cache_root", type=click.Path(exists=True), default=None,
    help="u16-mm depth cache dir: use cached multi-room world depth as GT "
         "instead of the single-room layout raycast (pairs with materialized "
         "synthetic datasets; implies reading pano JPEGs from disk).",
)
def run_train_depth(
    raw_dataset_dir, model_save_fpath, num_layers, batch_size, num_epochs,
    learning_rate, max_steps, synthetic_rgb, train_buildings, eval_buildings,
    pano_h, pano_w, depth_cache_root,
) -> None:
    logging.basicConfig(level=logging.INFO)
    hw = (pano_h, pano_w)
    if train_buildings:
        building_ids = sorted(train_buildings.split(","))
    else:
        building_ids = sorted(DATASET_SPLITS["train"])

    state = depth_train.create_depth_train_state(
        jax.random.PRNGKey(0), num_layers=num_layers, learning_rate=learning_rate,
        input_hw=hw,
    )
    step = depth_train.make_depth_train_step()

    save_dir = os.path.dirname(os.path.abspath(model_save_fpath))
    os.makedirs(save_dir, exist_ok=True)

    n_steps = 0
    done = False
    for epoch in range(num_epochs):
        for rgb, depth_gt, valid in depth_train.iter_layout_depth_batches(
            raw_dataset_dir, building_ids, batch_size, seed=epoch,
            synthetic_rgb=synthetic_rgb, hw=hw,
            cache_variants=3 if synthetic_rgb else 0,
            depth_cache_root=depth_cache_root,
        ):
            state, loss = step(state, rgb, depth_gt, valid)
            n_steps += 1
            if n_steps % 20 == 0:
                logger.info("epoch %d step %d loss %.4f", epoch, n_steps, float(loss))
            if max_steps is not None and n_steps >= max_steps:
                done = True
                break
        with open(model_save_fpath, "wb") as f:
            f.write(
                flax.serialization.to_bytes(
                    {"params": state.params, "batch_stats": state.batch_stats}
                )
            )
        logger.info("Saved checkpoint after epoch %d to %s", epoch, model_save_fpath)
        if done:
            break

    if eval_buildings:
        from salve_tpu.models.depth_net import make_depth_provider

        provider = make_depth_provider(
            state.params, state.batch_stats, num_layers=num_layers
        )
        metrics = depth_train.evaluate_depth(
            provider, raw_dataset_dir, sorted(eval_buildings.split(",")),
            synthetic_rgb=synthetic_rgb, hw=hw,
            depth_cache_root=depth_cache_root,
        )
        metrics["train_steps"] = n_steps
        print(json.dumps({"depth_eval": metrics}))
        with open(model_save_fpath + ".eval.json", "w") as f:
            json.dump(metrics, f, indent=2)


if __name__ == "__main__":
    run_train_depth()
