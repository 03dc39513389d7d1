"""CLI: train the pano depth network on ZInD layout-raycast supervision.

No reference analog (the reference downloads a pretrained HoHoNet ckpt via
scripts/download_monodepth_model.sh); this provides the from-scratch path
that makes the framework self-contained.
"""

from __future__ import annotations

import logging

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
def run_train_depth(
    raw_dataset_dir, model_save_fpath, num_layers, batch_size, num_epochs,
    learning_rate, max_steps,
) -> None:
    logging.basicConfig(level=logging.INFO)
    state = depth_train.create_depth_train_state(
        jax.random.PRNGKey(0), num_layers=num_layers, learning_rate=learning_rate
    )
    step = depth_train.make_depth_train_step()

    n_steps = 0
    for epoch in range(num_epochs):
        for rgb, depth_gt, valid in depth_train.iter_layout_depth_batches(
            raw_dataset_dir, sorted(DATASET_SPLITS["train"]), batch_size, seed=epoch
        ):
            state, loss = step(state, rgb, depth_gt, valid)
            n_steps += 1
            if n_steps % 20 == 0:
                logger.info("epoch %d step %d loss %.4f", epoch, n_steps, float(loss))
            if max_steps is not None and n_steps >= max_steps:
                break
        with open(model_save_fpath, "wb") as f:
            f.write(
                flax.serialization.to_bytes(
                    {"params": state.params, "batch_stats": state.batch_stats}
                )
            )
        logger.info("Saved checkpoint after epoch %d to %s", epoch, model_save_fpath)
        if max_steps is not None and n_steps >= max_steps:
            break


if __name__ == "__main__":
    run_train_depth()
