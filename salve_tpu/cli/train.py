"""CLI: train the early-fusion verifier (parity: scripts/train.py).

The reference composes a hydra YAML into a TrainingConfig; here the same
YAML format is accepted directly (--config_fpath), with CLI overrides for
the paths.
"""

from __future__ import annotations

import logging

import click

from salve_tpu.training.config import TrainingConfig, load_training_config
from salve_tpu.training.loop import train


@click.command(help="Train the SALVe early-fusion verifier on rendered BEV pairs.")
@click.option(
    "--config_fpath",
    type=click.Path(exists=True),
    default=None,
    help="Path to a TrainingConfig YAML (reference hydra format).",
)
@click.option("--data_root", type=str, default=None, help="Rendered BEV texture-map root.")
@click.option("--layout_data_root", type=str, default=None, help="Rendered layout root.")
@click.option("--model_save_dirpath", type=str, default=None, help="Checkpoint output dir.")
@click.option("--num_epochs", type=int, default=None)
@click.option("--batch_size", type=int, default=None)
@click.option("--num_layers", type=int, default=None, help="ResNet depth (18/34/50/152).")
@click.option("--max_batches_per_epoch", type=int, default=None, help="Debug cap.")
@click.option("--resume_from", type=click.Path(exists=True), default=None,
              help="Checkpoint (.flax/orbax/.pth) to resume training from.")
def run_train(
    config_fpath,
    data_root,
    layout_data_root,
    model_save_dirpath,
    num_epochs,
    batch_size,
    num_layers,
    max_batches_per_epoch,
    resume_from,
) -> None:
    logging.basicConfig(level=logging.INFO)
    cfg = load_training_config(config_fpath) if config_fpath else TrainingConfig()
    for name, val in [
        ("data_root", data_root),
        ("layout_data_root", layout_data_root),
        ("model_save_dirpath", model_save_dirpath),
        ("num_epochs", num_epochs),
        ("batch_size", batch_size),
        ("num_layers", num_layers),
    ]:
        if val is not None:
            setattr(cfg, name, val)
    train(cfg, max_batches_per_epoch=max_batches_per_epoch, resume_from=resume_from)


if __name__ == "__main__":
    run_train()
