"""CLI: verifier inference over a split (parity: scripts/test.py).

Writes per-batch prediction JSONs (batch_{i}.json with y_hat / y_true /
y_hat_probs / fp0 / fp1) — the Stage C -> Stage D interface.
"""

from __future__ import annotations

import logging

import click

from salve_tpu.training.config import TrainingConfig, load_training_config
from salve_tpu.training.loop import evaluate


@click.command(help="Run verifier inference over a ZInD split and serialize predictions.")
@click.option(
    "--config_fpath",
    type=click.Path(exists=True),
    default=None,
    help="Path to a TrainingConfig YAML (reference hydra format).",
)
@click.option("--ckpt_fpath", type=click.Path(exists=True), required=True)
@click.option("--data_root", type=str, default=None, help="Rendered BEV texture-map root.")
@click.option(
    "--split", type=click.Choice(["train", "val", "test"]), default="test"
)
@click.option(
    "--serialization_save_dir",
    type=str,
    required=True,
    help="Directory for per-batch prediction JSONs.",
)
@click.option("--batch_size", type=int, default=None)
@click.option("--max_batches", type=int, default=None, help="Debug cap.")
def run_test(
    config_fpath, ckpt_fpath, data_root, split, serialization_save_dir, batch_size, max_batches
) -> None:
    logging.basicConfig(level=logging.INFO)
    cfg = load_training_config(config_fpath) if config_fpath else TrainingConfig()
    if data_root is not None:
        cfg.data_root = data_root
    if batch_size is not None:
        cfg.batch_size = batch_size
    prec, rec, mAcc = evaluate(
        cfg, ckpt_fpath, split, serialization_save_dir, max_batches=max_batches
    )
    click.echo(f"precision={prec:.4f} recall={rec:.4f} mAcc={mAcc:.4f}")


if __name__ == "__main__":
    run_test()
