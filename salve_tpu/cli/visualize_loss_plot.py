"""CLI: plot train/val loss and accuracy curves (parity: scripts/visualize_loss_plot.py)."""

from __future__ import annotations

from pathlib import Path

import click

from salve_tpu.utils.io import read_json_file


def plot_metrics(json_fpath: str, save_fpath: str = None, show: bool = False) -> None:
    """Train/val loss + mAcc vs epoch from a results JSON."""
    import matplotlib

    if not show:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    json_data = read_json_file(json_fpath)
    fig = plt.figure(dpi=200, facecolor="white", figsize=(10, 4))
    color_dict = {"train": "r", "val": "g"}

    for i, metric_name in enumerate(["avg_loss", "mAcc"]):
        fig.add_subplot(1, 2, i + 1)
        for split in ["train", "val"]:
            key = f"{split}_{metric_name}"
            if key not in json_data:
                continue
            vals = json_data[key]
            plt.plot(range(len(vals)), vals, color_dict[split], label=split)
        plt.ylabel(metric_name)
        plt.xlabel("epoch")
        plt.legend(loc="lower right")

    if save_fpath is None:
        save_fpath = str(Path(json_fpath).with_suffix(".png"))
    plt.tight_layout()
    plt.savefig(save_fpath, dpi=200)
    if show:
        plt.show()
    plt.close("all")


@click.command(help="Visualize loss plot, given training logs.")
@click.option("--train_results_fpath", type=click.Path(exists=True), required=True,
              help="Path to results JSON written by the training loop.")
@click.option("--save_fpath", type=str, default=None)
def run_visualize_loss_plot(train_results_fpath: str, save_fpath) -> None:
    plot_metrics(train_results_fpath, save_fpath)


if __name__ == "__main__":
    run_visualize_loss_plot()
