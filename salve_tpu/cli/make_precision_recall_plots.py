"""CLI: precision-recall curves for verifier models (parity: scripts/make_precision_recall_plots.py)."""

from __future__ import annotations

import glob
from typing import Dict

import click
import numpy as np

from salve_tpu.utils.io import read_json_file


def _collect_scores(serialized_preds_json_dir: str):
    """(y_true, positive-class score) for every serialized prediction."""
    y_true, y_score = [], []
    for fpath in glob.glob(f"{serialized_preds_json_dir}/batch*.json"):
        data = read_json_file(fpath)
        for yt, yh, prob in zip(data["y_true"], data["y_hat"], data["y_hat_probs"]):
            y_true.append(yt)
            # y_hat_probs is the probability of the predicted class; convert
            # to the positive-class probability.
            y_score.append(prob if yh == 1 else 1.0 - prob)
    return np.array(y_true), np.array(y_score)


def compare_precision_recall_across_models(
    model_dict: Dict[str, str], save_fpath: str = "precision_recall.pdf"
) -> None:
    """One PR curve per trained model on a shared plot."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from salve_tpu.utils.pr_utils import plot_precision_recall_curve_sklearn

    plt.style.use("ggplot")
    for model_name, preds_dir in model_dict.items():
        y_true, y_score = _collect_scores(preds_dir)
        prec, rec, _ = plot_precision_recall_curve_sklearn(y_true, y_score)
        plt.plot(rec, prec, label=model_name)

    plt.legend(fontsize="x-large")
    plt.xlabel("Recall")
    plt.ylabel("Precision")
    plt.tight_layout()
    plt.savefig(save_fpath, dpi=500)
    plt.close("all")


@click.command(help="Make precision-recall curves for verifier predictions.")
@click.option("--serialized_preds_json_dir", type=click.Path(exists=True), required=True, multiple=True)
@click.option("--model_name", type=str, required=True, multiple=True)
@click.option("--save_fpath", type=str, default="precision_recall.pdf")
def run_make_precision_recall_plots(serialized_preds_json_dir, model_name, save_fpath) -> None:
    if len(serialized_preds_json_dir) != len(model_name):
        raise click.UsageError("Provide one --model_name per --serialized_preds_json_dir.")
    compare_precision_recall_across_models(
        dict(zip(model_name, serialized_preds_json_dir)), save_fpath
    )


if __name__ == "__main__":
    run_make_precision_recall_plots()
