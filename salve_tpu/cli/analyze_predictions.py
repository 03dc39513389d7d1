"""CLI: verifier error analysis over Stage-C prediction dumps.

Consumes the batch_{i}.json files scripts/test.py-style evaluation writes
(same wire format the reference's salve/common/edge_classification.py:143
parses back) and reports, per floor:

  - hypothesis-level precision/recall at each confidence threshold;
  - EDGE-level losses: GT-positive pano pairs whose best hypothesis falls
    below threshold (Stage D consumes the max-probability hypothesis per
    pano pair, so these are the edges the pose graph actually loses);
  - false-negative / false-positive breakdowns by W/D/O type and
    identity/rotated configuration.

This is the analysis that produced ACCURACY_r02.json's error_analysis
section (v8 -> v9 procedural corpus changes); there is no reference
counterpart script — the reference eyeballs serialized visualizations
(scripts/visualize_edge_classifications.py) instead.

Note: y_hat_probs in batch_{i}.json is the ARGMAX-class probability
(reference scripts/test.py softmax-max convention), so
P(positive) = p when y_hat == 1 else 1 - p.
"""

from __future__ import annotations

import glob
import json
import re
from collections import Counter
from pathlib import Path

import click

_FNAME_RE = re.compile(
    r"pair_(\d+)___(door|window|opening)_(\d+)_(\d+)_(identity|rotated)"
    r"_(ceiling|floor)_rgb_(floor_\d+)_partial_room_(\d+)_pano_(\d+)"
)


def load_hypothesis_records(preds_dir: str):
    """Flatten batch_{i}.json dumps into per-hypothesis dicts with
    P(positive), W/D/O metadata, and the (pano0, pano1) edge key."""
    recs = []
    for fpath in sorted(glob.glob(str(Path(preds_dir) / "batch_*.json"))):
        d = json.load(open(fpath))
        for yh, yt, p, fp0, fp1 in zip(
            d["y_hat"], d["y_true"], d["y_hat_probs"], d["fp0"], d["fp1"]
        ):
            m0, m1 = _FNAME_RE.search(fp0), _FNAME_RE.search(fp1)
            if m0 is None or m1 is None:
                continue
            recs.append(
                {
                    "y_true": int(yt),
                    "p_pos": float(p) if yh == 1 else 1.0 - float(p),
                    "wdo": m0.group(2),
                    "config": m0.group(5),
                    "floor": m0.group(7),
                    "rooms": (m0.group(8), m1.group(8)),
                    "edge": tuple(
                        sorted((int(m0.group(9)), int(m1.group(9))))
                    ),
                }
            )
    return recs


def analyze_floor(records, thresholds):
    """Hypothesis- and edge-level stats for one floor's records."""
    pos = [r for r in records if r["y_true"] == 1]
    neg = [r for r in records if r["y_true"] == 0]
    best_by_edge = {}
    for r in pos:
        cur = best_by_edge.get(r["edge"])
        if cur is None or r["p_pos"] > cur["p_pos"]:
            best_by_edge[r["edge"]] = r
    out = {
        "n_hypotheses": len(records),
        "n_gt_pos_hyps": len(pos),
        "n_gt_pos_edges": len(best_by_edge),
        "thresholds": {},
    }
    for th in thresholds:
        tp = sum(1 for r in pos if r["p_pos"] >= th)
        fp = sum(1 for r in neg if r["p_pos"] >= th)
        lost = sorted(
            k for k, r in best_by_edge.items() if r["p_pos"] < th
        )
        fn_kinds = Counter(
            (r["wdo"], r["config"]) for r in pos if r["p_pos"] < th
        )
        fp_kinds = Counter(
            (r["wdo"], r["config"]) for r in neg if r["p_pos"] >= th
        )
        out["thresholds"][th] = {
            "hyp_recall": tp / max(len(pos), 1),
            "hyp_precision": tp / max(tp + fp, 1),
            "edges_lost": [list(k) for k in lost],
            "lost_edge_details": [
                {
                    "edge": list(k),
                    "best_p": round(best_by_edge[k]["p_pos"], 3),
                    "wdo": best_by_edge[k]["wdo"],
                    "config": best_by_edge[k]["config"],
                    "rooms": list(best_by_edge[k]["rooms"]),
                }
                for k in lost
            ],
            "fn_hyps_by_kind": {f"{w}/{c}": n for (w, c), n in fn_kinds.items()},
            "fp_hyps_by_kind": {f"{w}/{c}": n for (w, c), n in fp_kinds.items()},
        }
    return out


@click.command()
@click.option(
    "--preds_dir",
    required=True,
    type=click.Path(exists=True),
    help="Directory holding batch_{i}.json prediction dumps.",
)
@click.option(
    "--thresholds",
    default="0.5,0.65,0.8,0.93",
    show_default=True,
    help="Comma-separated confidence thresholds to analyze.",
)
@click.option(
    "--output_json",
    default=None,
    type=click.Path(),
    help="Optional path to also write the full report as JSON.",
)
def main(preds_dir: str, thresholds: str, output_json: str) -> None:
    ths = [float(t) for t in thresholds.split(",") if t]
    recs = load_hypothesis_records(preds_dir)
    report = {}
    for floor in sorted({r["floor"] for r in recs}):
        report[floor] = analyze_floor(
            [r for r in recs if r["floor"] == floor], ths
        )
    for floor, fa in report.items():
        click.echo(
            f"\n{floor}: {fa['n_hypotheses']} hyps, "
            f"{fa['n_gt_pos_hyps']} GT-pos over {fa['n_gt_pos_edges']} edges"
        )
        for th, st in fa["thresholds"].items():
            click.echo(
                f"  conf {th}: hyp recall {st['hyp_recall']:.2f} "
                f"precision {st['hyp_precision']:.2f}; "
                f"edges lost {len(st['edges_lost'])}"
            )
            for d in st["lost_edge_details"]:
                click.echo(
                    f"    lost {tuple(d['edge'])}: best_p={d['best_p']} "
                    f"{d['wdo']}/{d['config']} rooms {d['rooms']}"
                )
            if st["fn_hyps_by_kind"]:
                click.echo(f"    FN by kind: {st['fn_hyps_by_kind']}")
            if st["fp_hyps_by_kind"]:
                click.echo(f"    FP by kind: {st['fp_hyps_by_kind']}")
    if output_json:
        with open(output_json, "w") as f:
            json.dump(report, f, indent=1)
        click.echo(f"\nwrote {output_json}")


if __name__ == "__main__":
    main()
