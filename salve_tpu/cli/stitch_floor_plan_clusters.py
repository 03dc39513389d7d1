"""CLI: stitch floorplans from cluster-localization JSONs, scored vs GT.

Parity: scripts/stitch_floor_plan.py (the reference's original stitch
driver — WIP there with a live pdb.set_trace() at :73; completed here via
salve_tpu.stitching.cluster_stitching). Same flags. For the
run_sfm-output-driven flow use salve_tpu.cli.stitch_floor_plan
(parity: scripts/stitch_floor_plan_new.py).
"""

from __future__ import annotations

import json
import logging

import click

from salve_tpu.stitching.cluster_stitching import stitch_clusters


@click.command(
    help="Run floorplan stitching using previously localized cluster poses."
)
@click.option("-o", "--output-dir", required=True, type=str,
              help="Path to directory where stitched outputs will be saved to.")
@click.option("--est-localization-fpath", required=True,
              type=click.Path(exists=True),
              help="JSON with estimated pano poses per cluster "
                   "(SALVe + global optimization output).")
@click.option("--hnet-pred-dir", required=True, type=click.Path(exists=True),
              help="Directory with per-pano HorizonNet room-shape and DWO "
                   "prediction JSONs.")
@click.option("--path-gt-floor-map", required=True, type=click.Path(exists=True),
              help="Path to the GT ZInD floor_map JSON.")
def run_stitch_floor_plan(
    output_dir: str,
    est_localization_fpath: str,
    hnet_pred_dir: str,
    path_gt_floor_map: str,
) -> None:
    logging.basicConfig(level=logging.INFO)
    scores = stitch_clusters(
        est_localization_fpath=est_localization_fpath,
        hnet_pred_dir=hnet_pred_dir,
        path_gt_floor_map=path_gt_floor_map,
        output_dir=output_dir,
    )
    print(json.dumps(scores, indent=2))


if __name__ == "__main__":
    run_stitch_floor_plan()
