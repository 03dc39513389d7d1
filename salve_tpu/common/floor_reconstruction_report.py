"""Floor-level reconstruction quality report.

Parity: salve/common/floor_reconstruction_report.py — Sim(3)-align the
estimated pose graph to GT, measure per-pano pose errors, % localized, and
raster floorplan IoU (0.1 m/px over +/-25 m), then serialize the aligned
global poses. The room-occupancy rasterization uses the XLA polygon-fill
kernel (salve_tpu.ops.raster) instead of cv2.fillPoly.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from salve_tpu.common.posegraph2d import PoseGraph2d
from salve_tpu.utils.io import save_json_file
from salve_tpu.utils.iou_utils import binary_mask_iou

# IoU raster spec (floor_reconstruction_report.py:271-296).
BUILDING_XLIMS_M = 25
BUILDING_YLIMS_M = 25
IOU_EVAL_METERS_PER_PX = 0.1


@dataclass
class FloorReconstructionReport:
    """Summary statistics for one reconstructed floor."""

    avg_abs_rot_err: float
    avg_abs_trans_err: float
    percent_panos_localized: float
    floorplan_iou: Optional[float] = np.nan
    rotation_errors: Optional[np.ndarray] = None
    translation_errors: Optional[np.ndarray] = None
    # The paper's completeness metric (index.html:246 — 81% / 89% of panos
    # localized within the first 2 / 3 connected components on the test
    # split): fraction of the floor's panos inside the top-k components of
    # the high-confidence edge graph. Filled by cli/run_sfm.py.
    percent_in_top2_ccs: float = np.nan
    percent_in_top3_ccs: float = np.nan
    # Which floor this report scores — lets multi-building evaluations
    # (cli/end_to_end_eval.py --eval_procedural_buildings) label each entry.
    building_id: Optional[str] = None
    floor_id: Optional[str] = None

    def __repr__(self) -> str:
        return (
            f"Abs. Rot err (deg) {self.avg_abs_rot_err:.1f}, "
            f"Abs. trans err {self.avg_abs_trans_err:.2f}, "
            f"%Localized {self.percent_panos_localized:.2f},"
            f"Floorplan IoU {self.floorplan_iou:.2f}"
        )

    @classmethod
    def from_est_floor_pose_graph(
        cls,
        est_floor_pose_graph: PoseGraph2d,
        gt_floor_pose_graph: PoseGraph2d,
        plot_save_dir: Optional[str] = None,
        plot_save_fpath: Optional[str] = None,
        raw_dataset_dir: Optional[str] = None,
    ) -> "FloorReconstructionReport":
        """Align to GT, measure errors, rasterize IoU, serialize poses."""
        num_localized = len(est_floor_pose_graph.nodes)
        num_floor_panos = len(gt_floor_pose_graph.nodes)
        percent_panos_localized = num_localized / num_floor_panos * 100

        aligned_est, _ = est_floor_pose_graph.align_by_Sim3_to_ref_pose_graph(
            ref_pose_graph=gt_floor_pose_graph
        )
        (
            mean_abs_rot_err,
            mean_abs_trans_err,
            rot_errors,
            trans_errors,
        ) = aligned_est.measure_aligned_abs_pose_error(gt_floor_pg=gt_floor_pose_graph)

        # Convert translation error units to meters.
        scale = gt_floor_pose_graph.scale_meters_per_coordinate
        mean_abs_trans_err_m = scale * mean_abs_trans_err

        if plot_save_dir is not None:
            serialize_predicted_pose_graph(aligned_est, gt_floor_pose_graph, plot_save_dir)
            render_floorplans_side_by_side(
                est_floor_pose_graph=aligned_est,
                show_plot=False,
                save_plot=True,
                plot_save_dir=plot_save_dir,
                gt_floor_pg=gt_floor_pose_graph,
                plot_save_fpath=plot_save_fpath,
            )

        floorplan_iou = render_raster_occupancy(
            est_floor_pose_graph=aligned_est,
            gt_floor_pg=gt_floor_pose_graph,
            plot_save_dir=plot_save_dir,
            save_viz=plot_save_dir is not None,
        )

        return cls(
            avg_abs_rot_err=float(mean_abs_rot_err),
            avg_abs_trans_err=float(mean_abs_trans_err_m),
            percent_panos_localized=float(percent_panos_localized),
            floorplan_iou=float(floorplan_iou),
            rotation_errors=rot_errors,
            translation_errors=trans_errors,
            building_id=gt_floor_pose_graph.building_id,
            floor_id=gt_floor_pose_graph.floor_id,
        )


def serialize_predicted_pose_graph(
    aligned_est_floor_pose_graph: PoseGraph2d,
    gt_floor_pose_graph: PoseGraph2d,
    plot_save_dir: str,
) -> None:
    """Save Sim(2) global poses as (R,t,s) JSON (parity :191-217)."""
    building_id = gt_floor_pose_graph.building_id
    floor_id = gt_floor_pose_graph.floor_id
    global_poses_info = {}
    for i, pano_data in aligned_est_floor_pose_graph.nodes.items():
        S = pano_data.global_Sim2_local
        global_poses_info[i] = {
            "R": S.rotation.tolist(),
            "t": S.translation.tolist(),
            "s": S.scale,
        }
    save_dict = {
        "building_id": building_id,
        "floor_id": floor_id,
        "scale_meters_per_coordinate": gt_floor_pose_graph.scale_meters_per_coordinate,
        "wSi_dict": global_poses_info,
    }
    save_json_file(
        f"{plot_save_dir}_serialized/{building_id}__{floor_id}.json", save_dict
    )


def rasterize_room(
    floor_pose_graph: PoseGraph2d,
    scale_meters_per_coordinate: float,
    img_px: int,
    meters_per_px: float,
) -> np.ndarray:
    """Occupancy mask: union of all global room polygons, rasterized on device."""
    import jax.numpy as jnp

    from salve_tpu.ops.raster import polygon_mask

    occ = np.zeros((img_px + 1, img_px + 1), dtype=bool)
    half_m = (img_px / 2) * meters_per_px
    for _, pano_obj in floor_pose_graph.nodes.items():
        verts_m = pano_obj.room_vertices_global_2d * scale_meters_per_coordinate
        img_xy = (verts_m + half_m) / meters_per_px
        v = np.zeros((max(64, img_xy.shape[0]), 2), dtype=np.float32)
        v[: img_xy.shape[0]] = img_xy
        mask = np.asarray(
            polygon_mask(
                jnp.asarray(v), jnp.int32(img_xy.shape[0]), img_px + 1, img_px + 1
            )
        )
        occ |= mask
    return occ


def render_raster_occupancy(
    est_floor_pose_graph: PoseGraph2d,
    gt_floor_pg: PoseGraph2d,
    plot_save_dir: Optional[str] = None,
    save_viz: bool = False,
) -> float:
    """Raster floorplan IoU @ 0.1 m/px over +/-25 m (parity :271)."""
    scale = gt_floor_pg.scale_meters_per_coordinate
    img_px = int(2 * BUILDING_XLIMS_M / IOU_EVAL_METERS_PER_PX)

    est_mask = rasterize_room(est_floor_pose_graph, scale, img_px, IOU_EVAL_METERS_PER_PX)
    gt_mask = rasterize_room(gt_floor_pg, scale, img_px, IOU_EVAL_METERS_PER_PX)
    iou = binary_mask_iou(est_mask, gt_mask)

    if save_viz and plot_save_dir is not None:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.subplot(1, 2, 1)
        plt.imshow(np.flipud(est_mask))
        plt.subplot(1, 2, 2)
        plt.imshow(np.flipud(gt_mask))
        plt.suptitle(f"{gt_floor_pg.building_id} {gt_floor_pg.floor_id} --> IoU {iou:.2f}")
        save_dir = f"{plot_save_dir}__floorplan_iou"
        os.makedirs(save_dir, exist_ok=True)
        plt.savefig(
            f"{save_dir}/{gt_floor_pg.building_id}_{gt_floor_pg.floor_id}.jpg", dpi=300
        )
        plt.close("all")
    return iou


def render_floorplans_side_by_side(
    est_floor_pose_graph: PoseGraph2d,
    show_plot: bool = False,
    save_plot: bool = True,
    plot_save_dir: str = "floorplan_renderings",
    gt_floor_pg: Optional[PoseGraph2d] = None,
    plot_save_fpath: Optional[str] = None,
) -> None:
    """GT vs estimated floorplan, rendered side by side to a JPG."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    building_id = est_floor_pose_graph.building_id
    floor_id = est_floor_pose_graph.floor_id
    scale = (
        gt_floor_pg.scale_meters_per_coordinate if gt_floor_pg is not None else 1.0
    )

    fig = plt.figure(figsize=(12, 6))
    ax1 = None
    if gt_floor_pg is not None:
        plt.suptitle("left: GT floorplan. Right: estimated floorplan.")
        ax1 = plt.subplot(1, 2, 1)
        _render_floorplan(gt_floor_pg, scale)
        ax1.set_aspect("equal")
    ax2 = plt.subplot(1, 2, 2, sharex=ax1, sharey=ax1)
    ax2.set_aspect("equal")
    _render_floorplan(est_floor_pose_graph, scale)
    plt.title(f"Building {building_id}, {floor_id}")

    if save_plot:
        if plot_save_fpath is None:
            os.makedirs(plot_save_dir, exist_ok=True)
            plot_save_fpath = f"{plot_save_dir}/{building_id}_{floor_id}.jpg"
        plt.savefig(plot_save_fpath, dpi=300)
    plt.close("all")


def _render_floorplan(pose_graph: PoseGraph2d, scale: float) -> None:
    import matplotlib.pyplot as plt

    for _, pano_obj in pose_graph.nodes.items():
        verts = pano_obj.room_vertices_global_2d * scale
        verts = np.vstack([verts, verts[:1]])
        plt.plot(verts[:, 0], verts[:, 1], linewidth=1)
        center = pano_obj.global_Sim2_local.translation * scale
        plt.scatter(center[0], center[1], s=6)


def summarize_reports(reconstruction_reports: List[FloorReconstructionReport]) -> dict:
    """Mean + median of the four error metrics over all floors (parity :353)."""
    summary = {}
    if len(reconstruction_reports) == 0:
        return summary
    for error_metric in [
        "avg_abs_rot_err",
        "avg_abs_trans_err",
        "percent_panos_localized",
        "floorplan_iou",
        "percent_in_top2_ccs",
        "percent_in_top3_ccs",
    ]:
        vals = [getattr(r, error_metric) for r in reconstruction_reports]
        summary[f"mean_{error_metric}"] = float(np.nanmean(vals))
        summary[f"median_{error_metric}"] = float(np.nanmedian(vals))
    return summary


def compute_translation_errors_against_threshold(
    reconstruction_reports: List[FloorReconstructionReport], threshold: float
) -> float:
    """Avg fraction of cameras under a translation-error threshold."""
    rates = [
        float((r.translation_errors < threshold).mean())
        for r in reconstruction_reports
        if r.translation_errors is not None and len(r.translation_errors)
    ]
    return float(np.mean(rates)) if rates else float("nan")
