"""cv2-oracle drift measurement for the XLA rasterizers (VERDICT r3 item 7).

The reference's layout modality is EXACT cv2 output — cv2.fillPoly for room
masks (salve/utils/bev_rendering_utils.py:159-193) and cv2.line(LINE_AA)
for thick W/D/O polylines (:251) — and its released checkpoints trained on
it. The repo's ops/raster.py + rendering/layout.py replace both with XLA
coverage kernels; these tests measure the drift against cv2 itself (same
discipline as the Qhull oracle in test_interpolation_drift.py).

Drift bounds asserted here (fractions of the 501x501 raster, measured on
CPU; see BENCH_NOTES.md round-4 entry for the recorded values):
  * polygon fill: disagreement is a boundary-only set, < 1% of pixels and
    < 1.5 px-equivalent of perimeter band.
  * thick AA line: mean |coverage| gap < 3/255 over the image; binary
    (>=128) IoU > 0.9.
  * full layout render: < 2% of pixels differ by more than 32/255 in any
    channel.
"""

from __future__ import annotations

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from salve_tpu.common.wdo import WDO
from salve_tpu.geometry.sim2 import Sim2
from salve_tpu.ops import raster
from salve_tpu.rendering import layout as layout_render

IMG = 501


def _polygon_cases():
    square = np.array([[50, 50], [450, 50], [450, 450], [50, 450]], float)
    rot = np.array(
        [[250 + 180 * np.cos(t), 250 + 180 * np.sin(t)]
         for t in np.linspace(0.3, 2 * np.pi + 0.3, 7)[:-1]]
    )
    concave = np.array(
        [[60, 60], [440, 80], [430, 430], [250, 200], [80, 420]], float
    )
    sliver = np.array([[10, 240], [490, 255], [490, 275], [10, 260]], float)
    return {"square": square, "hexagon": rot, "concave": concave, "sliver": sliver}


class TestPolygonFillDrift:
    @pytest.mark.parametrize("name", list(_polygon_cases()))
    def test_fill_matches_cv2(self, name):
        verts = _polygon_cases()[name]
        ours = np.asarray(
            raster.polygon_mask(
                np.asarray(verts, np.float32), np.int32(len(verts)), IMG, IMG
            )
        )
        oracle = np.zeros((IMG, IMG, 3), np.uint8)
        cv2.fillPoly(oracle, [np.round(verts).astype(np.int32)], (255, 255, 255))
        oracle = oracle[..., 0] > 0

        disagree = np.mean(ours != oracle)
        assert disagree < 0.01, f"{name}: {disagree:.4f} of pixels disagree"
        # Disagreement must be a boundary band, not an area error: scale by
        # polygon perimeter (px) -> band width in px-equivalents.
        per = np.sum(np.linalg.norm(np.diff(np.vstack([verts, verts[:1]]), axis=0), axis=1))
        band_px = disagree * IMG * IMG / max(per, 1.0)
        assert band_px < 1.5, f"{name}: boundary band {band_px:.2f} px"


class TestThickLineDrift:
    @pytest.mark.parametrize(
        "seg",
        [
            np.array([[50.0, 60.0], [450.0, 430.0]]),
            np.array([[250.0, 20.0], [250.0, 480.0]]),  # vertical
            np.array([[20.0, 250.0], [480.0, 250.0]]),  # horizontal
            np.array([[100.0, 400.0], [420.0, 90.0]]),
        ],
    )
    def test_aa_line_matches_cv2(self, seg):
        thickness = layout_render.get_line_width_by_resolution(0.02)  # 8 px
        cov = np.asarray(
            raster.polyline_coverage(
                np.asarray(seg, np.float32), np.int32(2),
                np.float32(thickness), IMG, IMG,
            )
        )
        oracle = np.zeros((IMG, IMG, 3), np.uint8)
        p0, p1 = np.round(seg).astype(int)
        cv2.line(oracle, tuple(p0), tuple(p1), (255, 255, 255),
                 thickness=thickness, lineType=cv2.LINE_AA)
        oracle_cov = oracle[..., 0].astype(np.float64) / 255.0

        mean_gap = np.abs(cov - oracle_cov).mean()
        assert mean_gap < 3.0 / 255.0, f"mean coverage gap {mean_gap * 255:.2f}/255"
        a, b = cov >= 0.5, oracle_cov >= 0.5
        iou = (a & b).sum() / max((a | b).sum(), 1)
        assert iou > 0.9, f"binary IoU {iou:.3f}"


def _cv2_layout_oracle(room_vertices, wdo_objs, img_px=500, meters_per_px=0.02):
    """The reference's rasterize_single_layout, verbatim semantics in cv2
    (bev_rendering_utils.py:101-156): white fillPoly room mask + LINE_AA
    thick W/D/O lines with int-rounded image coords, then flipud."""
    s = layout_render.HOHO_S_ZIND_SCALE_FACTOR
    half_m = float(int((img_px / 2) * meters_per_px))
    img = np.zeros((img_px + 1, img_px + 1, 3), np.uint8)
    thickness = layout_render.get_line_width_by_resolution(meters_per_px)

    room_img = np.round((room_vertices * s + half_m) / meters_per_px).astype(np.int32)
    cv2.fillPoly(img, [room_img], (255, 255, 255))
    for wdo in wdo_objs:
        seg = np.round(
            (wdo.vertices_local_2d * s + half_m) / meters_per_px
        ).astype(int)
        color = tuple(int(c) for c in layout_render.WDO_COLORS[wdo.type])
        cv2.line(img, tuple(seg[0]), tuple(seg[1]), color,
                 thickness=thickness, lineType=cv2.LINE_AA)
    return np.flipud(img)


class TestFullLayoutDrift:
    def test_layout_render_matches_cv2_oracle(self):
        room = np.array(
            [[-3.0, -2.5], [3.0, -2.5], [3.0, 1.0], [1.0, 1.0], [1.0, 2.5], [-3.0, 2.5]]
        )
        wdos = [
            WDO(global_Sim2_local=Sim2.identity(), pt1=(-1.0, -2.5),
                pt2=(0.2, -2.5), bottom_z=0, top_z=2, type="doors"),
            WDO(global_Sim2_local=Sim2.identity(), pt1=(3.0, -1.5),
                pt2=(3.0, -0.3), bottom_z=0, top_z=2, type="windows"),
            WDO(global_Sim2_local=Sim2.identity(), pt1=(1.0, 1.4),
                pt2=(1.0, 2.2), bottom_z=0, top_z=2, type="openings"),
        ]
        ours = layout_render.rasterize_single_layout(room, wdos).astype(np.float64)
        oracle = _cv2_layout_oracle(room, wdos).astype(np.float64)

        frac_major = np.mean(np.any(np.abs(ours - oracle) > 32, axis=-1))
        assert frac_major < 0.02, f"{frac_major:.4f} of pixels differ by >32/255"
        # The W/D/O colors must land in the same places: per-channel masks.
        for ch, kind in ((0, "windows"), (1, "doors"), (2, "openings")):
            a = (ours[..., ch] > 128) & (ours.sum(-1) < 500)  # colored, not white
            b = (oracle[..., ch] > 128) & (oracle.sum(-1) < 500)
            iou = (a & b).sum() / max((a | b).sum(), 1)
            assert iou > 0.85, f"{kind} line IoU {iou:.3f}"
