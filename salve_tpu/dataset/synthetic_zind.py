"""Materialize a ZInD-shaped building directory from GT geometry alone.

Writes the exact on-disk layout the pipeline CLIs consume
({building}/zind_data.json + {building}/panos/floor_XX_..._pano_{i}.jpg and
the u16-mm depth cache), with imagery ray-cast from the GT layouts
(rendering/synthetic.py). This turns the redistributable fixture geometry
into a fully runnable dataset: Stage A..D and training all operate on it
through their real file contracts.
"""

from __future__ import annotations

import json
import shutil
import zlib
from pathlib import Path
from typing import Callable, Dict, Optional

import numpy as np

from salve_tpu.common import posegraph2d


def _ceiling_heights_by_stem(zind_json_fpath: Path) -> Dict[str, float]:
    """Per-pano ego-normalized ceiling_height keyed by image stem.

    ZInD stores ceiling_height relative to the unit camera height (fixture
    1210: 1.58-2.53, median 1.92); PanoData does not parse it (matching the
    reference parser, salve/common/pano_data.py:79), so read it from the
    raw JSON here to place the rendered world's ceiling plane.
    """
    with open(zind_json_fpath) as f:
        data = json.load(f)
    out: Dict[str, float] = {}
    for floor in data.get("merger", {}).values():
        for complete in floor.values():
            for partial in complete.values():
                for pano in partial.values():
                    if not isinstance(pano, dict) or "image_path" not in pano:
                        continue
                    stem = Path(pano["image_path"]).stem
                    out[stem] = float(pano.get("ceiling_height", 2.0))
    return out


def materialize_synthetic_building(
    src_zind_dir: str,
    building_id: str,
    out_raw_dir: str,
    depth_save_root: Optional[str] = None,
    depth_provider: Optional[Callable[[np.ndarray], np.ndarray]] = None,
    seed: int = 0,
) -> Dict[str, int]:
    """Write panos (+ optional depth cache) for one building.

    Args:
        src_zind_dir: directory holding {building_id}/zind_data.json (GT).
        out_raw_dir: output raw-dataset root (ZInD shape).
        depth_save_root: if set, also write {root}/{building}/{stem}.depth.png
            u16 millimeter maps (the reference HoHoNet cache contract,
            salve/utils/hohonet_inference.py:14).
        depth_provider: optional (H,W,3) f32 RGB -> (H,W) f32 meters model;
            default writes the exact ray-cast GT depth.
        seed: texture seed base.

    Returns:
        {floor_id: n_panos} written.
    """
    import imageio.v2 as imageio

    from salve_tpu.rendering.synthetic import (
        R_FIX as synthetic_R_FIX,
        build_floor_world,
        render_synthetic_pano_world,
    )

    bdir = Path(out_raw_dir) / building_id
    (bdir / "panos").mkdir(parents=True, exist_ok=True)
    shutil.copy(
        Path(src_zind_dir) / building_id / "zind_data.json", bdir / "zind_data.json"
    )

    ceil_by_stem = _ceiling_heights_by_stem(bdir / "zind_data.json")

    written: Dict[str, int] = {}
    floors = posegraph2d.compute_available_floors_for_building(
        building_id, str(out_raw_dir)
    )
    for floor_id in floors:
        pg = posegraph2d.get_gt_pose_graph(building_id, floor_id, str(out_raw_dir))
        # ONE multi-room world + texture seed per building+floor
        # (world-anchored): panos viewing the same space must render
        # agreeing colors, and rays pass through door/opening portals so
        # cross-room pano pairs share visible content — both are the
        # verifier's training signal.
        world = build_floor_world(pg)
        floor_seed = (
            seed * 4093 + zlib.crc32(f"{building_id}/{floor_id}".encode())
        ) & 0x7FFFFFFF
        S = float(pg.scale_meters_per_coordinate)
        # One ceiling plane per floor world (panos viewing the same space
        # must agree on the geometry): the median metric ceiling over the
        # floor's panos. ZInD annotates ceiling height per pano/room; the
        # raycast world is a single-ceiling approximation of that.
        ceils_m = [
            ceil_by_stem.get(Path(p.image_path).stem, 2.0)
            * pg.get_camera_height_m(i)
            for i, p in pg.nodes.items()
        ]
        floor_ceil_m = float(np.median(ceils_m)) if ceils_m else None
        # Resume by per-pano, per-artifact file existence (the same contract
        # as the BEV renderer and depth cache; reference parity
        # salve/utils/hohonet_inference.py, where panos and cached depth are
        # independent artifacts): an existing pano skips the ray cast, an
        # existing depth map skips depth derivation. A model depth_provider
        # can fill a missing depth map from an already-written pano (its
        # contract is RGB-in); GT depth requires the ray cast. NOTE: existing
        # depth maps are never re-derived — reuse an output root only with
        # the same depth producer.
        for i, pano in pg.nodes.items():
            stem = Path(pano.image_path).stem
            pano_fp = bdir / "panos" / f"{stem}.jpg"
            depth_fp = (
                Path(depth_save_root) / building_id / f"{stem}.depth.png"
                if depth_save_root is not None
                else None
            )
            need_pano = not pano_fp.exists()
            need_depth = depth_fp is not None and not depth_fp.exists()
            if not (need_pano or need_depth):
                continue
            # GT depth comes from the ray cast; a model provider only needs
            # the RGB, which an existing pano already supplies.
            need_raycast = need_pano or (need_depth and depth_provider is None)
            out = None
            if need_raycast:
                cam_h = pg.get_camera_height_m(i)
                cam_xy = (
                    pano.global_Sim2_local.transform_from(np.zeros((1, 2)))[0] * S
                )
                # R_FIX post-multiply: synthetic panos follow the real-ZInD
                # sphere-frame convention (rendering/synthetic.py:R_FIX), so
                # the production backprojection's -90 deg ego fix is correct
                # on them.
                out = render_synthetic_pano_world(
                    world,
                    cam_xy=cam_xy,
                    cam_h=cam_h,
                    ceil_h=floor_ceil_m,
                    seed=floor_seed,
                    world_R=np.asarray(
                        pano.global_Sim2_local.rotation, dtype=np.float64
                    )
                    @ synthetic_R_FIX,
                    # v12 asymmetry cues: hashed doormats keyed off each
                    # door's world position (rendering/synthetic.py:
                    # _apply_door_mats) — the corpus-side attack on the
                    # symmetric-door rotation-FP family (ACCURACY_r04
                    # forensics_0038).
                    door_rects=world.door_rects,
                )
            if need_pano:
                # cv2 encode: byte-identical to imageio at q95, 3.6x faster
                # (dataset_renderer.write_jpg) — pano JPGs are 8x the pixels
                # of a BEV render, so this is most of materialize's encode.
                from salve_tpu.rendering.dataset_renderer import write_jpg

                write_jpg(str(pano_fp), out["rgb"])
            if need_depth:
                depth_fp.parent.mkdir(parents=True, exist_ok=True)
                if depth_provider is None:
                    depth_m = out["depth"]
                else:
                    rgb = (
                        out["rgb"]
                        if out is not None
                        else imageio.imread(str(pano_fp))
                    )
                    # Provider contract: RGB in [0,1] (depth/cache.py).
                    depth_m = np.asarray(
                        depth_provider(rgb.astype(np.float32) / 255.0)
                    )
                depth_mm = np.clip(np.round(depth_m * 1000.0), 0, 65535).astype(
                    np.uint16
                )
                imageio.imwrite(str(depth_fp), depth_mm)
        written[floor_id] = len(pg.nodes)
    return written
