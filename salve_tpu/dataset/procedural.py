"""Procedural ZInD-format buildings: unlimited training geometry.

Generates `zind_data.json`-compatible dicts (the exact schema
common/pano_data.py parses — merger nesting, left-handed ego layouts,
floor_plan_transformation, flat W/D/O triplets) from a random grid floor
plan, so every pipeline stage and the verifier can train on as many
buildings as needed. The fixture set ships only two real buildings; the
reference's released models were trained on 587 tours — this closes the
data-scale gap for synthetic end-to-end runs.

World model: an R x C grid of rectangular rooms with some cells removed,
doors on shared interior walls (present in BOTH adjacent rooms' W/D/O
lists at coincident world coordinates — exactly what Stage A aligns on),
windows on exterior walls, occasional wide openings, and 1-2 panos per
room at jittered positions/headings.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

CAMERA_HEIGHT_M = 1.5
DOOR_WIDTH_M = 0.95
OPENING_WIDTH_M = 1.8
WINDOW_WIDTH_M = 1.3
DOOR_TOP_M = 2.05
WINDOW_BOTTOM_M, WINDOW_TOP_M = 0.9, 2.0


def _ego_from_world(p_world_m, cam_xy, theta_deg, cam_h):
    """World-metric -> ego-normalized (camera at origin, height 1 unit).

    Inverse of generate_Sim2_from_floorplan_transform composed with the
    metric scale: p_wn = s (R p_ego + t) with R = rotmat2d(-rotation),
    S*s = cam_h; so p_ego = R^T (p_world_m - cam_world_m) / cam_h.
    """
    th = np.deg2rad(-theta_deg)
    R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    return (np.asarray(p_world_m) - np.asarray(cam_xy)) @ R / cam_h


def _flip_x(points: np.ndarray) -> np.ndarray:
    """Right-handed ego -> ZInD's stored left-handed frame."""
    out = np.asarray(points, dtype=float).copy()
    out[..., 0] *= -1
    return out


def _wall_segment(center_xy, along, half_width):
    a = np.asarray(center_xy) - np.asarray(along) * half_width
    b = np.asarray(center_xy) + np.asarray(along) * half_width
    return a, b


def generate_building_json(
    seed: int,
    n_rows: Optional[int] = None,
    n_cols: Optional[int] = None,
    scale_meters_per_coordinate: float = 3.5,
) -> Dict:
    """One procedural building as a zind_data.json-compatible dict."""
    rng = np.random.default_rng(seed)
    R = n_rows or int(rng.integers(2, 4))
    C = n_cols or int(rng.integers(2, 4))

    # Cell extents (shared walls): cumulative random sizes.
    widths = rng.uniform(3.0, 5.5, C)
    heights = rng.uniform(3.0, 5.0, R)
    xs = np.concatenate([[0.0], np.cumsum(widths)])
    ys = np.concatenate([[0.0], np.cumsum(heights)])

    # Drop some cells (keep the grid 4-connected by construction below).
    present = np.ones((R, C), dtype=bool)
    for _ in range(int(rng.integers(0, R * C // 3 + 1))):
        r, c = int(rng.integers(R)), int(rng.integers(C))
        trial = present.copy()
        trial[r, c] = False
        if trial.sum() >= 2 and _is_connected(trial):
            present = trial

    rooms = {}  # (r,c) -> polygon (4,2) world-metric CCW
    for r in range(R):
        for c in range(C):
            if present[r, c]:
                x0, x1, y0, y1 = xs[c], xs[c + 1], ys[r], ys[r + 1]
                rooms[(r, c)] = np.array(
                    [[x0, y0], [x1, y0], [x1, y1], [x0, y1]]
                )

    # W/D/Os per room, as (type, world endpoint a, world endpoint b, bz, tz).
    wdos: Dict[Tuple[int, int], List] = {rc: [] for rc in rooms}
    for (r, c) in rooms:
        # Right neighbor: shared vertical wall at xs[c+1].
        if (r, c + 1) in rooms:
            is_opening = rng.uniform() < 0.25
            width = OPENING_WIDTH_M if is_opening else DOOR_WIDTH_M
            lo, hi = ys[r] + 0.6 + width / 2, ys[r + 1] - 0.6 - width / 2
            if hi > lo:
                cy = rng.uniform(lo, hi)
                a, b = _wall_segment((xs[c + 1], cy), (0.0, 1.0), width / 2)
                kind = "openings" if is_opening else "doors"
                top = 2.4 if is_opening else DOOR_TOP_M
                wdos[(r, c)].append((kind, a, b, 0.0, top))
                wdos[(r, c + 1)].append((kind, a, b, 0.0, top))
        # Top neighbor: shared horizontal wall at ys[r+1].
        if (r + 1, c) in rooms:
            is_opening = rng.uniform() < 0.25
            width = OPENING_WIDTH_M if is_opening else DOOR_WIDTH_M
            lo, hi = xs[c] + 0.6 + width / 2, xs[c + 1] - 0.6 - width / 2
            if hi > lo:
                cx = rng.uniform(lo, hi)
                a, b = _wall_segment((cx, ys[r + 1]), (1.0, 0.0), width / 2)
                kind = "openings" if is_opening else "doors"
                top = 2.4 if is_opening else DOOR_TOP_M
                wdos[(r, c)].append((kind, a, b, 0.0, top))
                wdos[(r + 1, c)].append((kind, a, b, 0.0, top))
        # Windows on exterior walls.
        for side, nbr, seg in (
            ("left", (r, c - 1), ((xs[c], ys[r]), (xs[c], ys[r + 1]), (0.0, 1.0))),
            ("right", (r, c + 1), ((xs[c + 1], ys[r]), (xs[c + 1], ys[r + 1]), (0.0, 1.0))),
            ("bottom", (r - 1, c), ((xs[c], ys[r]), (xs[c + 1], ys[r]), (1.0, 0.0))),
            ("top", (r + 1, c), ((xs[c], ys[r + 1]), (xs[c + 1], ys[r + 1]), (1.0, 0.0))),
        ):
            if nbr in rooms or rng.uniform() < 0.35:
                continue
            (p0, p1, along) = seg
            span = np.linalg.norm(np.asarray(p1) - np.asarray(p0))
            if span < WINDOW_WIDTH_M + 1.2:
                continue
            u = rng.uniform(0.6 + WINDOW_WIDTH_M / 2, span - 0.6 - WINDOW_WIDTH_M / 2)
            center = np.asarray(p0) + np.asarray(along) * u
            a, b = _wall_segment(center, along, WINDOW_WIDTH_M / 2)
            wdos[(r, c)].append(("windows", a, b, WINDOW_BOTTOM_M, WINDOW_TOP_M))

    # Panos: 1-2 per room.
    merger_floor: Dict[str, Dict] = {}
    pano_id = 0
    S = float(scale_meters_per_coordinate)
    for k, ((r, c), poly) in enumerate(sorted(rooms.items())):
        complete = f"complete_room_{k:02d}"
        merger_floor[complete] = {}
        n_panos = int(rng.integers(1, 3))
        for j in range(n_panos):
            partial = f"partial_room_{k:02d}"
            pano_key = f"pano_{pano_id}"
            cx = rng.uniform(poly[0, 0] + 0.9, poly[1, 0] - 0.9)
            cy = rng.uniform(poly[0, 1] + 0.9, poly[2, 1] - 0.9)
            theta = float(rng.uniform(0.0, 360.0))
            cam_h = CAMERA_HEIGHT_M

            verts_ego = _ego_from_world(poly, (cx, cy), theta, cam_h)
            layout = {
                "vertices": _flip_x(verts_ego).tolist(),
                "doors": [],
                "windows": [],
                "openings": [],
            }
            for kind, a, b, bz_m, tz_m in wdos[(r, c)]:
                a_e = _flip_x(_ego_from_world(a, (cx, cy), theta, cam_h))
                b_e = _flip_x(_ego_from_world(b, (cx, cy), theta, cam_h))
                # z stored ego-normalized: floor plane sits at -1.
                bz = (bz_m - cam_h) / cam_h
                tz = (tz_m - cam_h) / cam_h
                layout[kind].extend(
                    [list(map(float, a_e)), list(map(float, b_e)), [bz, tz]]
                )

            s_pano = cam_h / S
            image_path = (
                f"panos/floor_01_partial_room_{k:02d}_pano_{pano_id}.jpg"
            )
            merger_floor[complete].setdefault(partial, {})[pano_key] = {
                "camera_height": 1.0,
                "ceiling_height": 2.0,
                "checksum": "",
                "floor_number": 1,
                "is_ceiling_flat": True,
                "is_inside": True,
                "is_primary": j == 0,
                "label": rng.choice(
                    ["bedroom", "living room", "kitchen", "bathroom", "office"]
                ),
                "image_path": image_path,
                "floor_plan_transformation": {
                    "rotation": theta,
                    # ZInD stores the transform in the LEFT-handed frame: the
                    # parser (common/pano_data.py:
                    # generate_Sim2_from_floorplan_transform) negates the
                    # stored translation's x, so the camera's world position
                    # (cx, cy) must be stored as (-cx, cy) in world-normalized
                    # units. (A +cx here shifts every pano's parsed world by
                    # -2cx: each room stays self-consistent — axis-aligned,
                    # camera inside — but shared doors stop coinciding across
                    # panos, which silently destroys all cross-pano GT labels;
                    # see tests/dataset/test_procedural.py's shared-door
                    # world-coincidence test.)
                    "translation": [-cx / S, cy / S],
                    "scale": s_pano,
                },
                "layout_raw": dict(layout),
                "layout_complete": dict(layout),
            }
            pano_id += 1

    return {
        "redraw": {},
        "floorplan_to_redraw_transformation": {},
        "scale_meters_per_coordinate": {"floor_01": S},
        "merger": {"floor_01": merger_floor},
    }


def _is_connected(present: np.ndarray) -> bool:
    """4-connectivity check of the room grid."""
    R, C = present.shape
    cells = list(zip(*np.nonzero(present)))
    if not cells:
        return False
    seen = {cells[0]}
    stack = [cells[0]]
    while stack:
        r, c = stack.pop()
        for dr, dc in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            n = (r + dr, c + dc)
            if 0 <= n[0] < R and 0 <= n[1] < C and present[n] and n not in seen:
                seen.add(n)
                stack.append(n)
    return len(seen) == int(present.sum())


def write_procedural_buildings(
    out_zind_dir: str, building_ids: List[str], base_seed: int = 0
) -> None:
    """Write zind_data.json for each building id (geometry only; pair with
    dataset/synthetic_zind.py to materialize imagery + depth)."""
    for bid in building_ids:
        bdir = Path(out_zind_dir) / bid
        bdir.mkdir(parents=True, exist_ok=True)
        data = generate_building_json(seed=base_seed * 99991 + int(bid))
        with open(bdir / "zind_data.json", "w") as f:
            json.dump(data, f)
