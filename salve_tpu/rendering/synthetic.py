"""Synthetic equirect panos ray-cast from ZInD GT room layouts.

The reference pipeline consumes real ZInD pano JPGs, which are not
redistributable and absent from the test fixtures — only the GT layout
geometry ships (tests/test_data/ZInD/*/zind_data.json). This module closes
the gap: it ray-casts a room layout (floor polygon + camera/ceiling heights)
into a textured equirectangular RGB pano together with *exact* metric depth
along every ray.

That pairing powers three things that need ground truth the fixtures lack:
  1. training + measuring the monocular depth net (models/depth_net.py),
  2. the interpolation-drift harness (renders with controlled point clouds),
  3. end-to-end pipeline runs (hypotheses -> depth -> BEV -> verifier -> SfM)
     with a fully consistent world.

Ray convention matches the production backprojection chain
(geometry/pano_projection.py:get_uni_sphere_xyz, the HoHoNet convention the
reference uses in salve/utils/hohonet_pano_utils.py:10), so a BEV render of
a synthetic pano reproduces the room's floor plan exactly.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from salve_tpu.geometry.pano_projection import get_uni_sphere_xyz

PANO_H, PANO_W = 512, 1024

FLOOR, CEILING, WALL = 0, 1, 2


def raycast_layout(
    room_vertices_m: np.ndarray,
    camera_height_m: float,
    ceiling_height_m: float,
    h: int = PANO_H,
    w: int = PANO_W,
) -> Dict[str, np.ndarray]:
    """Cast every pano ray against a vertical-prism room model.

    The room is the prism over the floor polygon `room_vertices_m` (metric,
    camera at origin) between z=-camera_height_m (floor) and
    z=ceiling_height_m - camera_height_m (ceiling).

    Returns dict with:
        depth:    (h,w) metric distance along the ray to the first hit.
        surface:  (h,w) int8 in {FLOOR, CEILING, WALL}.
        hit_xyz:  (h,w,3) hit point, camera frame.
        wall_edge:(h,w) int32 polygon-edge index of wall hits (else -1).
        wall_s:   (h,w) metric arc length along that edge at the hit.
    """
    rays = get_uni_sphere_xyz(h, w)  # (h,w,3), unit
    ring = np.asarray(room_vertices_m, dtype=np.float64)
    a = ring
    b = np.roll(ring, -1, axis=0)
    e = b - a  # (E,2)
    e_len = np.linalg.norm(e, axis=1)

    dx = rays[..., 0][..., None]
    dy = rays[..., 1][..., None]
    # Ray (t*dx, t*dy) meets segment a + s*e: solve the 2x2 system.
    denom = dx * (-e[:, 1]) + dy * e[:, 0]
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (a[:, 0] * (-e[:, 1]) + a[:, 1] * e[:, 0]) / denom
        s = (dx * a[:, 1] - dy * a[:, 0]) / denom
    hit = (np.abs(denom) > 1e-12) & (t > 1e-6) & (s >= 0.0) & (s <= 1.0)
    t = np.where(hit, t, np.inf)
    edge_idx = np.argmin(t, axis=-1).astype(np.int32)  # (h,w)
    t_wall = np.take_along_axis(t, edge_idx[..., None], axis=-1)[..., 0]
    s_wall = np.take_along_axis(
        np.where(hit, s, 0.0), edge_idx[..., None], axis=-1
    )[..., 0]

    # t parametrizes the unit 3D ray directly (its xy components were used in
    # the 2D solve), so t_wall is already metric distance along the ray.
    t_wall_3d = t_wall

    dz = rays[..., 2]
    z_floor = -float(camera_height_m)
    z_ceil = float(ceiling_height_m) - float(camera_height_m)
    with np.errstate(divide="ignore", invalid="ignore"):
        t_floor = np.where(dz < -1e-6, z_floor / dz, np.inf)
        t_ceil = np.where(dz > 1e-6, z_ceil / dz, np.inf)

    # The wall hit only counts while its z lies within [floor, ceiling];
    # beyond that the floor/ceiling plane is hit first anyway because the
    # room is convex in z — min() implements exactly that.
    depth = np.minimum(np.minimum(t_floor, t_ceil), t_wall_3d)
    surface = np.where(
        depth == t_wall_3d, WALL, np.where(depth == t_floor, FLOOR, CEILING)
    ).astype(np.int8)
    depth = np.clip(depth, 0.0, 65.0)

    hit_xyz = rays * depth[..., None]
    wall_edge = np.where(surface == WALL, edge_idx, -1).astype(np.int32)
    wall_s = np.where(surface == WALL, s_wall * e_len[edge_idx], 0.0)
    return {
        "depth": depth.astype(np.float32),
        "surface": surface,
        "hit_xyz": hit_xyz.astype(np.float32),
        "wall_edge": wall_edge,
        "wall_s": wall_s.astype(np.float32),
    }


def _hash01(*ints: int) -> float:
    """Deterministic [0,1) hash of small integers (texture randomization)."""
    x = np.uint64(2166136261)
    for i in ints:
        x = np.uint64((int(x) ^ (int(i) & 0xFFFFFFFF)) * 16777619 & 0xFFFFFFFFFFFFFFFF)
    return float(int(x) % 100003) / 100003.0


def _hash01_grid(ix: np.ndarray, iy: np.ndarray, seed: int, salt: int) -> np.ndarray:
    """Vectorized [0,1) hash of integer grid coordinates."""
    h = (
        ix.astype(np.int64) * np.int64(73856093)
        ^ iy.astype(np.int64) * np.int64(19349663)
        ^ np.int64((seed * 31 + salt) * 83492791)
    )
    return (np.abs(h) % np.int64(100003)).astype(np.float64) / 100003.0


# Rug grid for world-anchored floor patches (see render_synthetic_pano).
RUG_CELL_M, RUG_MARGIN_M = 2.0, 0.3


def _smooth_field(
    wx: np.ndarray, wy: np.ndarray, rng, amp: float = 0.22, n_waves: int = 2
) -> np.ndarray:
    """Smooth non-periodic per-channel color modulation, world-anchored.

    A mixture of random-frequency sinusoids (0.25-0.9 rad/m): every world
    location gets a distinct, slowly-varying tint, so two BEV crops agree
    only when they truly cover the same place.
    """
    field = np.ones(wx.shape + (3,))
    for c in range(3):
        acc = np.zeros_like(wx)
        for _ in range(n_waves):
            fx, fy = rng.uniform(0.25, 0.9, 2)
            px, py = rng.uniform(0, 2 * np.pi, 2)
            acc = acc + np.sin(wx * fx + px) * np.sin(wy * fy + py)
        field[..., c] = 1.0 + amp * acc / n_waves
    return field


def render_synthetic_pano(
    room_vertices_m: np.ndarray,
    camera_height_m: float,
    ceiling_height_m: Optional[float] = None,
    h: int = PANO_H,
    w: int = PANO_W,
    seed: int = 0,
    world_R: Optional[np.ndarray] = None,
    world_t: Optional[np.ndarray] = None,
) -> Dict[str, np.ndarray]:
    """Textured synthetic pano + exact depth for a room layout.

    Textures are procedural but scale-anchored (0.5 m floor checker, 0.25 m
    wall stripes, baseboards, hashed wall hues), so both monocular depth
    cues and BEV texture matching carry real signal.

    Texture coordinates are WORLD-anchored when (world_R, world_t) — the
    metric camera->world transform — are given: two panos viewing the same
    room then render agreeing colors, which is exactly the signal the
    alignment verifier must learn (a per-pano texture world would make even
    GT-aligned pairs look inconsistent). With the default identity
    transform, textures are camera-anchored (fine for single-pano uses like
    depth-supervision domain randomization).

    Returns dict with 'rgb' (h,w,3) uint8 and everything raycast_layout emits.
    """
    if ceiling_height_m is None:
        ceiling_height_m = 2.0 * camera_height_m
    cast = raycast_layout(room_vertices_m, camera_height_m, ceiling_height_m, h, w)
    depth, surface = cast["depth"], cast["surface"]
    xyz = cast["hit_xyz"]

    if world_R is None:
        world_R = np.eye(2)
    if world_t is None:
        world_t = np.zeros(2)
    wxy = xyz[..., :2] @ np.asarray(world_R, dtype=np.float64).T + np.asarray(
        world_t, dtype=np.float64
    )
    wx, wy = wxy[..., 0], wxy[..., 1]
    wz = xyz[..., 2] + camera_height_m  # absolute height above the floor

    rng = np.random.default_rng(seed)
    rgb = np.zeros((h, w, 3), dtype=np.float64)

    # Floor: 0.5 m checkerboard over two warm wood tones + plank stripes.
    base_a = np.array([139, 105, 74]) + rng.integers(-15, 15, 3)
    base_b = np.array([168, 135, 100]) + rng.integers(-15, 15, 3)
    checker = ((np.floor(wx / 0.5) + np.floor(wy / 0.5)) % 2).astype(bool)
    plank = (np.floor(wy / 0.12) % 2).astype(bool)
    floor_col = np.where(checker[..., None], base_a, base_b) * np.where(
        plank[..., None], 1.0, 0.92
    )

    # World-anchored location distinguishers. Without them the floor is a
    # uniform *periodic* checker: BEV crops from different places look
    # statistically identical (and exactly identical modulo the 1 m period),
    # so misaligned overlaps carry no mismatch signal — measured as verifier
    # precision at chance on held-out buildings despite a healthy val mAcc.
    #  (a) smooth random color field: every location gets a distinct tint;
    #  (b) hashed 2 m "area rugs": salient distinct-color patches on ~40%
    #      of floor cells (furniture stand-in).
    field = _smooth_field(wx, wy, rng)
    floor_col = floor_col * field
    ix = np.floor(wx / RUG_CELL_M).astype(np.int64)
    iy = np.floor(wy / RUG_CELL_M).astype(np.int64)
    has_rug = _hash01_grid(ix, iy, seed, 11) < 0.55
    fx_in = wx - ix * RUG_CELL_M
    fy_in = wy - iy * RUG_CELL_M
    in_rug = (
        has_rug
        & (fx_in > RUG_MARGIN_M) & (fx_in < RUG_CELL_M - RUG_MARGIN_M)
        & (fy_in > RUG_MARGIN_M) & (fy_in < RUG_CELL_M - RUG_MARGIN_M)
    )
    rug_col = np.stack(
        [60.0 + 160.0 * _hash01_grid(ix, iy, seed, s) for s in (5, 6, 7)], -1
    )
    rug_stripe = (np.floor((fx_in + fy_in) / 0.2) % 2).astype(bool)
    rug_col = rug_col * np.where(rug_stripe[..., None], 1.0, 0.9)
    floor_col = np.where(in_rug[..., None], rug_col, floor_col)
    rgb = np.where((surface == FLOOR)[..., None], floor_col, rgb)

    # Ceiling: light neutral with a slow plaster gradient + the same
    # world-anchored field (lighter), so the ceiling modality also tells
    # locations apart.
    ceil_base = np.array([228, 226, 220]) + rng.integers(-8, 8, 3)
    grad = 1.0 - 0.05 * np.abs(np.sin(wx * 0.7) + np.cos(wy * 0.9)) / 2
    ceil_col = ceil_base * grad[..., None] * (1.0 + 0.6 * (field - 1.0))
    rgb = np.where((surface == CEILING)[..., None], ceil_col, rgb)

    # Walls: hue hashed from the wall's quantized WORLD position (two panos
    # of one room hash the same physical wall to the same hue), 0.25 m
    # world-space stripes, baseboard + crown bands at absolute heights.
    edge = cast["wall_edge"]
    ring = np.asarray(room_vertices_m, dtype=np.float64)
    mids = 0.5 * (ring + np.roll(ring, -1, axis=0))  # (E,2) edge midpoints
    wmids = mids @ np.asarray(world_R, dtype=np.float64).T + np.asarray(
        world_t, dtype=np.float64
    )
    qm = np.round(wmids / 0.25).astype(np.int64)  # 0.25 m quantization
    n_edges = len(ring)
    hue_lut = np.array(
        [
            [
                140 + 90 * _hash01(seed, int(qm[k, 0]), int(qm[k, 1]), 1),
                140 + 90 * _hash01(seed, int(qm[k, 0]), int(qm[k, 1]), 2),
                130 + 90 * _hash01(seed, int(qm[k, 0]), int(qm[k, 1]), 3),
            ]
            for k in range(max(n_edges, 1))
        ]
    )
    wall_base = hue_lut[np.clip(edge, 0, n_edges - 1)]
    stripe = (np.floor((wx + wy) / 0.25) % 2).astype(bool)
    baseboard = wz < 0.12
    crown = wz > (ceiling_height_m - 0.10)
    wall_col = wall_base * np.where(stripe[..., None], 1.0, 0.90)
    wall_col = np.where(baseboard[..., None], np.array([70.0, 60, 55]), wall_col)
    wall_col = np.where(crown[..., None], np.array([210.0, 208, 200]), wall_col)
    rgb = np.where((surface == WALL)[..., None], wall_col, rgb)

    # Distance shading (cheap ambient falloff) + sensor noise.
    shade = 1.0 / (1.0 + 0.035 * depth)
    rgb = rgb * shade[..., None]
    rgb = rgb + rng.normal(0.0, 2.5, rgb.shape)
    out = dict(cast)
    out["rgb"] = np.clip(rgb, 0, 255).astype(np.uint8)
    return out


def synthetic_pano_for_pano_data(
    pano,
    camera_height_m: float,
    seed: Optional[int] = None,
    scale_meters_per_coordinate: Optional[float] = None,
):
    """Convenience: synthetic pano for a PanoData (ego-normalized layout).

    ZInD layouts are ego-normalized (camera height == 1 unit,
    salve/common/pano_data.py parse asserts camera_height == 1.0), so metric
    vertices are layout * camera_height_m.

    When scale_meters_per_coordinate is given, textures are anchored in the
    building's world-metric frame (derived from pano.global_Sim2_local):
    p_world_m = R @ p_cam_m + camera_height_m * t, since the pano scale
    satisfies S * s_pano = camera_height_m. Pass the same `seed` for every
    pano of a building so they share one texture world.
    """
    verts_m = np.asarray(pano.room_vertices_local_2d, dtype=np.float64) * float(
        camera_height_m
    )
    world_R = world_t = None
    if scale_meters_per_coordinate is not None:
        world_R = np.asarray(pano.global_Sim2_local.rotation, dtype=np.float64)
        world_t = camera_height_m * np.asarray(
            pano.global_Sim2_local.translation, dtype=np.float64
        )
    return render_synthetic_pano(
        verts_m,
        camera_height_m=camera_height_m,
        seed=int(pano.id) if seed is None else seed,
        world_R=world_R,
        world_t=world_t,
    )
