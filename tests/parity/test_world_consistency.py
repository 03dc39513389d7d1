"""Materialized synthetic worlds are consistent with the PRODUCTION BEV path.

Round-2 regression lock: the synthetic pano generator must follow the real
ZInD pixel->direction convention (ego = R_FIX @ sphere, the -90 deg fix the
production backprojection applies, salve/utils/bev_rendering_utils.py:443).
When the generator instead rendered panos whose sphere frame equaled the ego
frame, every production-rendered "aligned" pair misregistered by a
pose-dependent offset ~|t| — photometrically indistinguishable from a
misaligned pair, which silently capped verifier training at chance.

The decisive check lives here: materialize a building with the real
materializer, render a GT-exact pair with the real pair renderer, and demand
aligned pairs photometrically AGREE while misaligned pairs DISAGREE.
"""

import numpy as np
import pytest

from salve_tpu.common import posegraph2d
from salve_tpu.dataset.procedural import write_procedural_buildings
from salve_tpu.dataset.synthetic_zind import materialize_synthetic_building
from salve_tpu.geometry.sim2 import Sim2
from salve_tpu.rendering import bev_pair


@pytest.fixture(scope="module")
def materialized_building(tmp_path_factory):
    root = tmp_path_factory.mktemp("world_consistency")
    src = root / "geom"
    zind = root / "zind"
    depth = root / "depth"
    write_procedural_buildings(str(src), ["0001"], base_seed=0)
    materialize_synthetic_building(
        str(src), "0001", str(zind), depth_save_root=str(depth)
    )
    pg = posegraph2d.get_gt_pose_graph("0001", "floor_01", str(zind))
    return zind, depth, pg


def _same_room_pair(pg):
    """Two pano ids sharing a room.

    Each camera must sit inside the OTHER pano's room polygon (world frame) —
    the v9 generator's spread placement makes "nearest camera pair" an unsafe
    proxy (two panos through a wall can be closer than any same-room pair).
    Among true same-room pairs, pick the closest for maximal joint support.
    """
    from salve_tpu.geometry.polygons import points_in_polygon

    ids = sorted(pg.nodes)
    cams = {
        i: pg.nodes[i].global_Sim2_local.transform_from(np.zeros((1, 2)))[0]
        for i in ids
    }
    rooms = {i: pg.nodes[i].room_vertices_global_2d for i in ids}

    def same_room(a, b):
        return bool(
            points_in_polygon(rooms[a], cams[b][None])[0]
            and points_in_polygon(rooms[b], cams[a][None])[0]
        )

    candidates = [(a, b) for a in ids for b in ids if a < b and same_room(a, b)]
    assert candidates, "no same-room pano pair in the materialized building"
    return min(
        candidates,
        key=lambda ab: np.linalg.norm(cams[ab[0]] - cams[ab[1]]),
    )


def _joint_diff(img_a, img_b):
    a = img_a.astype(np.float32)
    b = img_b.astype(np.float32)
    sup = (a.sum(-1) > 0) & (b.sum(-1) > 0)
    assert sup.mean() > 0.02, "pair has (almost) no joint support"
    return float(np.abs(a - b).mean(-1)[sup].mean())


def test_aligned_pairs_agree_misaligned_disagree(materialized_building):
    zind, depth_root, pg = materialized_building
    i, j = _same_room_pair(pg)

    def load(pid):
        from pathlib import Path

        stem = Path(pg.nodes[pid].image_path).stem
        d = bev_pair.load_depth_mm(str(depth_root / "0001" / f"{stem}.depth.png"))
        r = bev_pair.load_pano_rgb(str(zind / "0001" / "panos" / f"{stem}.jpg"))
        return d, r

    d1, r1 = load(i)
    d2, r2 = load(j)

    # GT-exact relative pose: rel = w2^-1 o w1 maps pano-1 LOCAL coords to
    # pano-2 LOCAL coords, x_l2 = s_rel (R x_l1 + t_rel) with s_rel = s1/s2.
    # In METRIC coords (X_i = h_i * x_li, h_i = scale_i * m-per-coord) that
    # collapses to X2 = R X1 + h1 * t_rel — the metric translation carries
    # PANO-1's camera height, not pano 2's (the h2 factors cancel through
    # s_rel). The renderer converts hypothesis translations to the metric
    # point cloud with the reference's FIXED 1.5 factor
    # (HOHO_S_ZIND_SCALE_FACTOR, bev_rendering_utils.py:448 — an assumed
    # 1.5 m camera height), so the metric-EXACT feed is t_rel * h1 / 1.5.
    # Production keeps the 1.5 approximation (parity: real ZInD camera
    # heights vary 1.3-1.7 m and the reference misregisters them the same
    # way); this test wants exact registration to lock the generator's frame
    # convention, so it undoes the approximation.
    w1s = pg.nodes[i].global_Sim2_local
    w2s = pg.nodes[j].global_Sim2_local
    rel = w2s.inverse().compose(w1s)
    h1 = w1s.scale * pg.scale_meters_per_coordinate
    t_exact = rel.translation * h1 / 1.5
    exact = Sim2(R=rel.rotation, t=t_exact, s=1.0)

    a1, a2 = bev_pair.render_bev_pair(d1, r1, d2, r2, exact, "floor")
    aligned = _joint_diff(a1, a2)

    # The decisive registration lock: zero shift must be the photometric
    # minimum over integer BEV shifts. The handedness bug this test guards
    # against moved the minimum to a pose-dependent offset ~|t|.
    def shifted_diff(dy, dx):
        return _joint_diff(a1, np.roll(np.roll(a2, dy, axis=0), dx, axis=1))

    for dy, dx in [(-4, 0), (4, 0), (0, -4), (0, 4), (4, 4), (-4, -4)]:
        assert shifted_diff(dy, dx) > aligned, (
            f"aligned pair not registered: shift ({dy},{dx}) improves "
            f"jointdiff ({shifted_diff(dy, dx):.1f} < {aligned:.1f})"
        )

    # Misaligned control: same rotation, translation off by ~0.9 m world.
    wrong = Sim2(
        R=rel.rotation,
        t=t_exact + np.array([0.45, -0.3]) * h1 / 1.5,
        s=1.0,
    )
    m1, m2 = bev_pair.render_bev_pair(d1, r1, d2, r2, wrong, "floor")
    misaligned = _joint_diff(m1, m2)

    # Aligned pairs sit near the noise floor (shading + sensor noise + JPEG);
    # misaligned pairs decorrelate on the world-anchored textures.
    assert aligned < 14.0, f"aligned pair jointdiff {aligned:.1f} too high"
    assert misaligned > 2.0 * aligned, (
        f"no aligned/misaligned separation: {aligned:.1f} vs {misaligned:.1f}"
    )
