"""Synthetic pano raycaster: geometric ground-truth checks."""

import numpy as np
import pytest

from salve_tpu.rendering import synthetic


SQUARE = np.array([[-2.0, -2.0], [2.0, -2.0], [2.0, 2.0], [-2.0, 2.0]])


def test_raycast_square_room_geometry():
    cam_h, ceil_h = 1.5, 3.0
    cast = synthetic.raycast_layout(SQUARE, cam_h, ceil_h, h=128, w=256)
    depth, surface = cast["depth"], cast["surface"]

    # Nadir ray (bottom row) looks straight down: depth ~ camera height.
    assert np.isclose(depth[-1, 0], cam_h, atol=0.02)
    assert surface[-1, 0] == synthetic.FLOOR
    # Zenith ray: ceiling at ceil_h - cam_h.
    assert np.isclose(depth[0, 0], ceil_h - cam_h, atol=0.02)
    assert surface[0, 0] == synthetic.CEILING
    # Horizon row: wall hit, horizontal distance between 2 (axis) and 2*sqrt(2).
    mid = depth.shape[0] // 2
    assert surface[mid].min() == synthetic.WALL == surface[mid].max()
    assert depth[mid].min() >= 2.0 - 0.05
    assert depth[mid].max() <= 2 * np.sqrt(2) + 0.05

    # Hit points lie inside the room prism.
    xyz = cast["hit_xyz"]
    assert xyz[..., 2].min() >= -cam_h - 1e-3
    assert xyz[..., 2].max() <= ceil_h - cam_h + 1e-3
    assert np.abs(xyz[..., 0]).max() <= 2.0 + 1e-3
    assert np.abs(xyz[..., 1]).max() <= 2.0 + 1e-3


def test_raycast_matches_depth_net_synthesizer():
    """models.depth_net.synthesize_depth_from_layout and raycast_layout agree."""
    from salve_tpu.models.depth_net import synthesize_depth_from_layout

    cam_h, ceil_h = 1.2, 2.9
    ring = np.array([[-1.5, -2.0], [2.5, -2.0], [2.5, 1.0], [0.5, 1.0], [0.5, 2.2], [-1.5, 2.2]])
    a = synthetic.raycast_layout(ring, cam_h, ceil_h, h=64, w=128)["depth"]
    b = synthesize_depth_from_layout(ring, cam_h, ceil_h, h=64, w=128)
    assert np.allclose(a, b, atol=1e-4)


def test_render_synthetic_pano_texture_and_determinism():
    out1 = synthetic.render_synthetic_pano(SQUARE, 1.5, seed=7, h=64, w=128)
    out2 = synthetic.render_synthetic_pano(SQUARE, 1.5, seed=7, h=64, w=128)
    out3 = synthetic.render_synthetic_pano(SQUARE, 1.5, seed=8, h=64, w=128)
    assert out1["rgb"].dtype == np.uint8 and out1["rgb"].shape == (64, 128, 3)
    assert np.array_equal(out1["rgb"], out2["rgb"])
    assert not np.array_equal(out1["rgb"], out3["rgb"])
    # Textures must carry signal (not a constant image).
    assert out1["rgb"].std() > 10


def test_synthetic_pano_bev_consistency():
    """Backprojecting the synthetic depth must reproduce the room footprint."""
    cam_h = 1.4
    out = synthetic.render_synthetic_pano(SQUARE, cam_h, h=128, w=256, seed=0)
    xyz = out["hit_xyz"]
    floor = out["surface"] == synthetic.FLOOR
    # All floor hits lie within the polygon bounds; their z is the floor plane.
    assert np.abs(xyz[floor][:, :2]).max() <= 2.0 + 1e-3
    assert np.allclose(xyz[floor][:, 2], -cam_h, atol=1e-3)


def test_synthetic_pano_for_pano_data_scales_layout(ref_test_data):
    """Ego-normalized fixture layouts are scaled to metric by camera height."""
    from salve_tpu.common import posegraph2d

    pg = posegraph2d.get_gt_pose_graph("0000", "floor_01", str(ref_test_data / "ZInD"))
    pid = sorted(pg.nodes)[0]
    cam_h = pg.get_camera_height_m(pid)
    out = synthetic.synthetic_pano_for_pano_data(pg.nodes[pid], cam_h)
    assert out["rgb"].shape == (512, 1024, 3)
    # Nadir depth equals the metric camera height.
    assert np.isclose(out["depth"][-1, 0], cam_h, atol=0.02)


def test_floor_world_rays_pass_through_door_portals():
    """Rays through a door portal reach the neighboring room's floor;
    windowless walls block. This is what gives cross-room pano pairs
    shared visible content (the verifier's signal)."""
    room_a = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 3.0], [0.0, 3.0]])
    room_b = np.array([[4.0, 0.0], [8.0, 0.0], [8.0, 3.0], [4.0, 3.0]])
    world = synthetic.FloorWorld(
        rooms=[room_a, room_b],
        seg_a=np.concatenate([room_a, room_b]),
        seg_b=np.concatenate([np.roll(room_a, -1, 0), np.roll(room_b, -1, 0)]),
        portals=[[] for _ in range(8)],
    )
    # Door on the shared wall x=4, y in [1.2, 2.2], z in [0, 2.05]:
    # segment 1 of room A is (4,0)->(4,3); segment 7 of room B is (4,3)->(4,0).
    world.portals[1] = [(1.2, 2.2, 0.0, 2.05)]
    world.portals[7] = [(0.8, 1.8, 0.0, 2.05)]  # same span, arc from (4,3)

    cam = np.array([1.0, 1.7])
    cast = synthetic.raycast_floor_world(world, cam, 1.5, 3.0, np.eye(2), h=128, w=256)
    xyz = cast["hit_xyz"]
    wxy = xyz[..., :2] + cam
    floor = cast["surface"] == synthetic.FLOOR
    # Some floor hits lie in room B (through the door).
    in_b = floor & (wxy[..., 0] > 4.05)
    assert in_b.sum() > 20, f"no floor seen through the door ({in_b.sum()})"
    # No floor hit beyond room B's far wall, and none outside the union in y.
    assert wxy[floor][:, 0].max() <= 8.0 + 1e-6
    assert wxy[floor][:, 1].min() >= -1e-6 and wxy[floor][:, 1].max() <= 3.0 + 1e-6
    # Through-door hits only within the door's y-span (rays fan from the
    # camera through the portal).
    assert wxy[in_b][:, 1].min() >= 0.0  # inside room B
    # Walls block above the door top: a ray aimed at the shared wall near
    # the ceiling must hit the WALL at x=4, not pass through.
    wall = cast["surface"] == synthetic.WALL
    wall_x = wxy[wall][:, 0]
    assert (np.abs(wall_x - 4.0) < 1e-3).any(), "shared wall never hit above the door"


def test_floor_world_matches_single_room_where_no_portals():
    """With no portals, the world raycast of one room equals raycast_layout."""
    ring_world = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 3.0], [0.0, 3.0]])
    cam = np.array([1.5, 1.2])
    world = synthetic.FloorWorld(
        rooms=[ring_world],
        seg_a=ring_world,
        seg_b=np.roll(ring_world, -1, 0),
        portals=[[] for _ in range(4)],
    )
    cast_w = synthetic.raycast_floor_world(world, cam, 1.4, 2.9, np.eye(2), h=64, w=128)
    cast_s = synthetic.raycast_layout(ring_world - cam, 1.4, 2.9, h=64, w=128)
    assert np.allclose(cast_w["depth"], cast_s["depth"], atol=1e-4)
    assert np.array_equal(cast_w["surface"], cast_s["surface"])


def test_world_anchored_textures_agree_across_viewpoints():
    """Two cameras in one room render the same color for the same world point.

    This is the verifier's training signal: GT-aligned pano pairs must look
    texture-consistent in their BEV overlap (per-pano texture worlds would
    make even correct alignments look wrong).
    """
    room_world = np.array([[-3.0, -2.0], [3.0, -2.0], [3.0, 2.0], [-3.0, 2.0]])
    cam_h = 1.5

    views = []
    for cam_xy, theta_deg in (((-1.0, 0.0), 0.0), ((1.2, 0.5), 140.0)):
        th = np.deg2rad(theta_deg)
        R_wc = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
        verts_cam = (room_world - np.array(cam_xy)) @ R_wc  # world -> cam
        out = synthetic.render_synthetic_pano(
            verts_cam, cam_h, h=128, w=256, seed=42,
            world_R=R_wc, world_t=np.array(cam_xy),
        )
        wxy = out["hit_xyz"][..., :2] @ R_wc.T + np.array(cam_xy)
        views.append((out, wxy))

    (out_a, wxy_a), (out_b, wxy_b) = views
    floor_a = out_a["surface"] == synthetic.FLOOR
    floor_b = out_b["surface"] == synthetic.FLOOR

    rng = np.random.default_rng(0)
    checked = 0
    flat_a = wxy_a[floor_a]
    col_a = out_a["rgb"][floor_a].astype(np.float64)
    flat_b = wxy_b[floor_b]
    col_b = out_b["rgb"][floor_b].astype(np.float64)
    for _ in range(400):
        k = rng.integers(0, len(flat_a))
        p = flat_a[k]
        # Skip points near checker/plank boundaries (quantization flips):
        # checker cells are 0.5 m in BOTH axes, planks 0.12 m in y.
        fc = (p / 0.5) % 1.0
        fp = (p[1] / 0.12) % 1.0
        if (
            min(fc[0], 1 - fc[0]) < 0.1
            or min(fc[1], 1 - fc[1]) < 0.1
            or min(fp, 1 - fp) < 0.15
        ):
            continue
        # Likewise skip the rug edges and in-rug stripe boundaries (the 2 m
        # hashed rug cells are inset by RUG_MARGIN_M; stripes every 0.2 m).
        fr = (p / synthetic.RUG_CELL_M) % 1.0
        margin_frac = synthetic.RUG_MARGIN_M / synthetic.RUG_CELL_M
        if any(abs(f - margin_frac) < 0.04 or abs(f - (1 - margin_frac)) < 0.04 for f in fr):
            continue
        maybe_in_rug = all(margin_frac < f < 1 - margin_frac for f in fr)
        fs = ((p[0] + p[1]) / 0.2) % 1.0
        if maybe_in_rug and min(fs, 1 - fs) < 0.25:
            continue
        # ... and the 0.3 m speckle-cell boundaries (same quantization
        # story as the checker).
        fsp = (p / synthetic.SPECKLE_CELL_M) % 1.0
        if min(fsp[0], 1 - fsp[0]) < 0.12 or min(fsp[1], 1 - fsp[1]) < 0.12:
            continue
        d = np.linalg.norm(flat_b - p, axis=1)
        j = np.argmin(d)
        if d[j] > 0.05:
            continue
        # Undo per-view distance shading before comparing base colors.
        da = out_a["depth"][floor_a][k]
        db = out_b["depth"][floor_b][j]
        ca = col_a[k] * (1.0 + 0.035 * da)
        cb = col_b[j] * (1.0 + 0.035 * db)
        assert np.abs(ca - cb).max() < 25, (p, ca, cb)
        checked += 1
    assert checked >= 20, f"only {checked} comparable world points found"


def test_door_mats_world_anchored_and_endpoint_invariant():
    """v12 doormats: present when door_rects given, identical under endpoint
    swap (coincident door copies from two rooms paint the same mat), and
    world-anchored (two viewpoints agree on mat pixels)."""
    room = np.array([[0.0, 0.0], [5.0, 0.0], [5.0, 4.0], [0.0, 4.0]])
    world = synthetic.FloorWorld(
        rooms=[room], seg_a=room, seg_b=np.roll(room, -1, 0),
        portals=[[] for _ in range(4)],
    )
    door = (np.array([2.0, 0.0]), np.array([2.9, 0.0]))
    cam = np.array([2.5, 2.0])
    base = synthetic.render_synthetic_pano_world(
        world, cam, 1.5, 3.0, h=128, w=256, seed=5
    )
    with_m = synthetic.render_synthetic_pano_world(
        world, cam, 1.5, 3.0, h=128, w=256, seed=5, door_rects=[door]
    )
    swapped = synthetic.render_synthetic_pano_world(
        world, cam, 1.5, 3.0, h=128, w=256, seed=5,
        door_rects=[(door[1], door[0])],
    )
    floor = base["surface"] == synthetic.FLOOR
    n_diff = (
        (with_m["rgb"][floor] != base["rgb"][floor]).any(axis=-1).sum()
    )
    assert n_diff > 50, f"doormat changed only {n_diff} floor pixels"
    assert np.array_equal(with_m["rgb"], swapped["rgb"]), (
        "mat depends on door endpoint order — coincident copies would clash"
    )

    # Second viewpoint: same world points (on the mat) get the same color.
    cam2 = np.array([1.0, 1.0])
    v2 = synthetic.render_synthetic_pano_world(
        world, cam2, 1.5, 3.0, h=128, w=256, seed=5, door_rects=[door]
    )
    # Compare the mat-region mean colors: sample world points near the door
    # on the floor in both renders.
    def mat_px(out, cam_xy):
        wxy = out["hit_xyz"][..., :2] + cam_xy
        on = (
            (out["surface"] == synthetic.FLOOR)
            & (np.abs(wxy[..., 0] - 2.45) < 0.3)
            & (wxy[..., 1] > 0.1) & (wxy[..., 1] < 0.45)
        )
        return out["rgb"][on].astype(float).mean(axis=0)
    c1, c2 = mat_px(with_m, cam), mat_px(v2, cam2)
    assert np.abs(c1 - c2).max() < 25, f"mat colors disagree across views: {c1} vs {c2}"
