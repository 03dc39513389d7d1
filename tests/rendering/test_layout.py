"""Tests for layout rasterization and BEV pair rendering orchestration."""

import numpy as np

from salve_tpu.common.wdo import WDO
from salve_tpu.geometry.sim2 import Sim2
from salve_tpu.rendering import layout
from salve_tpu.rendering.bev_pair import render_bev_pair


class TestLineWidth:
    def test_default_resolutions(self) -> None:
        # Parity values from salve/common/bevparams.py docstring.
        assert layout.get_line_width_by_resolution(0.005) == 30
        assert layout.get_line_width_by_resolution(0.02) == 8
        assert layout.get_line_width_by_resolution(1.0) == 1


class TestRasterizeSingleLayout:
    def test_room_and_wdo_colors(self) -> None:
        # 4m x 4m room (scaled by 1.5 -> 6m) centered at origin, one door
        # on the east wall.
        room = np.array([[-2.0, -2], [2, -2], [2, 2], [-2, 2]])
        door = WDO(
            global_Sim2_local=Sim2.identity(),
            pt1=(2.0, -0.5),
            pt2=(2.0, 0.5),
            bottom_z=0,
            top_z=2,
            type="doors",
        )
        img = layout.rasterize_single_layout(room, [door])
        assert img.shape == (501, 501, 3)
        # Center pixel is inside the room -> white.
        assert (img[250, 250] == 255).all()
        # Door segment at world x=2*1.5=3m -> px x=(3+5)/0.02=400, y=250.
        px = img[250, 400]
        assert px[1] > 200 and px[0] < 60 and px[2] < 60  # green
        # Far corner is empty.
        assert (img[5, 5] == 0).all()

    def test_flipud(self) -> None:
        # A room strictly in +y half-plane should appear in the TOP rows
        # after the vertical flip.
        room = np.array([[-1.0, 1.0], [1, 1], [1, 2], [-1, 2]])
        img = layout.rasterize_single_layout(room, [])
        ys, _ = np.nonzero(img[..., 0] > 0)
        assert ys.max() < 250


class TestRasterizeLayoutBatch:
    def test_batch_matches_single(self) -> None:
        """The chunked batch path must be pixel-identical to per-layout calls."""
        rooms = [
            np.array([[-2.0, -2], [2, -2], [2, 2], [-2, 2]]),
            np.array([[-1.0, 0.0], [3, 0], [3, 1.5], [-1, 1.5], [-1.0, 0.5]]),
            np.array([[0.0, 0.0], [2, 0], [1, 2]]),
        ]
        wdos = [
            [
                WDO(
                    global_Sim2_local=Sim2.identity(),
                    pt1=(2.0, -0.5),
                    pt2=(2.0, 0.5),
                    bottom_z=0,
                    top_z=2,
                    type="doors",
                )
            ],
            [
                WDO(
                    global_Sim2_local=Sim2.identity(),
                    pt1=(-1.0, 0.2),
                    pt2=(-1.0, 1.0),
                    bottom_z=0,
                    top_z=2,
                    type="windows",
                ),
                WDO(
                    global_Sim2_local=Sim2.identity(),
                    pt1=(0.5, 0.0),
                    pt2=(1.5, 0.0),
                    bottom_z=0,
                    top_z=2,
                    type="openings",
                ),
            ],
            [],
        ]
        jobs = list(zip(rooms, wdos))
        # chunk=2 forces both a full and a padded (ragged) dispatch.
        batch = layout.rasterize_layout_batch(jobs, chunk=2)
        assert batch.shape == (3, 501, 501, 3)
        for i, (rv, w) in enumerate(jobs):
            single = layout.rasterize_single_layout(rv, w)
            np.testing.assert_array_equal(batch[i], single)

    def test_empty(self) -> None:
        out = layout.rasterize_layout_batch([])
        assert out.shape == (0, 501, 501, 3)


class TestRenderBEVPairSmoke:
    def test_synthetic_pair(self) -> None:
        h, w = 64, 128
        depth = np.full((h, w), 2000, dtype=np.uint16)
        rgb = np.full((h, w, 3), 0.5, dtype=np.float32)
        from salve_tpu.rendering import bev_pair

        cfg = bev_pair.BEVRenderConfig(img_px=100, meters_per_px=0.1, crop_ratio=0.1)
        img1, img2 = render_bev_pair(
            depth, rgb, depth, rgb, Sim2.identity(), "floor", cfg
        )
        assert img1.shape == (101, 101, 3)
        assert img2.shape == (101, 101, 3)
        # identity pose + identical panos -> identical renders
        assert np.array_equal(img1, img2)
        assert img1.sum() > 0  # floor ring visible


class TestBevImgSim2World:
    def test_reference_fixture(self) -> None:
        """10m x 10m BEV at 0.5 m/px (reference test_bevparams.py::test_bevimg_Sim2_world)."""
        from salve_tpu.ops.bev import make_bevimg_Sim2_world

        R, t, s = make_bevimg_Sim2_world(img_px=20, meters_per_px=0.5)
        world_pts = np.array([[2, 2], [-5, -5], [5, 5]], dtype=float)
        img_pts = (world_pts @ R.T + t) * s
        assert np.allclose(img_pts, np.array([[14, 14], [0, 0], [20, 20]]))

    def test_line_width_intermediate_resolution(self) -> None:
        assert layout.get_line_width_by_resolution(0.01) == 15


class TestSurfaceRowWindow:
    def test_sliced_render_is_exact(self) -> None:
        """Restricting backprojection to the surface half-pano must not change
        the rendered BEV at all (excluded rows can never pass the z mask)."""
        import jax
        import jax.numpy as jnp

        from salve_tpu.ops import backproject as bp
        from salve_tpu.ops import bev as bev_ops
        from salve_tpu.rendering import bev_pair

        rng = np.random.default_rng(0)
        depths = jnp.asarray(rng.uniform(800, 4000, (2, 64, 128)).astype(np.float32))
        rgbs = jnp.asarray(rng.uniform(0, 1, (2, 64, 128, 3)).astype(np.float32))
        cfg = bev_pair.BEVRenderConfig(img_px=100)

        for z_range in [(-np.inf, -1.0), (0.5, np.inf)]:
            window = bp.surface_row_window(64, z_range, cfg.crop_ratio)
            full = (int(64 * cfg.crop_ratio), 64 - int(64 * cfg.crop_ratio))
            assert window != full  # the slice actually shrinks the cloud

            def render(win):
                f = jax.vmap(bp.backproject_depth, in_axes=(0, 0, None, None, None))
                xyz, c, v = f(depths, rgbs, z_range, cfg.crop_ratio, win)
                xy = xyz[..., :2] @ bev_pair._R_FIX.T
                xyz = jnp.concatenate([xy, xyz[..., 2:3]], axis=-1)
                return np.asarray(
                    bev_ops.render_bev_images_batched(xyz, c, v, cfg.img_px, cfg.meters_per_px, False)
                )

            np.testing.assert_array_equal(render(window), render(full))

    def test_window_bounds(self) -> None:
        from salve_tpu.ops.backproject import surface_row_window

        assert surface_row_window(512, (-np.inf, -1.0), 80 / 512) == (256, 432)
        assert surface_row_window(512, (0.5, np.inf), 80 / 512) == (80, 256)
        assert surface_row_window(512, (-2.0, 2.0), 80 / 512) == (80, 432)


class TestIdentityBankConsistency:
    def test_bank_render_equals_pair_img2(self) -> None:
        """render_identity_batched must produce exactly the img2 half of the
        pair render — the fused pipeline's bank substitutes for it."""
        import jax.numpy as jnp

        from salve_tpu.rendering import bev_pair

        rng = np.random.default_rng(3)
        B = 2
        d1 = jnp.asarray(rng.uniform(800, 4000, (B, 64, 128)).astype(np.float32))
        r1 = jnp.asarray(rng.uniform(0, 1, (B, 64, 128, 3)).astype(np.float32))
        d2 = jnp.asarray(rng.uniform(800, 4000, (B, 64, 128)).astype(np.float32))
        r2 = jnp.asarray(rng.uniform(0, 1, (B, 64, 128, 3)).astype(np.float32))
        R = jnp.asarray(np.tile(np.eye(2, dtype=np.float32), (B, 1, 1)))
        t = jnp.asarray(rng.uniform(-1, 1, (B, 2)).astype(np.float32))
        cfg = bev_pair.BEVRenderConfig(img_px=100)

        for z_range in [(-np.inf, -1.0), (0.5, np.inf)]:
            _, img2 = bev_pair._render_pairs_batched(d1, r1, d2, r2, R, t, z_range, cfg)
            bank = bev_pair.render_identity_batched(d2, r2, z_range, cfg)
            np.testing.assert_array_equal(np.asarray(bank), np.asarray(img2))

    def test_transformed_render_equals_pair_img1(self) -> None:
        import jax.numpy as jnp

        from salve_tpu.rendering import bev_pair

        rng = np.random.default_rng(4)
        B = 2
        d1 = jnp.asarray(rng.uniform(800, 4000, (B, 64, 128)).astype(np.float32))
        r1 = jnp.asarray(rng.uniform(0, 1, (B, 64, 128, 3)).astype(np.float32))
        R = jnp.asarray(np.tile(np.eye(2, dtype=np.float32), (B, 1, 1)))
        t = jnp.asarray(rng.uniform(-1, 1, (B, 2)).astype(np.float32))
        cfg = bev_pair.BEVRenderConfig(img_px=100)

        img1, _ = bev_pair._render_pairs_batched(d1, r1, d1, r1, R, t, (-np.inf, -1.0), cfg)
        moved = bev_pair.render_transformed_batched(d1, r1, R, t, (-np.inf, -1.0), cfg)
        np.testing.assert_array_equal(np.asarray(moved), np.asarray(img1))
