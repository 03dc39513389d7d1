"""Tests for BEV splat / interpolation / masking kernels.

The z-order oracle below reimplements the reference algorithm
(salve/utils/zorder_utils.py:10) directly in numpy, so parity is asserted
against reference semantics without importing reference code.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from salve_tpu.ops import bev as bev_ops


def _zorder_oracle(x, y, z, img_h, img_w, zmin=-2.0, zmax=2.0, num_slices=4):
    """Reference semantics: fill grid slice-by-slice bottom-to-top; later
    indices overwrite earlier within a slice; higher slices overwrite lower."""
    grid = np.full((img_h, img_w), -1, dtype=np.int64)
    z_planes = np.linspace(zmin, zmax, num_slices + 1)
    idxs = np.arange(x.shape[0])
    for k in range(num_slices):
        ws = (z >= z_planes[k]) & (z < z_planes[k + 1])
        grid[y[ws], x[ws]] = idxs[ws]
    return grid


class TestSplatZorder:
    def test_matches_reference_oracle(self) -> None:
        rng = np.random.default_rng(0)
        n, h, w = 500, 16, 16
        x = rng.integers(0, w, n)
        y = rng.integers(0, h, n)
        z = rng.uniform(-3, 3, n)  # includes out-of-range z
        rgb = rng.uniform(0, 1, (n, 3)).astype(np.float32)

        sparse, occ = bev_ops.splat_zorder(
            jnp.asarray(np.stack([x, y], 1).astype(np.int32)),
            jnp.asarray(z.astype(np.float32)),
            jnp.asarray(rgb),
            jnp.ones(n, dtype=bool),
            h,
            w,
        )
        sparse, occ = np.asarray(sparse), np.asarray(occ)

        oracle = _zorder_oracle(x, y, z, h, w)
        assert np.array_equal(occ, oracle >= 0)
        filled = oracle >= 0
        assert np.allclose(sparse[filled], rgb[oracle[filled]])
        assert np.all(sparse[~filled] == 0)

    def test_invalid_points_dropped(self) -> None:
        xy = jnp.array([[2, 3], [2, 3]], dtype=jnp.int32)
        z = jnp.array([0.0, 0.5])
        rgb = jnp.array([[1.0, 0, 0], [0, 1.0, 0]])
        valid = jnp.array([True, False])
        sparse, occ = bev_ops.splat_zorder(xy, z, rgb, valid, 8, 8)
        assert np.asarray(occ)[3, 2]
        # The higher-z point is invalid, so the lower one wins.
        assert np.allclose(np.asarray(sparse)[3, 2], [1.0, 0, 0])

    def test_out_of_bounds_dropped(self) -> None:
        xy = jnp.array([[-1, 0], [9, 0], [0, 9]], dtype=jnp.int32)
        z = jnp.zeros(3)
        rgb = jnp.ones((3, 3))
        sparse, occ = bev_ops.splat_zorder(xy, z, rgb, jnp.ones(3, bool), 8, 8)
        assert not np.asarray(occ).any()


class TestFillHoles:
    def test_fills_adjacent_holes(self) -> None:
        h = w = 11
        sparse = np.zeros((h, w, 3), dtype=np.float32)
        occ = np.zeros((h, w), dtype=bool)
        sparse[5, 5] = [0.6, 0.3, 0.9]
        occ[5, 5] = True
        out = np.asarray(bev_ops.fill_holes(jnp.asarray(sparse), jnp.asarray(occ)))
        # Original kept, neighbors filled with the only available color.
        assert np.allclose(out[5, 5], [0.6, 0.3, 0.9])
        assert np.allclose(out[5, 6], [0.6, 0.3, 0.9])
        assert np.allclose(out[2, 2], [0.6, 0.3, 0.9])  # within 6 iterations

    def test_blends_two_sources(self) -> None:
        h = w = 9
        sparse = np.zeros((h, w, 3), dtype=np.float32)
        occ = np.zeros((h, w), dtype=bool)
        sparse[4, 3] = [1.0, 0, 0]
        sparse[4, 5] = [0, 1.0, 0]
        occ[4, 3] = occ[4, 5] = True
        out = np.asarray(bev_ops.fill_holes(jnp.asarray(sparse), jnp.asarray(occ)))
        mid = out[4, 4]
        assert mid[0] > 0.2 and mid[1] > 0.2  # blended from both


class TestHallucinationMask:
    def test_masks_far_cells(self) -> None:
        h = w = 41
        sparse_u8 = np.zeros((h, w, 3), dtype=np.uint8)
        sparse_u8[20, 20] = [10, 20, 30]
        mask = np.asarray(bev_ops.hallucination_mask(jnp.asarray(sparse_u8), k=11))
        assert mask[20, 20]
        assert mask[20, 25]  # within radius 5
        assert not mask[20, 26]  # outside the 11x11 support window
        assert not mask[0, 0]

    def test_zero_channel_not_support(self) -> None:
        """Parity quirk: a pixel with any zero channel is not support."""
        sparse_u8 = np.zeros((15, 15, 3), dtype=np.uint8)
        sparse_u8[7, 7] = [255, 0, 255]
        mask = np.asarray(bev_ops.hallucination_mask(jnp.asarray(sparse_u8), k=11))
        assert not mask.any()


class TestRenderBEVImage:
    def test_known_point_position(self) -> None:
        # One point at world (1.0, 2.0) -> pixel x=(1+5)/0.02=300, y=350,
        # then flipud: row = 500-350=150.
        xyz = jnp.array([[1.0, 2.0, 0.0]])
        rgb = jnp.array([[1.0, 1.0, 1.0]])
        img = np.asarray(
            bev_ops.render_bev_image(xyz, rgb, jnp.array([True]), 500, 0.02)
        )
        assert img.shape == (501, 501, 3)
        assert img[150, 300].min() > 200

    def test_empty_cloud_black(self) -> None:
        xyz = jnp.zeros((4, 3))
        rgb = jnp.ones((4, 3))
        img = np.asarray(
            bev_ops.render_bev_image(xyz, rgb, jnp.zeros(4, bool), 500, 0.02)
        )
        assert img.sum() == 0


def test_splat_quantize_u8_same_winners_exact_u8_colors():
    """The packed-rgb888 gather must pick identical winners, and for
    u8-derived colors (the production case: rgb255 = (u8/255)*255) its
    colors must round-trip bit-exactly."""
    rng = np.random.default_rng(3)
    B, N, H, W = 2, 2000, 24, 24
    xy = np.stack(
        [rng.integers(0, W, (B, N)), rng.integers(0, H, (B, N))], -1
    ).astype(np.int32)
    z = rng.uniform(-3, 3, (B, N)).astype(np.float32)  # incl. out-of-range
    u8 = rng.integers(0, 256, (B, N, 3)).astype(np.uint8)
    rgb255 = (u8.astype(np.float32) / 255.0) * 255.0  # production scaling
    valid = rng.uniform(size=(B, N)) < 0.9

    base_sparse, base_occ = bev_ops.splat_zorder_batched(
        jnp.asarray(xy), jnp.asarray(z), jnp.asarray(rgb255),
        jnp.asarray(valid), H, W,
    )
    q_sparse, q_occ = bev_ops.splat_zorder_batched(
        jnp.asarray(xy), jnp.asarray(z), jnp.asarray(rgb255),
        jnp.asarray(valid), H, W, quantize_u8=True,
    )
    assert np.array_equal(np.asarray(base_occ), np.asarray(q_occ))
    # Same winner, exact u8 color recovery.
    base_u8 = np.clip(np.round(np.asarray(base_sparse)), 0, 255).astype(np.uint8)
    q_np = np.asarray(q_sparse)
    assert np.array_equal(q_np, np.round(q_np))  # integer-valued floats
    assert np.array_equal(q_np.astype(np.uint8), base_u8)


def test_splat_dedup_prepass_is_bit_exact():
    """Dominated-point dropping must not change the splat output at all."""
    import numpy as np

    from salve_tpu.ops import bev as bev_ops

    rng = np.random.default_rng(7)
    B, rows, W = 2, 24, 32  # stride = W: i vs i+W is the same pano column
    N = rows * W
    # Radially-duplicated structure: consecutive rows often share a cell.
    x = rng.integers(0, 40, (B, N)).astype(np.int32)
    y = rng.integers(0, 40, (B, N)).astype(np.int32)
    # Force heavy same-column duplication for half the columns.
    x = x.reshape(B, rows, W)
    y = y.reshape(B, rows, W)
    x[:, 1::2, : W // 2] = x[:, 0:-1:2, : W // 2]
    y[:, 1::2, : W // 2] = y[:, 0:-1:2, : W // 2]
    xy = np.stack([x.reshape(B, N), y.reshape(B, N)], -1)
    z = rng.uniform(-1.9, 1.9, (B, N)).astype(np.float32)
    rgb = rng.uniform(0, 1, (B, N, 3)).astype(np.float32)
    valid = rng.uniform(size=(B, N)) < 0.9

    base = bev_ops.splat_zorder_batched(
        jnp.asarray(xy), jnp.asarray(z), jnp.asarray(rgb), jnp.asarray(valid), 40, 40
    )
    dedup = bev_ops.splat_zorder_batched(
        jnp.asarray(xy), jnp.asarray(z), jnp.asarray(rgb), jnp.asarray(valid), 40, 40,
        dedup_stride=W,
    )
    assert np.array_equal(np.asarray(base[0]), np.asarray(dedup[0]))
    assert np.array_equal(np.asarray(base[1]), np.asarray(dedup[1]))
