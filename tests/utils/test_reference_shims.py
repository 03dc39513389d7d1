"""Tests for the reference-API shim modules (interpolation/zorder)."""

import numpy as np

from salve_tpu.utils import interpolation_utils, zorder_utils


class TestZorderShim:
    def test_matches_reference_semantics(self) -> None:
        rng = np.random.default_rng(0)
        n = 400
        x = rng.integers(0, 12, n)
        y = rng.integers(0, 10, n)
        z = rng.uniform(-3, 3, n)

        valid = zorder_utils.choose_elevated_repeated_vals(x, y, z)

        # Reference oracle: slice-by-slice overwrite.
        grid = np.full((10, 12), -1, dtype=np.int64)
        zp = np.linspace(-2, 2, 5)
        idxs = np.arange(n)
        for k in range(4):
            ws = (z >= zp[k]) & (z < zp[k + 1])
            grid[y[ws], x[ws]] = idxs[ws]
        expected = np.zeros(n, dtype=bool)
        expected[grid[grid >= 0]] = True
        assert np.array_equal(valid, expected)


class TestInterpolationShim:
    def test_too_few_points_returns_input(self) -> None:
        img = np.zeros((8, 8, 3), np.uint8)
        out = interpolation_utils.interp_dense_grid_from_sparse(
            img, np.zeros((2, 2)), np.zeros((2, 3)), 8, 8, False
        )
        assert out is img

    def test_collinear_returns_input(self) -> None:
        img = np.zeros((8, 8, 3), np.uint8)
        pts = np.array([[1.0, 0], [1.0, 2], [1.0, 4], [1.0, 6]])
        out = interpolation_utils.interp_dense_grid_from_sparse(
            img, pts, np.ones((4, 3)), 8, 8, False
        )
        assert out is img

    def test_fills_dense_grid(self) -> None:
        img = np.zeros((16, 16, 3), np.uint8)
        pts = np.array([[2.0, 2], [12, 2], [2, 12], [12, 12]])
        vals = np.full((4, 3), 200.0)
        out = interpolation_utils.interp_dense_grid_from_sparse(
            img, pts, vals, 16, 16, False
        )
        assert out[2, 2].max() >= 199
        # Filled beyond the sample points (dilation reach = 6 px).
        assert out[2, 6].max() > 0

    def test_remove_hallucinated_content(self) -> None:
        sparse = np.zeros((32, 32, 3), np.uint8)
        sparse[16, 16] = [10, 10, 10]
        interp = np.full((32, 32, 3), 99, np.uint8)
        out = interpolation_utils.remove_hallucinated_content(sparse, interp)
        assert (out[16, 16] == 99).all()
        assert (out[0, 0] == 0).all()
        assert (out[16, 21] == 99).all()  # within 11x11 support window
        assert (out[16, 22] == 0).all()
