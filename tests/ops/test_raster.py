"""Tests for the XLA polygon/polyline rasterizer (vs cv2 as oracle)."""

import cv2
import jax.numpy as jnp
import numpy as np

from salve_tpu.ops import raster


class TestPolygonMask:
    def test_square_area(self) -> None:
        verts = np.array([[10, 10], [40, 10], [40, 30], [10, 30]], dtype=np.float32)
        padded = np.zeros((8, 2), dtype=np.float32)
        padded[:4] = verts
        mask = np.asarray(raster.polygon_mask(jnp.asarray(padded), jnp.int32(4), 50, 60))
        # cv2 oracle
        oracle = np.zeros((50, 60), dtype=np.uint8)
        cv2.fillPoly(oracle, [verts.astype(np.int32)], 1)
        # cv2 includes the full boundary; our pixel-center convention differs
        # by at most the 1-px boundary band. Interiors must agree exactly.
        kernel = np.ones((3, 3), np.uint8)
        interior = cv2.erode(oracle, kernel).astype(bool)
        exterior = ~cv2.dilate(oracle, kernel).astype(bool)
        assert mask[interior].all()
        assert not mask[exterior].any()

    def test_nonconvex(self) -> None:
        # L-shape
        verts = np.array(
            [[5, 5], [25, 5], [25, 15], [15, 15], [15, 25], [5, 25]], dtype=np.float32
        )
        padded = np.zeros((10, 2), dtype=np.float32)
        padded[:6] = verts
        mask = np.asarray(raster.polygon_mask(jnp.asarray(padded), jnp.int32(6), 32, 32))
        assert mask[10, 10]  # inside the L
        assert not mask[20, 20]  # inside the notch


class TestPolylineCoverage:
    def test_thickness(self) -> None:
        verts = np.zeros((4, 2), dtype=np.float32)
        verts[0] = [5, 16]
        verts[1] = [27, 16]
        cov = np.asarray(
            raster.polyline_coverage(
                jnp.asarray(verts), jnp.int32(2), jnp.float32(8.0), 32, 32
            )
        )
        # Profile is calibrated to cv2.LINE_AA's measured radial falloff
        # (50% intensity at thickness/2 + 0.65 px, 1.25 px ramp — see
        # tests/parity/test_raster_cv2_drift.py and raster.py docstring).
        assert cov[16, 16] == 1.0  # on the line
        assert cov[12, 16] == 1.0  # at nominal half-thickness (cv2 is wider)
        np.testing.assert_allclose(cov[11, 16], (4.65 + 0.625 - 5) / 1.25, atol=1e-5)
        assert cov[10, 16] == 0.0  # past the cv2 feather
        assert cov[5, 16] == 0.0  # far away
        # Anti-aliased boundary exists
        band = cov[(cov > 0) & (cov < 1)]
        assert band.size > 0

    def test_padding_ignored(self) -> None:
        verts = np.zeros((6, 2), dtype=np.float32)
        verts[0] = [2, 2]
        verts[1] = [10, 2]
        # padded vertices all at origin region should not create segments
        cov = np.asarray(
            raster.polyline_coverage(
                jnp.asarray(verts), jnp.int32(2), jnp.float32(2.0), 16, 16
            )
        )
        assert cov[2, 5] > 0
        assert cov[14, 14] == 0.0


class TestPaint:
    def test_alpha_composite(self) -> None:
        img = jnp.zeros((4, 4, 3))
        cov = jnp.zeros((4, 4)).at[1, 1].set(0.5)
        out = np.asarray(raster.paint_rgb(img, cov, jnp.array([255.0, 0, 0])))
        assert np.allclose(out[1, 1], [127.5, 0, 0])
        assert np.allclose(out[0, 0], 0)
