"""Quantify BEV fill-scheme drift vs the reference's Qhull/Delaunay path.

VERDICT round-1 weak item #4: ops/bev.py replaces
scipy.interpolate.griddata(method='linear') (salve/utils/
interpolation_utils.py:46, Delaunay over sparse points) with a fixed-
iteration dilation-average fill. scipy IS available in this environment, so
the reference's exact interpolation + hallucination-mask math can run here as
an oracle — reimplemented faithfully below (box-filter mask with the
all-channels-nonzero support quirk, K=11, flipud at the end omitted since
both sides skip it).

The input clouds are production-realistic: synthetic fixture-building panos
(rendering/synthetic.py) pushed through the production backprojection +
z-order splat, at the production 500px/0.02m BEV spec.
"""

import numpy as np
import pytest
import scipy.interpolate
import scipy.ndimage

import jax.numpy as jnp

from salve_tpu.common import posegraph2d
from salve_tpu.ops import bev as bev_ops
from salve_tpu.rendering import synthetic

ZIND = "/root/reference/tests/test_data/ZInD"
BEV_PX = 501  # reference img_h + 1 convention (bev_rendering_utils.py:292)


def qhull_oracle_fill(sparse_img_u8: np.ndarray, k: int = 11) -> np.ndarray:
    """Reference-faithful fill: Delaunay-linear griddata + box-filter mask.

    Mirrors interp_dense_grid_from_sparse + remove_hallucinated_content
    (salve/utils/interpolation_utils.py:21,74) with the splatted occupied
    cells as interpolation sites.
    """
    h, w, _ = sparse_img_u8.shape
    occ_y, occ_x = np.nonzero(sparse_img_u8.any(axis=-1))
    if len(occ_x) < 4:
        return np.zeros_like(sparse_img_u8)
    pts = np.stack([occ_x, occ_y], axis=1).astype(np.float64)
    vals = sparse_img_u8[occ_y, occ_x].astype(np.float64)
    gx, gy = np.meshgrid(np.arange(w), np.arange(h))
    interp = scipy.interpolate.griddata(
        points=pts, values=vals, xi=np.stack([gx.ravel(), gy.ravel()], axis=1),
        method="linear",
    )
    interp = np.nan_to_num(interp).reshape(h, w, 3)

    # Hallucination mask: support only where ALL channels are nonzero
    # (the reference multiplies the three channels, interpolation_utils.py:95).
    support = (sparse_img_u8 > 0).all(axis=-1).astype(np.float64)
    counts = scipy.ndimage.uniform_filter(support, size=k, mode="constant") * (k * k)
    mask = counts > 0.5
    return (interp * mask[..., None]).astype(np.uint8)


@pytest.fixture(scope="module")
def splatted_rooms(ref_test_data):
    """Z-order-splatted sparse BEV images for several real fixture rooms."""
    from salve_tpu.ops.backproject import backproject_depth, surface_row_window

    pg = posegraph2d.get_gt_pose_graph("0000", "floor_01", ZIND)
    out = []
    for pid in sorted(pg.nodes)[:4]:
        cam_h = pg.get_camera_height_m(pid)
        pano = synthetic.synthetic_pano_for_pano_data(pg.nodes[pid], cam_h, seed=pid)
        rgb = jnp.asarray(pano["rgb"], dtype=jnp.float32) / 255.0
        depth = jnp.asarray(pano["depth"])
        z_range = (-np.inf, -0.5)
        row_window = surface_row_window(512, z_range, 80.0 / 512.0)
        xyz, rgb_pts, valid = backproject_depth(
            depth * 1000.0, rgb, z_range=z_range, row_window=row_window
        )
        xyzrgb = np.concatenate([np.asarray(xyz), np.asarray(rgb_pts)], axis=1)
        valid = np.asarray(valid)
        # World -> BEV pixel mapping at the production 0.02 m/px resolution.
        R, t, s = bev_ops.make_bevimg_Sim2_world(img_px=BEV_PX - 1, meters_per_px=0.02)
        xy_img = np.round(s * (xyzrgb[:, :2] @ R.T + t)).astype(np.int64)
        inb = (
            valid
            & (xy_img[:, 0] >= 0) & (xy_img[:, 0] < BEV_PX)
            & (xy_img[:, 1] >= 0) & (xy_img[:, 1] < BEV_PX)
        )
        sparse, occupied = bev_ops.splat_zorder(
            jnp.asarray(xy_img), jnp.asarray(xyzrgb[:, 2]),
            jnp.asarray(xyzrgb[:, 3:]), jnp.asarray(inb), BEV_PX, BEV_PX,
        )
        sparse_u8 = np.asarray(
            np.clip(np.asarray(sparse) * 255.0 + 0.5, 0, 255)
        ).astype(np.uint8)
        out.append((pid, sparse_u8, np.asarray(occupied)))
    return out


def test_fill_drift_vs_qhull_oracle(splatted_rooms):
    """Dilation-average fill stays close to Delaunay-linear on real rooms."""
    reports = []
    for pid, sparse_u8, occupied in splatted_rooms:
        oracle = qhull_oracle_fill(sparse_u8)

        # Production texture composition (render_bev_images_batched, XLA path):
        # dilation fill + hallucination mask + convex-hull restriction.
        filled = bev_ops.fill_holes(
            jnp.asarray(sparse_u8, dtype=jnp.float32),
            jnp.asarray(occupied),
        )
        mask = np.asarray(bev_ops.hallucination_mask(jnp.asarray(sparse_u8)))
        hull = np.asarray(bev_ops.convex_hull_mask(jnp.asarray(occupied)))
        ours = np.asarray(
            np.clip(np.asarray(filled) * (mask & hull)[..., None], 0, 255)
        ).astype(np.uint8)

        both_valid = oracle.any(axis=-1) & ours.any(axis=-1)
        either = oracle.any(axis=-1) | ours.any(axis=-1)
        diff = np.abs(
            oracle.astype(np.int32) - ours.astype(np.int32)
        ).mean(axis=-1)[both_valid]
        coverage_agreement = both_valid.sum() / max(either.sum(), 1)
        reports.append(
            dict(
                pano=pid,
                mean_abs=float(diff.mean()),
                p99_abs=float(np.percentile(diff, 99)),
                frac_gt10=float((diff > 10).mean()),
                coverage_agreement=float(coverage_agreement),
            )
        )

    print("\nfill-scheme drift vs Qhull oracle (u8 gray levels):")
    for r in reports:
        print(
            f"  pano {r['pano']}: mean|d|={r['mean_abs']:.2f} p99={r['p99_abs']:.1f} "
            f">10 frac={r['frac_gt10']:.4f} coverage agree={r['coverage_agreement']:.4f}"
        )

    # Recorded drift bounds (BENCH_NOTES.md 'Interpolation drift'): with the
    # convex-hull restriction the fill schemes agree on >=98% of coverage and
    # differ by ~2 gray levels where both are valid (measured 2026-08; bounds
    # carry headroom).
    for r in reports:
        assert r["coverage_agreement"] > 0.975, r
        assert r["mean_abs"] < 4.0, r
        assert r["frac_gt10"] < 0.08, r


def test_convex_hull_mask_basics():
    """Unit geometry checks for the D-gon hull mask."""
    occ = np.zeros((32, 32), dtype=bool)
    # Triangle support.
    occ[4, 4] = occ[4, 28] = occ[28, 4] = True
    m = np.asarray(bev_ops.convex_hull_mask(jnp.asarray(occ)))
    assert m[4, 4] and m[4, 28] and m[28, 4]
    assert m[10, 10]  # interior
    assert m[4, 16]  # on the top edge, row without direct support is bridged
    assert not m[28, 28]  # opposite the hypotenuse
    assert not m[0, 0] and not m[31, 31]

    # Empty support -> empty mask.
    m0 = np.asarray(bev_ops.convex_hull_mask(jnp.zeros((8, 8), dtype=bool)))
    assert not m0.any()

    # Batched shape handling.
    batch = np.stack([occ, np.zeros_like(occ)])
    mb = np.asarray(bev_ops.convex_hull_mask(jnp.asarray(batch)))
    assert mb.shape == (2, 32, 32)
    assert mb[0].any() and not mb[1].any()
