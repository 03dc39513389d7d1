"""Sim(2)-warp hypothesis rendering: exactness + drift vs the direct render.

ops/warp.py renders a hypothesis texture map as a nearest-neighbor rigid
warp of an extended identity render instead of re-splatting the transformed
cloud (the reference re-renders per hypothesis,
salve/utils/bev_rendering_utils.py:417). Exact cases (axis-aligned motions
on the shared grid) must match a cropped/shifted bank bit-for-bit; general
motions are measured against the direct production render on
production-realistic synthetic panos, and the drift statistics are the
recorded evidence for BENCH_NOTES.md.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from salve_tpu.common import posegraph2d
from salve_tpu.ops import warp as warp_ops
from salve_tpu.rendering import bev_pair, synthetic

ZIND = "/root/reference/tests/test_data/ZInD"
CFG = bev_pair.BEVRenderConfig()
MPP = CFG.meters_per_px


def _identity_bank(depth, rgb, z_range, bank_px):
    return np.asarray(
        warp_ops.render_identity_bank_extended(
            jnp.asarray(depth)[None], jnp.asarray(rgb)[None], z_range, CFG,
            bank_px=bank_px,
        )
    )[0]


@pytest.fixture(scope="module")
def fixture_pano(ref_test_data):
    pg = posegraph2d.get_gt_pose_graph("0000", "floor_01", ZIND)
    pid = sorted(pg.nodes)[1]
    cam_h = pg.get_camera_height_m(pid)
    pano = synthetic.synthetic_pano_for_pano_data(pg.nodes[pid], cam_h, seed=3)
    rgb = pano["rgb"].astype(np.float32) / 255.0
    depth_mm = (pano["depth"] * 1000.0).astype(np.float32)
    return depth_mm, rgb


def test_identity_warp_is_center_crop(fixture_pano):
    """R=I, t=0: the warp must be exactly the bank's center crop."""
    depth, rgb = fixture_pano
    bank = _identity_bank(depth, rgb, (-np.inf, -1.0), warp_ops.DEFAULT_WARP_BANK_PX)
    out = np.asarray(
        warp_ops.warp_bank_sim2_nn(
            jnp.asarray(bank)[None],
            jnp.eye(2, dtype=np.float32)[None],
            jnp.zeros((1, 2), dtype=np.float32),
        )
    )[0]
    off = (bank.shape[0] - out.shape[0]) // 2
    crop = bank[off : off + out.shape[0], off : off + out.shape[1]]
    np.testing.assert_array_equal(out, crop)


def test_translation_warp_is_shifted_crop(fixture_pano):
    """Grid-aligned translation: exact shifted crop (no resampling error)."""
    depth, rgb = fixture_pano
    bank = _identity_bank(depth, rgb, (-np.inf, -1.0), warp_ops.DEFAULT_WARP_BANK_PX)
    shift_px = (37, -21)  # (x, y) in pixels, grid-aligned
    t = np.array([shift_px[0] * MPP, shift_px[1] * MPP], dtype=np.float32)
    out = np.asarray(
        warp_ops.warp_bank_sim2_nn(
            jnp.asarray(bank)[None],
            jnp.eye(2, dtype=np.float32)[None],
            jnp.asarray(t)[None],
        )
    )[0]
    # target world w maps to source w - t: source pixel = target pixel - shift
    # (pre-flip). In stored (flipped) coordinates the row shift negates.
    h = out.shape[0]
    off = (bank.shape[0] - h) // 2
    crop = bank[
        off + shift_px[1] : off + shift_px[1] + h,
        off - shift_px[0] : off - shift_px[0] + h,
    ]
    np.testing.assert_array_equal(out, crop)


def test_shear_warp_axis_aligned_exact(fixture_pano):
    """90-deg multiples + grid-aligned translations: shear == gather warp,
    bit for bit (both reduce to pure index permutations)."""
    depth, rgb = fixture_pano
    bank = _identity_bank(depth, rgb, (-np.inf, -1.0), warp_ops.DEFAULT_WARP_BANK_PX)
    packed = warp_ops.pack_rgb888(jnp.asarray(bank)[None])
    for theta_deg, t in [(0.0, (0.0, 0.0)), (90.0, (0.5, -0.3)),
                         (180.0, (1.0, 1.0)), (270.0, (-0.74, 0.42))]:
        th = np.deg2rad(theta_deg)
        R = np.array(
            [[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]], np.float32
        )
        tt = np.asarray(t, np.float32)
        nn = np.asarray(
            warp_ops.warp_bank_sim2_nn(packed, jnp.asarray(R)[None], jnp.asarray(tt)[None])
        )
        sh = np.asarray(
            warp_ops.warp_bank_sim2_shear(packed, jnp.asarray(R)[None], jnp.asarray(tt)[None])
        )
        np.testing.assert_array_equal(nn, sh)


def test_shear_warp_drift_vs_direct_render(fixture_pano):
    """Shear warp vs the direct production render: one extra +-1.5 px of
    rounding on top of the gather warp's drift. Recorded for BENCH_NOTES."""
    depth, rgb = fixture_pano
    theta = np.deg2rad(31.0)
    R = np.array(
        [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]],
        dtype=np.float32,
    )
    t_unscaled = np.array([1.7, -0.9], dtype=np.float32)
    z_range = (-np.inf, -1.0)
    direct = np.asarray(
        bev_pair.render_transformed_batched(
            jnp.asarray(depth)[None], jnp.asarray(rgb)[None],
            jnp.asarray(R)[None], jnp.asarray(t_unscaled)[None],
            z_range, CFG,
        )
    )[0]
    bank = _identity_bank(depth, rgb, z_range, warp_ops.DEFAULT_WARP_BANK_PX)
    packed = warp_ops.pack_rgb888(jnp.asarray(bank)[None])
    warped = np.asarray(
        warp_ops.warp_bank_sim2_shear(
            packed,
            jnp.asarray(R)[None],
            jnp.asarray(t_unscaled * bev_pair.HOHO_S_ZIND_SCALE_FACTOR)[None],
        )
    )[0]
    occ_d, occ_w = direct.any(axis=-1), warped.any(axis=-1)
    agree = (occ_d == occ_w).mean()
    joint = occ_d & occ_w
    diff = np.abs(
        direct.astype(np.float32) - warped.astype(np.float32)
    ).mean(axis=-1)[joint]
    stats = {
        "coverage_agreement": float(agree),
        "mean_abs_diff": float(diff.mean()),
        "p99_abs_diff": float(np.percentile(diff, 99)),
        "frac_gt_10": float((diff > 10).mean()),
    }
    print("shear warp drift vs direct:", stats)
    assert agree > 0.93
    assert diff.mean() < 15.0


def test_general_motion_drift_vs_direct_render(fixture_pano):
    """General rigid motion: measure warp-vs-direct drift, assert sane bounds.

    The direct render re-splats the transformed cloud (production path,
    rendering/bev_pair.py:render_transformed_batched); the warp samples the
    extended identity bank. They quantize in different frames, so pixel
    drift concentrates at texture edges; coverage must agree almost
    everywhere and matched content must be close on average.
    """
    depth, rgb = fixture_pano
    theta = np.deg2rad(31.0)
    R = np.array(
        [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]],
        dtype=np.float32,
    )
    t_unscaled = np.array([1.7, -0.9], dtype=np.float32)

    for z_range in ((-np.inf, -1.0), (0.5, np.inf)):
        direct = np.asarray(
            bev_pair.render_transformed_batched(
                jnp.asarray(depth)[None], jnp.asarray(rgb)[None],
                jnp.asarray(R)[None], jnp.asarray(t_unscaled)[None],
                z_range, CFG,
            )
        )[0]
        bank = _identity_bank(depth, rgb, z_range, warp_ops.DEFAULT_WARP_BANK_PX)
        warped = np.asarray(
            warp_ops.warp_bank_sim2_nn(
                jnp.asarray(bank)[None],
                jnp.asarray(R)[None],
                jnp.asarray(t_unscaled * bev_pair.HOHO_S_ZIND_SCALE_FACTOR)[None],
            )
        )[0]

        occ_d = direct.any(axis=-1)
        occ_w = warped.any(axis=-1)
        agree = (occ_d == occ_w).mean()
        joint = occ_d & occ_w
        assert joint.sum() > 1000, "renders should overlap substantially"
        diff = np.abs(
            direct.astype(np.float32) - warped.astype(np.float32)
        ).mean(axis=-1)[joint]
        stats = {
            "z_range": z_range,
            "coverage_agreement": float(agree),
            "mean_abs_diff": float(diff.mean()),
            "p99_abs_diff": float(np.percentile(diff, 99)),
            "frac_gt_10": float((diff > 10).mean()),
        }
        print("warp drift:", stats)
        assert agree > 0.95
        assert diff.mean() < 12.0


def test_host_warp_bit_exact_vs_device_nn():
    """warp_bank_sim2_nn_host (the corpus renderer's host path) must be
    bit-exact vs the jitted gather-NN warp on random banks and poses."""
    rng = np.random.default_rng(11)
    b, src = 6, 257
    bank_u8 = rng.integers(0, 256, size=(b, src, src, 3), dtype=np.uint8)
    packed = np.asarray(warp_ops.pack_rgb888(jnp.asarray(bank_u8)))
    thetas = rng.uniform(-np.pi, np.pi, size=b).astype(np.float32)
    R = np.stack(
        [
            np.array(
                [[np.cos(t), -np.sin(t)], [np.sin(t), np.cos(t)]],
                dtype=np.float32,
            )
            for t in thetas
        ]
    )
    t = rng.uniform(-1.5, 1.5, size=(b, 2)).astype(np.float32)
    dev = np.asarray(
        warp_ops.warp_bank_sim2_nn(
            jnp.asarray(packed), jnp.asarray(R), jnp.asarray(t),
            dst_img_px=128, meters_per_px=MPP,
        )
    )
    host = warp_ops.warp_bank_sim2_nn_host(
        packed, R, t, dst_img_px=128, meters_per_px=MPP
    )
    # XLA's CPU lowering fuses the rotate-translate into FMAs; numpy keeps
    # separate mul+add. At exact nearest-neighbor rounding boundaries the
    # chosen source pixel can flip — measured ~1e-5 of pixels, far below
    # the JPEG quality-95 encode noise (~5/255 on EVERY pixel) the corpus
    # files carry anyway (BENCH_NOTES round-2 quality root-cause).
    mismatch = np.mean(dev != host)
    assert mismatch < 5e-5, f"host warp mismatch fraction {mismatch}"
    # The in-place full-bank gather (bank_idx form, what the corpus
    # renderer calls) must equal the per-image-slice form exactly.
    idx = np.array([2, 0, 5, 1, 1, 4])
    host_idx = warp_ops.warp_bank_sim2_nn_host(
        packed, R, t, dst_img_px=128, meters_per_px=MPP, bank_idx=idx
    )
    host_slice = warp_ops.warp_bank_sim2_nn_host(
        packed[idx], R, t, dst_img_px=128, meters_per_px=MPP
    )
    assert np.array_equal(host_idx, host_slice)
