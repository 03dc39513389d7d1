"""Pallas 3-shear warp kernel vs the XLA shear-warp oracle (interpret mode).

The Pallas kernel (ops/pallas_warp.py) must be element-exact vs
ops/warp.py:warp_bank_sim2_shear — same shear parameters, same per-pass
rounding, different execution engine. Compiled-mode equivalence on the real
chip is exercised by _warp_profile.py / the fused pipeline A/B.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from salve_tpu.ops import warp as warp_ops
from salve_tpu.ops.pallas_warp import (
    warp_bank_sim2_shear_pallas,
    warp_bank_sim2_shear_pallas_v2,
)

KERNELS = [warp_bank_sim2_shear_pallas, warp_bank_sim2_shear_pallas_v2]


def _cases():
    return [
        (0.0, (0.0, 0.0)),
        (0.0, (0.17, -0.09)),
        (31.0, (0.17, -0.09)),
        (90.0, (0.5, -0.3)),
        (117.0, (-0.2, 0.05)),
        (205.0, (0.3, 0.1)),
        (-45.0, (0.03, 0.03)),
    ]


@pytest.mark.parametrize("kernel", KERNELS)
@pytest.mark.parametrize("theta_deg,t", _cases())
def test_pallas_shear_matches_xla_oracle(theta_deg, t, kernel):
    rng = np.random.default_rng(1)
    s_px, dst_px = 201, 100
    src = rng.integers(0, 256, (1, s_px, s_px, 3)).astype(np.uint8)
    src[:, :40] = 0  # empty region, like real renders
    packed = warp_ops.pack_rgb888(jnp.asarray(src))

    th = np.deg2rad(theta_deg)
    R = jnp.asarray(
        np.array(
            [[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]], np.float32
        )
    )[None]
    tt = jnp.asarray(np.asarray(t, np.float32))[None]

    ref = np.asarray(
        warp_ops.warp_bank_sim2_shear(packed, R, tt, dst_img_px=dst_px)
    )
    got = np.asarray(
        kernel(packed, R, tt, dst_img_px=dst_px, interpret=True)
    )
    np.testing.assert_array_equal(ref, got)


@pytest.mark.parametrize("kernel", KERNELS)
def test_pallas_shear_batched_mixed_angles(kernel):
    rng = np.random.default_rng(2)
    s_px, dst_px = 201, 100
    src = rng.integers(0, 256, (3, s_px, s_px, 3)).astype(np.uint8)
    packed = warp_ops.pack_rgb888(jnp.asarray(src))
    cases = _cases()[:3]
    R = jnp.asarray(
        np.array(
            [
                [
                    [np.cos(np.deg2rad(a)), -np.sin(np.deg2rad(a))],
                    [np.sin(np.deg2rad(a)), np.cos(np.deg2rad(a))],
                ]
                for a, _ in cases
            ],
            np.float32,
        )
    )
    t = jnp.asarray(np.array([t for _, t in cases], np.float32))
    ref = np.asarray(warp_ops.warp_bank_sim2_shear(packed, R, t, dst_img_px=dst_px))
    got = np.asarray(
        kernel(packed, R, t, dst_img_px=dst_px, interpret=True)
    )
    np.testing.assert_array_equal(ref, got)
