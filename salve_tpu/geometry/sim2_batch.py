"""Batched Sim(2) operations as jit/vmap-friendly JAX functions.

A batch of Sim(2) elements is represented as a tuple of stacked arrays
``(R, t, s)`` with shapes ``(..., 2, 2)``, ``(..., 2)``, ``(...,)``.
All functions broadcast over leading batch dimensions, so they compose
with ``jax.vmap``/``jax.jit`` and run on the VPU without host round-trips.

Conventions match `salve_tpu.geometry.sim2.Sim2` (and the reference
salve/common/sim2.py): point action p_out = s * (R p + t).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Sim2Params = Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]

# 2x2 matmuls are VPU work; keep them exact (TPU default precision is bf16).
_HP = jax.lax.Precision.HIGHEST


def identity(batch_shape: Tuple[int, ...] = ()) -> Sim2Params:
    """Identity Sim(2) broadcast to a batch shape."""
    R = jnp.broadcast_to(jnp.eye(2), batch_shape + (2, 2))
    t = jnp.zeros(batch_shape + (2,))
    s = jnp.ones(batch_shape)
    return R, t, s


def compose(a: Sim2Params, b: Sim2Params) -> Sim2Params:
    """Group composition a∘b (matches 3x3 matrix product of the block forms)."""
    Ra, ta, sa = a
    Rb, tb, sb = b
    R = jnp.matmul(Ra, Rb, precision=_HP)
    t = jnp.einsum("...ij,...j->...i", Ra, tb, precision=_HP) + ta / sb[..., None]
    s = sa * sb
    return R, t, s


def inverse(a: Sim2Params) -> Sim2Params:
    Ra, ta, sa = a
    Rt = jnp.swapaxes(Ra, -1, -2)
    t = -jnp.einsum("...ij,...j->...i", Rt, sa[..., None] * ta, precision=_HP)
    return Rt, t, 1.0 / sa


def transform(a: Sim2Params, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply Sim(2) batch to points (..., N, 2): p_out = s*(R p + t)."""
    Ra, ta, sa = a
    out = jnp.einsum("...ij,...nj->...ni", Ra, pts, precision=_HP) + ta[..., None, :]
    return out * sa[..., None, None]


def theta_deg(a: Sim2Params) -> jnp.ndarray:
    """Rotation angle in degrees from the (cos, sin) in R's first column."""
    Ra = a[0]
    return jnp.rad2deg(jnp.arctan2(Ra[..., 1, 0], Ra[..., 0, 0]))


def from_theta(theta_rad: jnp.ndarray, t: jnp.ndarray, s: jnp.ndarray) -> Sim2Params:
    c, sn = jnp.cos(theta_rad), jnp.sin(theta_rad)
    R = jnp.stack(
        [jnp.stack([c, -sn], axis=-1), jnp.stack([sn, c], axis=-1)], axis=-2
    )
    return R, t, s


def wrap_angle_deg(angle1: jnp.ndarray, angle2: jnp.ndarray) -> jnp.ndarray:
    """Minimum angular difference (degrees), elementwise."""
    diff = (angle2 - angle1 + 180.0) % 360.0 - 180.0
    diff = jnp.where(diff < -180.0, diff + 360.0, diff)
    return jnp.abs(diff)


def almost_equal(
    a: Sim2Params,
    b: Sim2Params,
    trans_atol: jnp.ndarray,
    scale_atol: jnp.ndarray,
    angle_atol_deg: jnp.ndarray,
) -> jnp.ndarray:
    """Elementwise tolerance-equality of two Sim(2) batches.

    Mirrors the reference's obj_almost_equal (salve/utils/wdo_alignment.py:418):
    translation via per-component atol, scale via atol, angle via wrapped diff.
    """
    _, ta, sa = a
    _, tb, sb = b
    trans_ok = jnp.all(jnp.abs(ta - tb) <= trans_atol, axis=-1)
    scale_ok = jnp.abs(sa - sb) <= scale_atol
    angle_ok = wrap_angle_deg(theta_deg(a), theta_deg(b)) <= angle_atol_deg
    return trans_ok & scale_ok & angle_ok
