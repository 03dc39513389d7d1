"""Pallas z-order splat: per-image VMEM-resident grid, scalar RMW loop.

This is the "row-binned / VMEM splat" candidate named in BENCH_NOTES for the
render bottleneck (the XLA scatter-max in ops/bev.py:splat_zorder_batched,
~4-6 ms/image). Reference semantics: per-BEV-cell keep the point with the
lexicographically largest (z_bin, point_index) priority
(salve/utils/zorder_utils.py:10).

Design
------
The whole priority grid for one 501x501 render is H*W i32 ~= 1 MB — it fits
VMEM. So instead of XLA's HBM scatter (one random HBM read-modify-write per
point), the kernel keeps the grid VMEM-resident for the duration of one
image and performs the RMW against VMEM:

  grid = (B,) programs, one per image;
  in:  cell (1,N) i32 [pre-masked: invalid -> sentinel cell], key (1,N) i32
  out: grid (1, HW_PAD) i32 priority plane

  for i in range(N):                      # scalar loop on the TPU core
      c = cell[0, i]; k = key[0, i]
      grid[0, c] = max(grid[0, c], k)

The winner gather + color lookup stay outside (identical to the XLA path),
so the kernel can be A/B'd against the scatter-max alone and the results
compared bit-for-bit.

Why a scalar loop can compete at all: the XLA scatter's per-point cost is a
random HBM round trip; here it is a VMEM access issued from the scalar
core. Whether the scalar-issue rate beats the HBM scatter is an empirical
question — this file exists to measure it honestly (results recorded in
BENCH_NOTES.md; the production path only switches if it wins on chip).

STATUS (round 2, recorded A/B outcome): NOT LOWERABLE on current Mosaic.
Correct in interpret mode, but compiled lowering rejects scalar stores to
VMEM ("Cannot store scalars to VMEM"), and the 1-element dynamic-slice
store workaround crashes the TPU compiler. The architecture has no cheap
data-dependent single-element VMEM write path — consistent with the sort-
splat and int64-fused-scatter losses (BENCH_NOTES.md). The production
splat remains the XLA scatter-max with the dedup prepass + packed winner
gather; the Sim(2) warp path (ops/pallas_warp.py) sidesteps per-hypothesis
splats entirely.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _splat_kernel(cell_ref, key_ref, grid_ref):
    """One program = one image: VMEM grid RMW over the point list."""
    n = cell_ref.shape[2]
    grid_ref[...] = jnp.full_like(grid_ref, -1)

    def body(i, carry):
        c = cell_ref[0, 0, i]
        k = key_ref[0, 0, i]
        # Mosaic cannot store SCALARS to VMEM; the RMW rides 1-element
        # dynamic slices instead (lowered as masked vector ops).
        old = grid_ref[0, 0, pl.ds(c, 1)]
        grid_ref[0, 0, pl.ds(c, 1)] = jnp.maximum(old, k)
        return carry

    jax.lax.fori_loop(0, n, body, 0)


@functools.partial(jax.jit, static_argnames=("img_h", "img_w", "interpret"))
def splat_priority_grid_pallas(
    cell: jnp.ndarray,
    key: jnp.ndarray,
    ok: jnp.ndarray,
    img_h: int,
    img_w: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Per-cell max priority via the Pallas VMEM kernel.

    Args:
        cell: (B, N) i32 per-image cell index (y*img_w + x), any value for
            invalid points.
        key: (B, N) i32 priority (z_bin * N + point_index).
        ok: (B, N) bool validity.
        img_h, img_w: grid shape.

    Returns:
        (B, img_h*img_w) i32 winner-priority grid, -1 where no point landed
        — bit-identical to the XLA scatter-max in splat_zorder_batched.
    """
    b, n = cell.shape
    hw = img_h * img_w
    hw_pad = _round_up(hw + 1, 128)  # +1: sentinel cell for invalid points

    # (B, 1, N) shapes with (1, 1, N) blocks satisfy the TPU block-shape
    # tiling rule (trailing dims equal the array dims).
    cell_m = jnp.where(ok, cell, hw_pad - 1).astype(jnp.int32)[:, None, :]
    key_m = jnp.where(ok, key, -1).astype(jnp.int32)[:, None, :]

    grid = pl.pallas_call(
        _splat_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, hw_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, 1, hw_pad), jnp.int32),
        interpret=interpret,
    )(cell_m, key_m)
    return grid[:, 0, :hw]
