"""Pallas 3-shear Sim(2) NN warp: VMEM-resident shear passes.

The XLA shear warp (ops/warp.py:warp_bank_sim2_shear) validates the
algorithm but loses on chip to the per-cell gather (pads + generic gather
lowering + HBM transposes). This kernel runs the identical pass structure
inside VMEM, where each pass is what the hardware actually likes:

  pass 1   per-row dynamic lane roll of the staged source (+ zero masking)
  T        128x128 tile transposes between passes (VMEM-resident)
  pass 2/3 per-row dynamic lane rolls with in-range-by-construction starts

One grid step per image; the packed-rgb888 source plane (~4 MB) is DMA'd
HBM->VMEM once, every intermediate lives in VMEM scratch, and the only HBM
writes are the final (D, D) output plane. The per-row work is a handful of
vector ops, so the kernel is VMEM-bandwidth-bound instead of
HBM-random-access-bound like the gather.

Semantics: identical shear factorization as warp_bank_sim2_shear — the
same (n, a, s, b2) parameters, the same per-pass NN rounding — asserted
element-exact against it in tests/ops/test_pallas_warp.py. The final
rot90^n grid permutation and u8 unpack stay outside (cheap XLA ops).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from salve_tpu.ops import bev as bev_ops
from salve_tpu.ops.warp import (
    _TAN22,
    _SIN45,
    _q_center_correction,
    _shear_params,
)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _next_pow2(x: int) -> int:
    return 1 << (x - 1).bit_length()


def _dims(d: int, s: int):
    """Static pass extents for a (S,S) source and (D,D) target.

    Lane counts of every buffer whose rows get DYNAMICALLY rolled are
    forced to powers of two: Mosaic's dynamic lane-rotate silently
    produces wrong data at non-power-of-two widths (measured: 768 and 896
    corrupt, 1024 exact — the bug that originally broke pass 3).
    """
    x3 = d + int(np.ceil(_TAN22 * (d - 1)))
    y2 = d + int(np.ceil(_SIN45 * (x3 - 1)))
    lanes_a = _next_pow2(_round_up(max(s, y2), 128))  # A cols (rolled)
    rows_a = _round_up(max(s, x3, y2), 128)
    lanes_b = _next_pow2(_round_up(x3, 128))  # B cols / C cols (rolled)
    d_pad = _round_up(d, 128)
    return x3, y2, rows_a, lanes_a, lanes_b, d_pad


def _warp_kernel_factory(d, s, x3, y2, rows_a, lanes_a, lanes_b, d_pad):
    tile = 128

    def kernel(misc_ref, s1_ref, s2_ref, s3_ref, bank_ref, out_ref, a_ref, b_ref, c_ref, sem):
        row0 = misc_ref[0, 0, 0]

        # Stage the source plane into A (one DMA; cols beyond S are masked
        # by the lane-validity test in pass 1, rows by row_ok). The bank
        # stays in HBM (whole-array block), sliced by
        # program id.
        s_rp, s_cp = _round_up(s, 8), _round_up(s, 128)
        dma = pltpu.make_async_copy(
            bank_ref.at[pl.program_id(0)], a_ref.at[:s_rp, :s_cp], sem
        )
        dma.start()
        dma.wait()

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, lanes_a), 1)

        # Pass 1: I1[y2_arr, :x3] = srcp_row(row0 + y2_arr) sliced at s1.
        def p1(y2_arr, _):
            r = row0 + y2_arr
            row_ok = (r >= 0) & (r < s)
            r_c = jnp.clip(r, 0, s - 1)
            start = s1_ref[0, 0, y2_arr]
            row = a_ref[pl.ds(r_c, 1), :]
            rolled = pltpu.roll(row, -start, 1)
            valid = row_ok & (lane + start >= 0) & (lane + start < s)
            b_ref[pl.ds(y2_arr, 1), :] = jnp.where(
                valid, rolled, 0
            )[:, :lanes_b]
            return _

        jax.lax.fori_loop(0, y2, p1, 0)

        # Zero I1 pad rows (their lanes become I1T cols read by pass 2's
        # roll window only beyond meaningful spans, but keep them clean).
        def pz(y2_arr, _):
            b_ref[pl.ds(y2_arr, 1), :] = jnp.zeros((1, lanes_b), jnp.int32)
            return _

        jax.lax.fori_loop(y2, rows_a, pz, 0)

        # Transpose B (rows_a x lanes_b) -> A (lanes_b x rows_a).
        def t1(i, _):
            tr = i // (lanes_b // tile)
            tc = i % (lanes_b // tile)
            blk = b_ref[pl.ds(tr * tile, tile), pl.ds(tc * tile, tile)]
            a_ref[pl.ds(tc * tile, tile), pl.ds(tr * tile, tile)] = blk.T
            return _

        jax.lax.fori_loop(0, (rows_a // tile) * (lanes_b // tile), t1, 0)

        # Pass 2: I2T[x3_arr, :d] = I1T row sliced at s2 (in range by
        # construction: s2 + d <= y2 <= lanes_a, no wraparound, no mask).
        def p2(x3_arr, _):
            start = s2_ref[0, 0, x3_arr]
            row = a_ref[pl.ds(x3_arr, 1), :]
            rolled = pltpu.roll(row, -start, 1)
            b_ref[pl.ds(x3_arr, 1), :d_pad] = rolled[:, :d_pad]
            return _

        jax.lax.fori_loop(0, x3, p2, 0)

        def pz2(x3_arr, _):
            b_ref[pl.ds(x3_arr, 1), :d_pad] = jnp.zeros((1, d_pad), jnp.int32)
            return _

        jax.lax.fori_loop(x3, lanes_b, pz2, 0)

        # Transpose B[:lanes_b, :d_pad] (I2T) -> C (d_pad x lanes_b) = I2.
        def t2(i, _):
            tr = i // (d_pad // tile)
            tc = i % (d_pad // tile)
            blk = b_ref[pl.ds(tr * tile, tile), pl.ds(tc * tile, tile)]
            c_ref[pl.ds(tc * tile, tile), pl.ds(tr * tile, tile)] = blk.T
            return _

        jax.lax.fori_loop(0, (lanes_b // tile) * (d_pad // tile), t2, 0)

        # Pass 3: T1[v, :d] = I2 row sliced at s3 (in range, no wrap).
        # In-place within C: each iteration reads its own full row, rolls,
        # and rewrites the row's first d_pad lanes — no cross-row or
        # cross-buffer aliasing (a sliced roll written straight into the
        # narrower out block miscompiled on current Mosaic; verified by
        # stage bisection).
        def p3(v, _):
            start = s3_ref[0, 0, v]
            row = c_ref[pl.ds(v, 1), :]
            rolled = pltpu.roll(row, -start, 1)
            c_ref[pl.ds(v, 1), :d_pad] = rolled[:, :d_pad]
            return _

        jax.lax.fori_loop(0, d, p3, 0)

        def pz3(v, _):
            c_ref[pl.ds(v, 1), :d_pad] = jnp.zeros((1, d_pad), jnp.int32)
            return _

        jax.lax.fori_loop(d, d_pad, pz3, 0)

        def cp_out(v, _):
            out_ref[0, pl.ds(v, 1), :] = c_ref[pl.ds(v, 1), :d_pad]
            return _

        jax.lax.fori_loop(0, d_pad, cp_out, 0)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("dst_img_px", "meters_per_px", "interpret")
)
def warp_bank_sim2_shear_pallas(
    bank: jnp.ndarray,
    i2Ri1: jnp.ndarray,
    i2ti1_scaled: jnp.ndarray,
    dst_img_px: int = bev_ops.DEFAULT_BEV_IMG_PX,
    meters_per_px: float = bev_ops.DEFAULT_METERS_PER_PX,
    interpret: bool = False,
) -> jnp.ndarray:
    """Pallas 3-shear NN warp; same contract as warp_bank_sim2_shear.

    Args:
        bank: (B, S, S) packed rgb888 int32 identity banks (pack_rgb888),
            stored flipped (production orientation).
        i2Ri1 / i2ti1_scaled: per-hypothesis rigid motion (see
            warp_bank_sim2_nn).

    Returns:
        (B, D, D, 3) uint8, D = dst_img_px + 1.
    """
    assert bank.ndim == 3, "expects packed rgb888 banks"
    b, src_h, src_w = bank.shape
    assert src_h == src_w, "square banks"
    d = dst_img_px + 1
    half_dst = int((dst_img_px / 2) * meters_per_px)
    half_src = int(((src_h - 1) / 2) * meters_per_px)
    s = src_h
    x3, y2, rows_a, lanes_a, lanes_b, d_pad = _dims(d, s)

    n, a, sh, phi, b2 = _shear_params(
        i2Ri1, i2ti1_scaled, half_src, half_dst, meters_per_px
    )
    b2 = b2 + _q_center_correction(n, phi, (d - 1) / 2.0)

    # Per-image integer pass parameters (identical to the XLA shear warp).
    o3 = jnp.minimum(0, jnp.round(a * (d - 1))).astype(jnp.int32)
    x3_log = jnp.arange(x3, dtype=jnp.float32)[None, :] + o3[:, None]
    r2 = jnp.round(sh[:, None] * x3_log).astype(jnp.int32)
    o2 = jnp.minimum(0, jnp.min(r2, axis=1))

    y2_log = jnp.arange(y2, dtype=jnp.float32)[None, :] + o2[:, None]
    row0 = (y2_log[:, 0] + jnp.round(b2[:, 1])).astype(jnp.int32)
    starts1 = (
        o3[:, None] + jnp.round(a[:, None] * y2_log + b2[:, 0:1])
    ).astype(jnp.int32)
    starts2 = r2 - o2[:, None]
    v_idx = jnp.arange(d, dtype=jnp.float32)[None, :]
    starts3 = (jnp.round(a[:, None] * v_idx) - o3[:, None]).astype(jnp.int32)

    # The source is pre-flip in the math; flip rows once here (XLA view),
    # and pad to the (8, 128) tile so the kernel's DMA slice is
    # tile-aligned (pad content is masked by the pass-1 bounds tests).
    srcp = bank[:, ::-1]
    srcp = jnp.pad(
        srcp,
        (
            (0, 0),
            (0, _round_up(s, 8) - s),
            (0, _round_up(s, 128) - s),
        ),
    )

    def pad_to(arr, w):
        return jnp.pad(arr, ((0, 0), (0, w - arr.shape[1])))

    # (B, 1, N) shapes with (1, 1, N) blocks satisfy the TPU block-shape
    # tiling rule (trailing dims equal the array dims).
    misc = jnp.stack([row0], axis=-1).astype(jnp.int32)[:, None, :]
    s1p = pad_to(starts1, _round_up(y2, 8))[:, None, :]
    s2p = pad_to(starts2, _round_up(x3, 8))[:, None, :]
    s3p = pad_to(starts3, _round_up(d, 8))[:, None, :]

    smem = lambda shp: pl.BlockSpec(
        (1,) + shp[1:], lambda i: (i,) + (0,) * (len(shp) - 1),
        memory_space=pltpu.SMEM,
    )
    kernel = _warp_kernel_factory(d, s, x3, y2, rows_a, lanes_a, lanes_b, d_pad)
    t1 = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            smem(misc.shape),
            smem(s1p.shape),
            smem(s2p.shape),
            smem(s3p.shape),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (1, d_pad, d_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, d_pad, d_pad), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((rows_a, lanes_a), jnp.int32),
            pltpu.VMEM((rows_a, lanes_b), jnp.int32),
            pltpu.VMEM((d_pad, lanes_b), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(misc, s1p, s2p, s3p, srcp)

    t1 = t1[:, :d, :d]

    # Final rot90^n grid permutation + unflip + u8 unpack (cheap XLA ops;
    # identical to warp_bank_sim2_shear).
    variants = jnp.stack(
        [
            t1,
            jnp.swapaxes(t1[:, :, ::-1], 1, 2),
            t1[:, ::-1, ::-1],
            jnp.swapaxes(t1[:, ::-1, :], 1, 2),
        ],
        1,
    )
    outp = jnp.take_along_axis(
        variants, n[:, None, None, None].astype(jnp.int32), axis=1
    )[:, 0]
    got = outp[:, ::-1]
    return jnp.stack(
        [(got >> 16) & 0xFF, (got >> 8) & 0xFF, got & 0xFF], axis=-1
    ).astype(jnp.uint8)
