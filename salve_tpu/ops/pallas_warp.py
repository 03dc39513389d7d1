"""Pallas 3-shear Sim(2) NN warp: VMEM-resident shear passes.

The XLA shear warp (ops/warp.py:warp_bank_sim2_shear) validates the
algorithm but loses on chip to the per-cell gather (pads + generic gather
lowering + HBM transposes). The kernels here run the identical pass
structure inside VMEM:

  pass 1   per-row lane roll of the staged source (+ zero masking)
  T        128x128 tile transposes between passes (VMEM-resident)
  pass 2/3 per-row lane rolls with in-range-by-construction starts

One grid step per image; the packed-rgb888 source plane (~4 MB) is DMA'd
HBM->VMEM once, every intermediate lives in VMEM scratch, and the only HBM
writes are the final (D, D) output plane.

Two generations, both element-exact vs the XLA shear oracle
(tests/ops/test_pallas_warp.py; same (n, a, s, b2) parameters, same
per-pass NN rounding; the final rot90^n grid permutation and u8 unpack
stay outside as cheap XLA ops):

  v1 (warp_bank_sim2_shear_pallas): one scalar fori iteration per row with
     a DYNAMIC pltpu.roll — correct but scalar-core-bound (~2300
     sequential tiny iterations; 0.49 ms/img uncontended).
  v2 (warp_bank_sim2_shear_pallas_v2, production): barrel-shift — each
     pass is ~log2(width) static full-block rolls + per-row selects, all
     row addressing static (pass 1 stores by source row; the row0 shift is
     undone in pass 2's lane domain). VPU-bound; ~11x v1 on chip.
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


def _ceil_div(x: int, m: int) -> int:
    return (x + m - 1) // m


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


# ---------------------------------------------------------------------------
# v2: barrel-shift shear passes — vector ops instead of per-row scalar loops.
# ---------------------------------------------------------------------------

_BLK = 128  # rows per vectorized pass block


def _v2_dims(d: int, s: int):
    """v2 scratch extents: A must hold both the staged source and I1T."""
    x3, y2, rows_a, lanes_a, lanes_b, d_pad = _dims(d, s)
    a_rows = max(rows_a, lanes_b)
    return x3, y2, rows_a, lanes_a, lanes_b, d_pad, a_rows


def _barrel_roll_left(cur, starts_b, width):
    """Roll each row of ``cur`` left by its (lane-replicated) per-row start.

    log2(width) static lane rolls + per-row selects — the whole pass is
    vector work; no data-dependent shifts reach Mosaic (whose dynamic roll
    is both scalar-loop-bound and silently wrong at non-pow2 lanes, see
    _dims). Starts are taken modulo the pow2 width, so any int32 works.
    """
    sm = starts_b & (width - 1)
    k = 1
    while k < width:
        cur = jnp.where((sm & k) != 0, pltpu.roll(cur, width - k, 1), cur)
        k *= 2
    return cur


def _warp_kernel_v2_factory(d, s, x3, y2, rows_a, lanes_a, lanes_b, d_pad, a_rows):
    tile = 128
    blk = _BLK
    s_pad = _round_up(s, blk)

    def kernel(s1_ref, s2_ref, s3_ref, bank_ref, out_ref, a_ref, b_ref, c_ref, sem):
        s_rp, s_cp = _round_up(s, 8), _round_up(s, 128)
        dma = pltpu.make_async_copy(
            bank_ref.at[pl.program_id(0)], a_ref.at[:s_rp, :s_cp], sem
        )
        dma.start()
        dma.wait()

        lane1 = jax.lax.broadcasted_iota(jnp.int32, (blk, lanes_a), 1)
        row_io = jax.lax.broadcasted_iota(jnp.int32, (blk, lanes_a), 0)

        # Pass 1, indexed by SOURCE row r (static blocks — Mosaic cannot
        # prove dynamic sublane starts 8-aligned, so no dynamic row reads):
        # B[r] = I1[r - row0], via starts1 pre-shifted by row0 in XLA. The
        # row0 shift is undone in pass 2's lane domain (starts2 + row0).
        st1 = s1_ref[0]
        for bi in range(s_pad // blk):
            r0 = bi * blk
            cur = a_ref[r0 : r0 + blk, :]
            stb = jnp.broadcast_to(st1[r0 : r0 + blk, :1], (blk, lanes_a))
            cur = _barrel_roll_left(cur, stb, lanes_a)
            valid = (
                (row_io + r0 < s)
                & (lane1 + stb >= 0)
                & (lane1 + stb < s)
            )
            b_ref[r0 : r0 + blk, :] = jnp.where(valid, cur, 0)[:, :lanes_b]
        if s_pad < rows_a:
            # Rows pass 2 may address (stored index < rows_a) but no block
            # wrote: must read as zero (invalid source rows).
            b_ref[s_pad:rows_a, :] = jnp.zeros((rows_a - s_pad, lanes_b), jnp.int32)

        # Transpose B (rows_a x lanes_b) -> A (lanes_b x rows_a) = I1T
        # (in the row0-shifted row indexing).
        def t1(i, _):
            tr = i // (lanes_b // tile)
            tc = i % (lanes_b // tile)
            blk_t = b_ref[pl.ds(tr * tile, tile), pl.ds(tc * tile, tile)]
            a_ref[pl.ds(tc * tile, tile), pl.ds(tr * tile, tile)] = blk_t.T
            return _

        jax.lax.fori_loop(0, (rows_a // tile) * (lanes_b // tile), t1, 0)

        # Pass 2: starts carry +row0 (undoing pass 1's storage shift);
        # stored indices outside [0, rows_a) mean invalid (zero) I1 rows.
        st2 = s2_ref[0]
        for bi in range(_ceil_div(x3, blk)):
            x0 = bi * blk
            cur = a_ref[x0 : x0 + blk, :]
            stb = jnp.broadcast_to(st2[x0 : x0 + blk, :1], (blk, lanes_a))
            cur = _barrel_roll_left(cur, stb, lanes_a)
            valid = (lane1 + stb >= 0) & (lane1 + stb < rows_a)
            b_ref[x0 : x0 + blk, :d_pad] = jnp.where(valid, cur, 0)[:, :d_pad]

        # Transpose B[:lanes_b, :d_pad] (I2T) -> C (d_pad x lanes_b) = I2.
        def t2(i, _):
            tr = i // (d_pad // tile)
            tc = i % (d_pad // tile)
            blk_t = b_ref[pl.ds(tr * tile, tile), pl.ds(tc * tile, tile)]
            c_ref[pl.ds(tc * tile, tile), pl.ds(tr * tile, tile)] = blk_t.T
            return _

        jax.lax.fori_loop(0, (lanes_b // tile) * (d_pad // tile), t2, 0)

        # Pass 3: in-place block barrel roll of C (full-width writes; the
        # narrowed in-place store miscompiled on Mosaic, see v1 note).
        lane3 = jax.lax.broadcasted_iota(jnp.int32, (blk, lanes_b), 1)
        st3 = s3_ref[0]
        for bi in range(_ceil_div(d, blk)):
            v0 = bi * blk
            cur = c_ref[v0 : v0 + blk, :]
            stb = jnp.broadcast_to(st3[v0 : v0 + blk, :1], (blk, lanes_b))
            cur = _barrel_roll_left(cur, stb, lanes_b)
            c_ref[v0 : v0 + blk, :] = cur

        out_ref[0, :, :] = c_ref[:d_pad, :d_pad]

    return kernel


@functools.partial(
    jax.jit, static_argnames=("dst_img_px", "meters_per_px", "interpret")
)
def warp_bank_sim2_shear_pallas_v2(
    bank: jnp.ndarray,
    i2Ri1: jnp.ndarray,
    i2ti1_scaled: jnp.ndarray,
    dst_img_px: int = bev_ops.DEFAULT_BEV_IMG_PX,
    meters_per_px: float = bev_ops.DEFAULT_METERS_PER_PX,
    interpret: bool = False,
) -> jnp.ndarray:
    """Barrel-shift 3-shear NN warp; same contract as warp_bank_sim2_shear.

    Identical pass structure and (XLA-precomputed) pass parameters as the
    v1 kernel — asserted element-exact against the XLA shear oracle in
    tests/ops/test_pallas_warp.py — but each pass runs as ~log2(width)
    static full-block lane rolls + per-row selects instead of one scalar
    fori iteration per row, so the kernel is VPU-bound rather than
    scalar-core-bound (~2300 sequential scalar iterations in v1).

    All row addressing is static: pass 1 stores I1 indexed by source row
    (a row0 shift), which pass 2 undoes in the lane domain after the
    transpose — Mosaic cannot prove dynamic sublane starts aligned, so
    dynamic row windows are not expressible anyway.
    """
    assert bank.ndim == 3, "expects packed rgb888 banks"
    b, src_h, src_w = bank.shape
    assert src_h == src_w, "square banks"
    d = dst_img_px + 1
    half_dst = int((dst_img_px / 2) * meters_per_px)
    half_src = int(((src_h - 1) / 2) * meters_per_px)
    s = src_h
    x3, y2, rows_a, lanes_a, lanes_b, d_pad, a_rows = _v2_dims(d, s)

    n, a, sh, phi, b2 = _shear_params(
        i2Ri1, i2ti1_scaled, half_src, half_dst, meters_per_px
    )
    b2 = b2 + _q_center_correction(n, phi, (d - 1) / 2.0)

    # Per-image integer pass parameters (identical to the v1/XLA shear warp).
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

    # Shift starts1 into source-row indexing (pass 1 stores B[r] =
    # I1[r - row0]); rows whose y index falls outside [0, y2) hold garbage
    # that pass 2's stored-index mask never reads.
    s_pad = _round_up(s, _BLK)
    r_idx = jnp.arange(s_pad, dtype=jnp.int32)[None, :]
    y_of_r = jnp.clip(r_idx - row0[:, None], 0, y2 - 1)
    starts1_s = jnp.take_along_axis(starts1, y_of_r, axis=1)
    starts2_s = starts2 + row0[:, None]

    srcp = bank[:, ::-1]
    srcp = jnp.pad(
        srcp,
        (
            (0, 0),
            (0, _round_up(s, 8) - s),
            (0, _round_up(s, 128) - s),
        ),
    )

    def col128(arr, rows):
        """(B, N) starts -> (B, rows, 128) lane-replicated VMEM columns."""
        padded = jnp.pad(arr, ((0, 0), (0, rows - arr.shape[1])))
        return jnp.broadcast_to(padded[:, :, None], (b, rows, 128))

    s1c = col128(starts1_s, s_pad)
    s2c = col128(starts2_s, _round_up(x3, _BLK))
    s3c = col128(starts3, _round_up(d, _BLK))

    vmem_col = lambda shp: pl.BlockSpec(
        (1,) + shp[1:], lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    kernel = _warp_kernel_v2_factory(
        d, s, x3, y2, rows_a, lanes_a, lanes_b, d_pad, a_rows
    )
    t1 = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            vmem_col(s1c.shape),
            vmem_col(s2c.shape),
            vmem_col(s3c.shape),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (1, d_pad, d_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, d_pad, d_pad), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((a_rows, lanes_a), jnp.int32),
            pltpu.VMEM((rows_a, lanes_b), jnp.int32),
            pltpu.VMEM((d_pad, lanes_b), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(s1c, s2c, s3c, srcp)

    t1 = t1[:, :d, :d]

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
