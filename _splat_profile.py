"""Profile the z-order splat decomposition on chip: scatter vs gather vs rest.

Also A/B two candidate variants against the production scatter-max:
  (a) collision-reduced scatter (column-dedup prepass drops dominated points)
  (b) fused color scatter (3 extra max-scatters replacing take_along_axis)
All timed with the fetch-barrier discipline (reduce to scalar, float()).
"""
import time

import jax

# Variant (d) packs (key << 24 | rgb888) into true int64 values; without
# x64, JAX silently downcasts to int32 and the pack overflows. Every array
# in this script is explicitly typed, so enabling x64 changes nothing else.
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from salve_tpu.ops import bev as bev_ops

B, N = 32, 352 * 1024
H = W = 501
rng = np.random.default_rng(0)

# Realistic-ish points: radial distribution concentrated near center cells.
r = np.abs(rng.normal(0, 80, (B, N)))
th = rng.uniform(0, 2 * np.pi, (B, N))
x = np.clip((250 + r * np.cos(th)).astype(np.int32), 0, W - 1)
y = np.clip((250 + r * np.sin(th)).astype(np.int32), 0, H - 1)
xy = np.stack([x, y], -1)
z = rng.uniform(-1.9, 1.9, (B, N)).astype(np.float32)
rgb = rng.uniform(0, 1, (B, N, 3)).astype(np.float32)
valid = np.ones((B, N), bool)

xy_d, z_d, rgb_d, valid_d = map(jnp.asarray, (xy, z, rgb, valid))


def timeit(fn, *args, reps=6):
    out = fn(*args)
    float(out)
    t0 = time.time()
    acc = jnp.float32(0.0)
    for _ in range(reps):
        acc = acc + fn(*args)
    float(acc)
    return (time.time() - t0) / reps


@jax.jit
def full_splat(xy, z, rgb, valid):
    sparse, occ = bev_ops.splat_zorder_batched(xy, z, rgb, valid, H, W)
    return jnp.sum(sparse) + jnp.sum(occ)


@jax.jit
def scatter_only(xy, z, rgb, valid):
    b, n = z.shape
    xx, yy = xy[..., 0], xy[..., 1]
    z_bin = jnp.floor((z - bev_ops.ZMIN) / (bev_ops.ZMAX - bev_ops.ZMIN) * bev_ops.NUM_Z_SLICES).astype(jnp.int32)
    ok = valid & (z >= bev_ops.ZMIN) & (z < bev_ops.ZMAX)
    key = z_bin * n + jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)
    hw = H * W
    b_off = jax.lax.broadcasted_iota(jnp.int32, (b, n), 0) * hw
    cell = jnp.where(ok, yy * W + xx + b_off, b * hw)
    grid = jnp.full((b * hw,), -1, dtype=jnp.int32)
    grid = grid.at[cell.reshape(-1)].max(jnp.where(ok, key, -1).reshape(-1), mode="drop")
    return jnp.sum(grid)


@jax.jit
def gather_only(rgb, winner):
    return jnp.sum(jnp.take_along_axis(rgb, winner[..., None], axis=1))


winner = jnp.asarray(rng.integers(0, N, (B, H * W)).astype(np.int32))

t_full = timeit(full_splat, xy_d, z_d, rgb_d, valid_d)
t_scatter = timeit(scatter_only, xy_d, z_d, rgb_d, valid_d)
t_gather = timeit(gather_only, rgb_d, winner)
print(f"full splat:    {t_full*1000:.1f} ms/batch{B} ({t_full/B*1000:.2f} ms/img)")
print(f"scatter only:  {t_scatter*1000:.1f} ms")
print(f"gather only:   {t_gather*1000:.1f} ms")


# Variant (b): fused color scatters (no gather).
@jax.jit
def splat_fused_color(xy, z, rgb, valid):
    b, n = z.shape
    xx, yy = xy[..., 0], xy[..., 1]
    z_bin = jnp.floor((z - bev_ops.ZMIN) / (bev_ops.ZMAX - bev_ops.ZMIN) * bev_ops.NUM_Z_SLICES).astype(jnp.int32)
    ok = valid & (z >= bev_ops.ZMIN) & (z < bev_ops.ZMAX)
    key = z_bin * n + jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)
    hw = H * W
    b_off = jax.lax.broadcasted_iota(jnp.int32, (b, n), 0) * hw
    cell = jnp.where(ok, yy * W + xx + b_off, b * hw).reshape(-1)
    # Pack (key, channel) into one value: key * 256 + u8 color; the key
    # dominates, so the max carries the winner's color bits.
    out = []
    kq = jnp.where(ok, key, -1).reshape(-1).astype(jnp.int64)
    for c in range(3):
        cq = jnp.clip(jnp.round(rgb[..., c] * 255.0), 0, 255).astype(jnp.int64).reshape(-1)
        g = jnp.full((b * hw,), -1, dtype=jnp.int64)
        g = g.at[cell].max(jnp.where(kq >= 0, kq * 256 + cq, -1), mode="drop")
        out.append(jnp.sum(g % 256))
    return out[0] + out[1] + out[2]


try:
    t_fused = timeit(splat_fused_color, xy_d, z_d, rgb_d, valid_d)
    print(f"fused-color (3 scatters, no gather): {t_fused*1000:.1f} ms")
except Exception as e:
    print("fused-color failed:", type(e).__name__, str(e)[:200])


# Variant (a): dedup prepass (drop points dominated by the next same-cell
# point one pano-row below), then the production splat.
@jax.jit
def splat_dedup(xy, z, rgb, valid):
    stride = 1024  # pano width: i vs i+W is the same column, next row
    cell = xy[..., 1] * W + xy[..., 0]
    nxt = jnp.roll(cell, -stride, axis=1)
    dominated = (cell == nxt) & valid & jnp.roll(valid, -stride, axis=1)
    # next point has a higher flat index -> higher tiebreak key when z_bins equal
    zb = jnp.floor((z - bev_ops.ZMIN) / (bev_ops.ZMAX - bev_ops.ZMIN) * bev_ops.NUM_Z_SLICES)
    dominated = dominated & (zb <= jnp.roll(zb, -stride, axis=1))
    v2 = valid & ~dominated
    sparse, occ = bev_ops.splat_zorder_batched(xy, z, rgb, v2, H, W)
    return jnp.sum(sparse) + jnp.sum(occ)


t_dedup = timeit(splat_dedup, xy_d, z_d, rgb_d, valid_d)
print(f"dedup-prepass + splat: {t_dedup*1000:.1f} ms")


# Variant (c): packed-rgb888 gather — pack each point's color into ONE int32
# before the splat, so the winner gather moves 4 bytes/cell instead of 12
# (three f32 channels). Unpacking is vectorized VPU work.
@jax.jit
def splat_packed_gather(xy, z, rgb, valid):
    b, n = z.shape
    xx, yy = xy[..., 0], xy[..., 1]
    z_bin = jnp.floor((z - bev_ops.ZMIN) / (bev_ops.ZMAX - bev_ops.ZMIN) * bev_ops.NUM_Z_SLICES).astype(jnp.int32)
    ok = valid & (z >= bev_ops.ZMIN) & (z < bev_ops.ZMAX)
    key = z_bin * n + jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)
    hw = H * W
    b_off = jax.lax.broadcasted_iota(jnp.int32, (b, n), 0) * hw
    cell = jnp.where(ok, yy * W + xx + b_off, b * hw)
    grid = jnp.full((b * hw,), -1, dtype=jnp.int32)
    grid = grid.at[cell.reshape(-1)].max(jnp.where(ok, key, -1).reshape(-1), mode="drop")
    grid = grid.reshape(b, hw)
    occupied = grid >= 0
    winner = jnp.where(occupied, grid % n, 0)
    rgb_u8 = jnp.clip(jnp.round(rgb * 255.0), 0, 255).astype(jnp.int32)
    packed = (rgb_u8[..., 0] << 16) | (rgb_u8[..., 1] << 8) | rgb_u8[..., 2]  # (B,N)
    got = jnp.take_along_axis(packed, winner, axis=1)  # (B,HW) int32
    r8 = (got >> 16) & 0xFF
    g8 = (got >> 8) & 0xFF
    b8 = got & 0xFF
    sparse = jnp.where(
        occupied[..., None],
        jnp.stack([r8, g8, b8], -1).astype(jnp.float32),
        0.0,
    )
    return jnp.sum(sparse) + jnp.sum(occupied)


t_packed = timeit(splat_packed_gather, xy_d, z_d, rgb_d, valid_d)
print(f"packed-rgb888 gather splat: {t_packed*1000:.1f} ms")


# Variant (d): ONE int64 scatter-max carrying (key << 24 | rgb888) — no
# gather at all. key < 4*N needs 21 bits at N=352k; 21+24 = 45 < 63.
@jax.jit
def splat_int64_fused(xy, z, rgb, valid):
    b, n = z.shape
    xx, yy = xy[..., 0], xy[..., 1]
    z_bin = jnp.floor((z - bev_ops.ZMIN) / (bev_ops.ZMAX - bev_ops.ZMIN) * bev_ops.NUM_Z_SLICES).astype(jnp.int32)
    ok = valid & (z >= bev_ops.ZMIN) & (z < bev_ops.ZMAX)
    key = (z_bin * n + jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)).astype(jnp.int64)
    hw = H * W
    b_off = jax.lax.broadcasted_iota(jnp.int32, (b, n), 0) * hw
    cell = jnp.where(ok, yy * W + xx + b_off, b * hw)
    rgb_u8 = jnp.clip(jnp.round(rgb * 255.0), 0, 255).astype(jnp.int64)
    packed = (rgb_u8[..., 0] << 16) | (rgb_u8[..., 1] << 8) | rgb_u8[..., 2]
    val = jnp.where(ok, (key << 24) | packed, jnp.int64(-1))
    grid = jnp.full((b * hw,), -1, dtype=jnp.int64)
    grid = grid.at[cell.reshape(-1)].max(val.reshape(-1), mode="drop")
    grid = grid.reshape(b, hw)
    occupied = grid >= 0
    got = jnp.where(occupied, grid & 0xFFFFFF, 0)
    r8 = (got >> 16) & 0xFF
    g8 = (got >> 8) & 0xFF
    b8 = got & 0xFF
    sparse = jnp.stack([r8, g8, b8], -1).astype(jnp.float32)
    return jnp.sum(sparse) + jnp.sum(occupied)


try:
    t_i64 = timeit(splat_int64_fused, xy_d, z_d, rgb_d, valid_d)
    print(f"int64 fused scatter (no gather): {t_i64*1000:.1f} ms")
except Exception as e:
    print("int64 fused failed:", type(e).__name__, str(e)[:200])


# Correctness of the packed-rgb888 production path is asserted in
# tests/ops/test_bev.py::test_splat_quantize_u8_same_winners_exact_u8_colors
# (identical winners; bit-exact u8 colors for u8-derived inputs).


# Variant (e): Pallas VMEM-resident scalar-RMW splat (ops/pallas_splat.py)
# — priority grid only; A/B against scatter_only (the same sub-problem).
from salve_tpu.ops.pallas_splat import splat_priority_grid_pallas


@jax.jit
def pallas_priority_only(xy, z, valid):
    b, n = z.shape
    xx, yy = xy[..., 0], xy[..., 1]
    z_bin = jnp.floor((z - bev_ops.ZMIN) / (bev_ops.ZMAX - bev_ops.ZMIN) * bev_ops.NUM_Z_SLICES).astype(jnp.int32)
    ok = valid & (z >= bev_ops.ZMIN) & (z < bev_ops.ZMAX)
    key = (z_bin * n + jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)).astype(jnp.int32)
    cell = (yy * W + xx).astype(jnp.int32)
    grid = splat_priority_grid_pallas(cell, key, ok, H, W)
    return jnp.sum(grid)


try:
    # correctness vs the XLA scatter first (on whatever backend runs this)
    t_pallas = timeit(pallas_priority_only, xy_d, z_d, valid_d)
    ref = scatter_only(xy_d, z_d, rgb_d, valid_d)
    got = pallas_priority_only(xy_d, z_d, valid_d)
    print(f"pallas VMEM splat (priority grid only): {t_pallas*1000:.1f} ms "
          f"[checksum {'MATCH' if int(ref) == int(got) else 'MISMATCH: %d vs %d' % (int(ref), int(got))}]")
except Exception as e:
    print("pallas VMEM splat failed:", type(e).__name__, str(e)[:300])
