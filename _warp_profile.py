"""On-chip A/B: direct per-hypothesis render vs Sim(2)-warp of identity bank.

Measures the Stage-B cost per hypothesis batch for
  (a) the production direct path: backproject + transform + z-order splat +
      fill/mask (rendering/bev_pair.py:render_transformed_batched);
  (b) the warp path: one NN gather from the extended identity bank
      (ops/warp.py:warp_bank_sim2_nn), bank amortized per floor.

Fetch-barrier timing discipline (scalar reduce + float()) per
BENCH_NOTES.md. Run on the real chip; results recorded in BENCH_NOTES.md.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from salve_tpu.ops import warp as warp_ops
from salve_tpu.rendering import bev_pair

B = 32  # hypotheses per batch
rng = np.random.default_rng(0)

# One synthetic pano as the shared pano-1 source (realistic point density).
import sys

sys.path.insert(0, "tests")
from salve_tpu.common import posegraph2d
from salve_tpu.rendering import synthetic

ZIND = "/root/reference/tests/test_data/ZInD"
pg = posegraph2d.get_gt_pose_graph("0000", "floor_01", ZIND)
pid = sorted(pg.nodes)[1]
pano = synthetic.synthetic_pano_for_pano_data(
    pg.nodes[pid], pg.get_camera_height_m(pid), seed=3
)
rgb = jnp.asarray(pano["rgb"].astype(np.float32) / 255.0)
depth = jnp.asarray((pano["depth"] * 1000.0).astype(np.float32))

CFG = bev_pair.BEVRenderConfig()
Z_RANGE = (-np.inf, -1.0)

thetas = rng.uniform(0, 2 * np.pi, B)
R = np.stack(
    [
        np.array([[np.cos(t), -np.sin(t)], [np.sin(t), np.cos(t)]])
        for t in thetas
    ]
).astype(np.float32)
t_un = rng.uniform(-2.0, 2.0, (B, 2)).astype(np.float32)

depths_b = jnp.broadcast_to(depth, (B,) + depth.shape)
rgbs_b = jnp.broadcast_to(rgb, (B,) + rgb.shape)
R_d, t_d = jnp.asarray(R), jnp.asarray(t_un)


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
def direct(depths, rgbs, Rb, tb):
    imgs = bev_pair.render_transformed_batched(depths, rgbs, Rb, tb, Z_RANGE, CFG)
    return jnp.sum(imgs.astype(jnp.float32))


# Warp: bank built once (per-floor cost), warp per batch.
bank = warp_ops.pack_rgb888(
    warp_ops.render_identity_bank_extended(
        depth[None], rgb[None], Z_RANGE, CFG,
        bank_px=warp_ops.DEFAULT_WARP_BANK_PX,
    )
)
bank_b = jnp.broadcast_to(bank[0], (B,) + bank.shape[1:])


@jax.jit
def warped(bank_in, Rb, tb):
    imgs = warp_ops.warp_bank_sim2_nn(
        bank_in, Rb, tb * bev_pair.HOHO_S_ZIND_SCALE_FACTOR
    )
    return jnp.sum(imgs.astype(jnp.float32))


t_bank = timeit(
    lambda d, r: jnp.sum(
        warp_ops.render_identity_bank_extended(
            d, r, Z_RANGE, CFG, bank_px=warp_ops.DEFAULT_WARP_BANK_PX
        ).astype(jnp.float32)
    ),
    depth[None], rgb[None], reps=3,
)
t_direct = timeit(direct, depths_b, rgbs_b, R_d, t_d)
t_warp = timeit(warped, bank_b, R_d, t_d)
print(f"direct render:      {t_direct*1000:.1f} ms/batch{B} ({t_direct/B*1000:.2f} ms/img)")
print(f"warp render:        {t_warp*1000:.1f} ms/batch{B} ({t_warp/B*1000:.2f} ms/img)  [{t_direct/t_warp:.2f}x]")
print(f"ext bank build:     {t_bank*1000:.1f} ms/pano/surface (per-floor amortized)")


@jax.jit
def warped_shear(bank_in, Rb, tb):
    imgs = warp_ops.warp_bank_sim2_shear(
        bank_in, Rb, tb * bev_pair.HOHO_S_ZIND_SCALE_FACTOR
    )
    return jnp.sum(imgs.astype(jnp.float32))


t_shear = timeit(warped_shear, bank_b, R_d, t_d)
print(f"shear warp render:  {t_shear*1000:.1f} ms/batch{B} ({t_shear/B*1000:.2f} ms/img)  [{t_direct/t_shear:.2f}x vs direct]")
