"""On-chip A/B of the fused render+verify pipeline: direct vs warp renders.

Measures end-to-end hyp/s for score_floor_hypotheses with
  (a) direct per-hypothesis renders (production round-2 default), and
  (b) Sim(2) NN-warp renders from packed extended identity banks.
Uses the ResNet-152 4-image verifier at the reference eval resolution —
the BENCH_r headline configuration. Synthetic fixture pano bank (real
geometry building 0000), 128 hypotheses, batch 32.
"""
import time

import jax
import numpy as np

from salve_tpu.common import posegraph2d
from salve_tpu.common.alignment_hypothesis import AlignmentHypothesis
from salve_tpu.geometry.sim2 import Sim2
from salve_tpu.pipeline.fused_inference import score_floor_hypotheses
from salve_tpu.rendering import synthetic
from salve_tpu.rendering.bev_pair import BEVRenderConfig
from salve_tpu.training import train as train_lib
from salve_tpu.training.config import TrainingConfig

ZIND = "/root/reference/tests/test_data/ZInD"
N_HYP = 128
BS = 32

cfg = TrainingConfig(
    num_layers=152,
    modalities=("ceiling_rgb_texture", "floor_rgb_texture"),
    resize_h=234, resize_w=234, train_h=224, train_w=224,
    batch_size=BS,
)
state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0), max_iter=1)

pg = posegraph2d.get_gt_pose_graph("0000", "floor_01", ZIND)
pids = sorted(pg.nodes)[:4]
depths, rgbs = [], []
for pid in pids:
    pano = synthetic.synthetic_pano_for_pano_data(
        pg.nodes[pid], pg.get_camera_height_m(pid), seed=pid
    )
    rgbs.append(pano["rgb"].astype(np.float32) / 255.0)
    depths.append((pano["depth"] * 1000.0).astype(np.float32))
depths = np.stack(depths)
rgbs = np.stack(rgbs)
id2row = {pid: k for k, pid in enumerate(pids)}

rng = np.random.default_rng(0)
hyps = []
for k in range(N_HYP):
    th = rng.uniform(0, 360)
    t = rng.uniform(-2, 2, 2)
    hyps.append(
        (
            pids[k % 3], pids[(k % 3) + 1],
            AlignmentHypothesis(
                i2Ti1=Sim2.from_theta_deg(th, t),
                wdo_alignment_object="door",
                i1_wdo_idx=0, i2_wdo_idx=0, configuration="identity",
            ),
        )
    )

for mode, use_warp in [("direct", False), ("warp", True)]:
    # warm (compile + bank build)
    t0 = time.time()
    score_floor_hypotheses(
        state, cfg, depths, rgbs, id2row, hyps[:BS],
        batch_size=BS, use_warp_renders=use_warp,
    )
    warm = time.time() - t0
    t0 = time.time()
    res = score_floor_hypotheses(
        state, cfg, depths, rgbs, id2row, hyps,
        batch_size=BS, use_warp_renders=use_warp,
    )
    dt = time.time() - t0
    print(
        f"{mode}: {len(res)} hyps in {dt:.2f}s = {len(res)/dt:.1f} hyp/s/chip "
        f"(warm-up incl. compile {warm:.1f}s)"
    )
