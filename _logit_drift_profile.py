"""Measure verifier-logit drift due to the BEV fill scheme (VERDICT #4).

The production renderer replaces the reference's Qhull/Delaunay-linear
griddata fill (salve/utils/interpolation_utils.py:46) with a dilation-
average fill restricted to the sites' convex hull (ops/bev.py). Pixel drift
is bounded in tests/parity/test_interpolation_drift.py (~2/255 where both
schemes have content); THIS script closes the loop at the decision level:
render the same held-out hypothesis pairs both ways, push both through a
TRAINED verifier, and report the P(positive) delta + argmax flip rate.

Usage (after an end_to_end_eval run has produced a checkpoint):
    python _logit_drift_profile.py --output_dir /tmp/e2e_v7 \
        --eval_building 1210 --num_pairs 48 --append_pair_difference

Both variants here skip the JPEG round trip (drift isolated to the fill
scheme); the production numbers in ACCURACY_*.json go through JPGs.
"""

import argparse
import glob
import json
import re
import time
from pathlib import Path

import numpy as np


def qhull_oracle_fill(sparse_img_u8: np.ndarray, k: int = 11) -> np.ndarray:
    """Reference-faithful fill (see tests/parity/test_interpolation_drift.py)."""
    import scipy.interpolate
    import scipy.ndimage

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
    support = (sparse_img_u8 > 0).all(axis=-1).astype(np.float64)
    counts = scipy.ndimage.uniform_filter(support, size=k, mode="constant") * (k * k)
    mask = counts > 0.5
    return (interp * mask[..., None]).astype(np.uint8)


def load_pano_bank(out: Path, building: str):
    """(stems, depth_mm (P,512,1024) u16, rgb (P,512,1024,3) f32 [0,1])."""
    import imageio.v2 as imageio

    depth_fpaths = sorted(glob.glob(str(out / "depth" / building / "*.depth.png")))
    stems, depths, rgbs = [], [], []
    for dfp in depth_fpaths:
        stem = Path(dfp).name.replace(".depth.png", "")
        jfp = out / "zind" / building / "panos" / f"{stem}.jpg"
        if not jfp.exists():
            continue
        stems.append(stem)
        depths.append(imageio.imread(dfp))
        rgbs.append(imageio.imread(str(jfp)).astype(np.float32) / 255.0)
    return stems, np.stack(depths), np.stack(rgbs)


def pano_id_of_stem(stem: str) -> int:
    return int(stem.split("_pano_")[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--output_dir", required=True)
    ap.add_argument("--eval_building", default="1210")
    ap.add_argument("--num_pairs", type=int, default=48)
    ap.add_argument("--num_layers", type=int, default=18)
    ap.add_argument("--resize_px", type=int, default=128)
    ap.add_argument("--crop_px", type=int, default=112)
    ap.add_argument("--append_pair_difference", action="store_true")
    ap.add_argument("--ckpt", default=None, help="default: newest in output_dir/ckpts")
    args = ap.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp

    from salve_tpu.geometry.sim2 import Sim2
    from salve_tpu.ops import backproject as bp
    from salve_tpu.ops import bev as bev_ops
    from salve_tpu.rendering.bev_pair import (
        BEVRenderConfig,
        HOHO_S_ZIND_SCALE_FACTOR,
        _R_FIX,
        _z_range_for_surface,
        render_bev_pair,
    )
    from salve_tpu.training import train as train_lib
    from salve_tpu.training.config import TrainingConfig

    out = Path(args.output_dir)
    ckpt = args.ckpt or sorted(
        glob.glob(str(out / "ckpts" / "*" / "train_ckpt.flax"))
    )[-1]
    cfg = TrainingConfig(
        num_layers=args.num_layers,
        resize_h=args.resize_px, resize_w=args.resize_px,
        train_h=args.crop_px, train_w=args.crop_px,
        batch_size=8,
        append_pair_difference=args.append_pair_difference,
    )
    state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0), max_iter=1)
    state = train_lib.load_model_checkpoint(ckpt, state)
    eval_step = train_lib.make_eval_step(cfg)

    rng = np.random.default_rng(0)
    render_cfg = BEVRenderConfig()

    # Sample pos/neg hypotheses across the building's floors.
    hyps = []
    for label_dir, label in (("gt_alignment_approx", 1), ("incorrect_alignment", 0)):
        fpaths = sorted(
            glob.glob(str(out / "hypotheses" / args.eval_building / "*" / label_dir / "*.json"))
        )
        take = min(args.num_pairs // 2, len(fpaths))
        for fp in rng.choice(fpaths, size=take, replace=False):
            m = re.match(r"(\d+)_(\d+)__", Path(fp).name)
            i1, i2 = int(m.group(1)), int(m.group(2))
            hyps.append((fp, i1, i2, label))

    stems, depths_mm, rgbs = load_pano_bank(out, args.eval_building)
    id2idx = {pano_id_of_stem(s): k for k, s in enumerate(stems)}

    def oracle_pair(i2Ti1: Sim2, b1: int, b2: int, surface: str):
        """(img1, img2) with Qhull fill; geometry identical to production."""
        z_range = _z_range_for_surface(surface)
        window = bp.surface_row_window(512, z_range, render_cfg.crop_ratio)
        outs = []
        for which, bidx in (("1", b1), ("2", b2)):
            xyz, col, valid = bp.backproject_depth(
                jnp.asarray(depths_mm[bidx], jnp.float32),
                jnp.asarray(rgbs[bidx]),
                z_range, render_cfg.crop_ratio, window,
            )
            xyz, col, valid = np.asarray(xyz), np.asarray(col), np.asarray(valid)
            xy = xyz[:, :2] @ np.asarray(_R_FIX).T
            if which == "1":
                R = i2Ti1.rotation.astype(np.float64)
                t = i2Ti1.translation.astype(np.float64)
                xy = xy @ R.T + t * HOHO_S_ZIND_SCALE_FACTOR
            img_px = render_cfg.img_px
            half_m = int((img_px / 2) * render_cfg.meters_per_px)
            inside = (np.abs(xy[:, 0]) <= half_m) & (np.abs(xy[:, 1]) <= half_m)
            valid = valid & inside
            xy_img = np.round((xy + half_m) / render_cfg.meters_per_px).astype(np.int64)
            xy_img = np.clip(xy_img, 0, img_px)
            sparse, occupied = bev_ops.splat_zorder(
                jnp.asarray(xy_img), jnp.asarray(xyz[:, 2]),
                jnp.asarray(np.round(col * 255.0) / 255.0), jnp.asarray(valid),
                img_px + 1, img_px + 1,
            )
            sparse_u8 = np.clip(
                np.round(np.asarray(sparse) * 255.0), 0, 255
            ).astype(np.uint8)
            outs.append(qhull_oracle_fill(sparse_u8)[::-1])  # flipud like prod
        return outs

    def to_tuple_batch(imgs_4):
        """(ceil1, ceil2, floor1, floor2) u8 -> (1,4,R,R,3) u8 resized."""
        rs = [
            cv2.resize(im, (cfg.resize_w, cfg.resize_h), interpolation=cv2.INTER_LINEAR)
            for im in imgs_4
        ]
        return np.stack(rs)[None].astype(np.uint8)

    deltas, flips, rows = [], 0, []
    t0 = time.time()
    for n, (fp, i1, i2, label) in enumerate(hyps):
        if i1 not in id2idx or i2 not in id2idx:
            continue
        i2Ti1 = Sim2.from_json(fp)
        b1, b2 = id2idx[i1], id2idx[i2]
        prod, oracle = [], []
        for surface in ("ceiling", "floor"):
            p1, p2 = render_bev_pair(
                depths_mm[b1], rgbs[b1], depths_mm[b2], rgbs[b2],
                i2Ti1, surface, render_cfg,
            )
            prod += [p1, p2]
            o1, o2 = oracle_pair(i2Ti1, b1, b2, surface)
            oracle += [o1, o2]
        labels = np.zeros((1,), np.int32)
        m_p = eval_step(state, jnp.asarray(to_tuple_batch(prod)), labels)
        m_o = eval_step(state, jnp.asarray(to_tuple_batch(oracle)), labels)
        p1_prod = float(np.asarray(m_p["probs"])[0, 1])
        p1_orac = float(np.asarray(m_o["probs"])[0, 1])
        yh_prod = int(np.asarray(m_p["y_hat"])[0])
        yh_orac = int(np.asarray(m_o["y_hat"])[0])
        deltas.append(abs(p1_prod - p1_orac))
        flips += int(yh_prod != yh_orac)
        rows.append(dict(pair=Path(fp).name, label=label,
                         p1_prod=round(p1_prod, 4), p1_oracle=round(p1_orac, 4)))

    deltas = np.asarray(deltas)
    report = {
        "metric": "verifier_logit_drift_fill_scheme",
        "ckpt": ckpt,
        "n_pairs": int(len(deltas)),
        "mean_abs_dP1": round(float(deltas.mean()), 4),
        "p95_abs_dP1": round(float(np.percentile(deltas, 95)), 4),
        "max_abs_dP1": round(float(deltas.max()), 4),
        "argmax_flip_rate": round(flips / max(len(deltas), 1), 4),
        "wallclock_s": round(time.time() - t0, 1),
    }
    print(json.dumps(report))
    with open(out / "logit_drift.json", "w") as f:
        json.dump({**report, "pairs": rows}, f, indent=2)


if __name__ == "__main__":
    main()
