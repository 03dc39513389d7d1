"""Floor-level batched W/D/O alignment kernel (Stage A hot loop on device).

The reference's Stage A inner loop (salve/utils/wdo_alignment.py:107 inside
scripts/export_alignment_hypotheses.py:160-262) calls gtsam.Pose2.Align
once per (pair, wdo1, wdo2, configuration) — a Python->C++ round trip per
candidate, parallelized by forking one process per building. Here the FULL
(pair x wdo x wdo x configuration) product of a floor is evaluated in ONE
jitted call: the closed-form 2D Procrustes fit and the width-ratio test are
masked array ops over padded W/D/O tables.

The rotated configuration (WDO.get_rotated_version, endpoints swapped) is a
fixed index permutation of the 5-point outline, so both configurations ride
the same batch. W/D/O counts are padded to power-of-two buckets to bound
XLA compile count across floors.

GT mode's freespace-penetration check (polygon containment of interpolated
boundaries) remains host-side and runs only on the survivors — matching
the reference, which also only applies it in GT mode.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from salve_tpu.common.alignment_hypothesis import AlignmentHypothesis
from salve_tpu.common.pano_data import PanoData
from salve_tpu.geometry.point_alignment import fit_se2
from salve_tpu.geometry.sim2 import Sim2
from salve_tpu.hypotheses.wdo_alignment import (
    MIN_ALLOWED_GT_WDO_WIDTH_RATIO,
    MIN_ALLOWED_INFERRED_WDO_WIDTH_RATIO,
)

# Outline of a W/D/O is [p1, p1, p2, p2, p1] in 2D (polygon_vertices_local_3d
# dropped to xy); its rotated version [p2, p2, p1, p1, p2] is this gather:
_ROTATED_PERM = np.array([2, 3, 0, 1, 2])

_TYPES = ("door", "window", "opening")
# Parity: doors/openings try identity+rotated; windows identity only.
_NUM_CONFIGS = {"door": 2, "window": 1, "opening": 2}


def _bucket(n: int) -> int:
    """Round up to the next power of two (minimum 1) to bound compile count."""
    b = 1
    while b < n:
        b *= 2
    return b


def _pack_type(
    pano_dict: Dict[int, PanoData], pano_ids: List[int], attr: str, w_max: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Padded (P, w_max, 5, 2) outlines + (P, w_max) widths/valid for one type."""
    P = len(pano_ids)
    pts = np.zeros((P, w_max, 5, 2), dtype=np.float32)
    widths = np.ones((P, w_max), dtype=np.float32)
    valid = np.zeros((P, w_max), dtype=bool)
    for k, pid in enumerate(pano_ids):
        wdos = getattr(pano_dict[pid], attr) or []
        for w, wdo in enumerate(wdos[:w_max]):
            pts[k, w] = wdo.polygon_vertices_local_3d[:, :2]
            widths[k, w] = wdo.width
            valid[k, w] = True
    return pts, widths, valid


@functools.partial(jax.jit, static_argnames=("num_configs",))
def _product_se2_fits(
    pts1,      # (B, W, 5, 2) pano-1 outlines per edge
    w1,        # (B, W) widths
    v1,        # (B, W) valid
    pts2,      # (B, W, 5, 2)
    w2,
    v2,
    min_width_ratio,
    num_configs: int,
):
    """All (wdo1 x wdo2 x config) SE(2) fits + width masks for B edges.

    Returns R (B,W,W,C,2,2), t (B,W,W,C,2), valid (B,W,W,C).
    """
    B, W = pts1.shape[:2]

    # Configurations of pano-2 outlines: identity, then rotated.
    configs = [pts2]
    if num_configs == 2:
        configs.append(pts2[:, :, _ROTATED_PERM, :])
    p2 = jnp.stack(configs, axis=2)  # (B, W, C, 5, 2)

    # Broadcast product: a = pano2 (target frame), b = pano1 (source frame).
    a = p2[:, None, :, :, :, :]               # (B, 1, W, C, 5, 2)
    b = pts1[:, :, None, None, :, :]          # (B, W, 1, 1, 5, 2)
    a, b = jnp.broadcast_arrays(a, b)
    R, t = fit_se2(a, b)                      # i2Ti1 per candidate

    ratio = jnp.minimum(w1[:, :, None], w2[:, None, :]) / jnp.maximum(
        w1[:, :, None], w2[:, None, :]
    )
    ok = (
        v1[:, :, None]
        & v2[:, None, :]
        & (ratio >= min_width_ratio)
    )[..., None]  # (B, W, W, 1) -> broadcast over configs
    ok = jnp.broadcast_to(ok, R.shape[:4])
    return R, t, ok


def align_floor_pairs_batched(
    pano_dict: Dict[int, PanoData],
    pairs: List[Tuple[int, int]],
    use_inferred_wdos_layout: bool,
) -> Dict[Tuple[int, int], List[AlignmentHypothesis]]:
    """SE(2) alignment hypotheses for every pano pair of a floor, on device.

    Equivalent to calling wdo_alignment.align_rooms_by_wd(transform_type=SE2)
    per pair, minus the GT-mode freespace check (callers apply it to the
    survivors; see hypotheses/export.py).
    """
    if not pairs:
        return {}
    min_ratio = (
        MIN_ALLOWED_INFERRED_WDO_WIDTH_RATIO
        if use_inferred_wdos_layout
        else MIN_ALLOWED_GT_WDO_WIDTH_RATIO
    )

    out: Dict[Tuple[int, int], List[AlignmentHypothesis]] = {p: [] for p in pairs}
    pair_arr = np.asarray(pairs)

    for obj_type in _TYPES:
        attr = obj_type + "s"
        counts = [len(getattr(pd, attr) or []) for pd in pano_dict.values()]
        w_real = max(counts) if counts else 0
        if w_real == 0:
            continue
        w_max = _bucket(w_real)

        pano_ids = sorted(pano_dict.keys())
        id2row = {pid: k for k, pid in enumerate(pano_ids)}
        pts, widths, valid = _pack_type(pano_dict, pano_ids, attr, w_max)

        # Pad the edge dimension to a bucket as well, so compile count stays
        # O(#buckets^2) across a whole split rather than O(#floors).
        B = len(pairs)
        B_pad = _bucket(B)
        rows1 = np.array([id2row[i1] for i1, _ in pairs] + [0] * (B_pad - B))
        rows2 = np.array([id2row[i2] for _, i2 in pairs] + [0] * (B_pad - B))

        num_configs = _NUM_CONFIGS[obj_type]
        R, t, ok = _product_se2_fits(
            jnp.asarray(pts[rows1]),
            jnp.asarray(widths[rows1]),
            jnp.asarray(valid[rows1]),
            jnp.asarray(pts[rows2]),
            jnp.asarray(widths[rows2]),
            jnp.asarray(valid[rows2]),
            jnp.float32(min_ratio),
            num_configs,
        )
        R, t, ok = np.asarray(R)[:B], np.asarray(t)[:B], np.asarray(ok)[:B]

        config_names = ["identity", "rotated"][:num_configs]
        for e, (i1, i2) in enumerate(pairs):
            idxs = np.argwhere(ok[e])
            for wi, wj, c in idxs:
                out[(i1, i2)].append(
                    AlignmentHypothesis(
                        # The device product (f32) decides which candidates
                        # survive; the serialized transform itself is refit on
                        # host in f64 from the two W/D/O endpoints so outputs
                        # are bit-identical to the reference's per-candidate
                        # path (cost: a closed-form 2-point fit per survivor).
                        i2Ti1=_host_refit_se2(
                            pano_dict[i2], pano_dict[i1], attr, int(wj), int(wi),
                            config_names[c],
                        ),
                        wdo_alignment_object=obj_type,
                        i1_wdo_idx=int(wi),
                        i2_wdo_idx=int(wj),
                        configuration=config_names[c],
                    )
                )
    return out


def _host_refit_se2(
    pano2: PanoData, pano1: PanoData, attr: str, wj: int, wi: int, configuration: str
) -> Sim2:
    """f64 closed-form SE(2) refit of one surviving candidate (host path parity)."""
    from salve_tpu.geometry.point_alignment import align_points_SE2

    pano1_wd = getattr(pano1, attr)[wi]
    pano2_wd = getattr(pano2, attr)[wj]
    if configuration == "rotated":
        pano2_wd = pano2_wd.get_rotated_version()
    i2Ti1, _ = align_points_SE2(
        pano2_wd.polygon_vertices_local_3d[:, :2],
        pano1_wd.polygon_vertices_local_3d[:, :2],
    )
    return i2Ti1
