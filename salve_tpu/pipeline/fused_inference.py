"""Fused Stage B+C inference: render and verify hypotheses on device.

For each hypothesis batch: render ceiling+floor texture-map pairs from the
HBM-resident pano bank, quantize to the uint8 domain the verifier was
trained on (JPG-decoded renders), resize to the eval resolution, and score
with the early-fusion CNN — all inside one dispatch chain, with no JPG
write/read and no host round trip of images. Output is the same
per-hypothesis (y_hat, prob) record Stage D consumes.

This has no reference analog: the reference materializes ~half a million
500x500 JPGs between Stage B and Stage C even at inference time
(scripts/render_dataset_bev.py -> scripts/test.py). The filesystem contract
remains available via the per-stage CLIs for training-data generation.
"""

from __future__ import annotations

import os
from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from salve_tpu.rendering.bev_pair import (
    BEVRenderConfig,
    HOHO_S_ZIND_SCALE_FACTOR,
    render_identity_batched,
    render_transformed_batched,
)
from salve_tpu.training import transforms
from salve_tpu.training.config import TrainingConfig


class ScoredHypothesis(NamedTuple):
    """Verifier verdict for one alignment hypothesis."""

    i1: int
    i2: int
    wdo_pair_uuid: str
    configuration: str
    y_hat: int
    prob: float  # probability of the predicted class


def _resize_imgs(imgs: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """(B, H, W, 3) bilinear resize."""
    b = imgs.shape[0]
    return jax.image.resize(imgs, (b, out_h, out_w, 3), method="linear")


def _make_score_body(
    state,
    cfg: TrainingConfig,
    render_cfg: BEVRenderConfig,
    use_warp_renders: bool = False,
):
    """The unjitted fused (render -> preprocess -> verify) batch body.

    The verifier must use modalities (ceiling_rgb_texture, floor_rgb_texture)
    — the 4-image early-fusion configuration.

    With use_warp_renders, the first two array arguments are the EXTENDED
    identity banks (ops/warp.py) instead of the raw depth/rgb banks, and
    pano 1's per-hypothesis render becomes one Sim(2) NN warp instead of a
    backproject+splat+fill (drift measured in
    tests/parity/test_warp_drift.py; A/B throughput in BENCH_NOTES.md).
    """
    if set(cfg.modalities) != {"ceiling_rgb_texture", "floor_rgb_texture"}:
        raise ValueError("Fused inference supports the ceiling+floor RGB verifier.")

    def score_batch(
        params, batch_stats, depths, rgbs, bank_ceil, bank_floor,
        i1_idx, i2_idx, rotations, translations,
    ):
        if use_warp_renders:
            # depths/rgbs hold the extended warp-source banks here.
            from salve_tpu.ops.warp import warp_bank_auto

            t_scaled = translations * HOHO_S_ZIND_SCALE_FACTOR
            ceil1 = warp_bank_auto(
                depths[i1_idx], rotations, t_scaled,
                render_cfg.img_px, render_cfg.meters_per_px,
            )
            floor1 = warp_bank_auto(
                rgbs[i1_idx], rotations, t_scaled,
                render_cfg.img_px, render_cfg.meters_per_px,
            )
        else:
            d1, c1 = depths[i1_idx], rgbs[i1_idx]

            # Pano 1 depends on the hypothesis transform: render per
            # hypothesis.
            ceil1 = render_transformed_batched(
                d1, c1, rotations, translations, (0.5, jnp.inf), render_cfg
            )
            floor1 = render_transformed_batched(
                d1, c1, rotations, translations, (-jnp.inf, -1.0), render_cfg
            )
        # Pano 2 is rendered in its own frame — hypothesis-independent, so
        # it comes from the precomputed per-pano identity bank (rendered
        # once per floor instead of once per hypothesis).
        ceil2, floor2 = bank_ceil[i2_idx], bank_floor[i2_idx]

        # uint8 -> float: match the training-data domain (quantized renders).
        imgs = [
            _resize_imgs(x.astype(jnp.float32), cfg.resize_h, cfg.resize_w)
            for x in (ceil1, ceil2, floor1, floor2)
        ]
        batch = jnp.stack(imgs, axis=1)  # (B, 4, resize_h, resize_w, 3)
        batch = transforms.preprocess_eval(batch, cfg.train_h, cfg.train_w)

        logits = state.apply_fn(
            {"params": params, "batch_stats": batch_stats},
            [batch[:, i] for i in range(4)],
            train=False,
        )
        probs = jax.nn.softmax(logits, axis=1)
        y_hat = jnp.argmax(logits, axis=1)
        return y_hat, probs[jnp.arange(probs.shape[0]), y_hat]

    return score_batch


def make_fused_score_fn(
    state,
    cfg: TrainingConfig,
    render_cfg: BEVRenderConfig,
    use_warp_renders: bool = False,
):
    """Single-device jitted fused scorer (see _make_score_body)."""
    return jax.jit(_make_score_body(state, cfg, render_cfg, use_warp_renders))


def make_fused_score_fn_sharded(
    state,
    cfg: TrainingConfig,
    render_cfg: BEVRenderConfig,
    mesh,
    axis_name: str = "data",
    use_warp_renders: bool = False,
):
    """Mesh-sharded fused scorer: hypotheses data-parallel over the chips.

    shard_map (not sharded jit) is the right SPMD story here: the batched
    z-order splat folds the batch into ONE flat scatter index space
    (ops/bev.py:splat_zorder_batched), which XLA cannot partition along the
    batch — under shard_map each device runs the unmodified single-chip
    program on its local hypothesis shard, with the pano/identity banks and
    verifier params replicated, and no collectives at all (the scale-out of
    the reference's per-pair Pool fan-out, scripts/render_dataset_bev.py:186
    and SURVEY section 2.8, ridden over ICI instead of process forks).
    """
    body = _make_score_body(state, cfg, render_cfg, use_warp_renders)
    rep = jax.sharding.PartitionSpec()
    dat = jax.sharding.PartitionSpec(axis_name)
    sharded = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(rep, rep, rep, rep, rep, rep, dat, dat, dat, dat),
        out_specs=(dat, dat),
        check_vma=False,
    )
    return jax.jit(sharded)


def resolve_warp_default() -> bool:
    """Warp-render default: ON for TPU backends, OFF elsewhere.

    Validated end-to-end (ACCURACY_r03.json warp_ab): on the held-out
    building the warp path's verifier metrics are within noise of direct
    renders (mAcc 0.869 vs 0.871, 99.3% label agreement) and the Stage-D
    reconstruction metrics are IDENTICAL at both tested operating points —
    at 15x the direct fused path's throughput (BENCH). Direct renders stay
    the default off-TPU and for the file-contract renderer.
    SALVE_TPU_DISABLE_WARP=1 forces direct everywhere.
    """
    # Parse the value, not just presence: "0"/"false"/"" keep warp ON.
    disable = os.environ.get("SALVE_TPU_DISABLE_WARP", "").strip().lower()
    return jax.default_backend() == "tpu" and disable not in (
        "1", "true", "yes", "on",
    )


def score_floor_hypotheses(
    state,
    cfg: TrainingConfig,
    depths: np.ndarray,
    rgbs: np.ndarray,
    pano_id_to_bank_row: Dict[int, int],
    hypotheses: List[Tuple[int, int, object]],
    batch_size: int = 32,
    render_cfg: BEVRenderConfig = BEVRenderConfig(),
    mesh=None,
    use_warp_renders: Optional[bool] = None,
) -> List[ScoredHypothesis]:
    """Score every (i1, i2, AlignmentHypothesis) of a floor on device.

    Args:
        state: trained verifier TrainState (params + batch_stats).
        depths: (P,512,1024) depth bank; rgbs: (P,512,1024,3) in [0,1].
        pano_id_to_bank_row: pano ID -> bank row.
        hypotheses: (i1, i2, AlignmentHypothesis) triples.
        batch_size: hypotheses per device batch (global across the mesh).
        mesh: optional jax.sharding.Mesh — shards each batch over its
            'data' axis (make_fused_score_fn_sharded); None = one device.
        use_warp_renders: render pano 1 per hypothesis as a Sim(2) NN warp
            of an extended identity bank (ops/warp.py) instead of a fresh
            splat — per-floor fixed cost up, per-hypothesis cost way down.
            None (default) = ON for TPU backends, OFF elsewhere — the warp
            path is 15x the direct fused path and its verifier/
            reconstruction outputs A/B'd within noise on the held-out
            building (ACCURACY_r03.json warp_ab). Override with
            SALVE_TPU_DISABLE_WARP=1 or an explicit False.
    """
    from salve_tpu.utils import profiler

    if not hypotheses:
        return []
    if use_warp_renders is None:
        use_warp_renders = resolve_warp_default()
    if mesh is not None:
        if batch_size % mesh.size != 0:
            raise ValueError(
                f"batch_size {batch_size} not divisible by mesh size {mesh.size}"
            )
        score_batch = make_fused_score_fn_sharded(
            state, cfg, render_cfg, mesh, use_warp_renders=use_warp_renders
        )
    else:
        score_batch = make_fused_score_fn(
            state, cfg, render_cfg, use_warp_renders=use_warp_renders
        )
    depths_d = jnp.asarray(depths)
    rgbs_d = jnp.asarray(rgbs)

    # Identity-frame BEV bank: one render per pano per surface for the whole
    # floor (hypotheses typically outnumber panos by orders of magnitude).
    with profiler.stage_timer("fused/identity_bank"):
        bank_ceil = render_identity_batched(depths_d, rgbs_d, (0.5, jnp.inf), render_cfg)
        bank_floor = render_identity_batched(depths_d, rgbs_d, (-jnp.inf, -1.0), render_cfg)

    if use_warp_renders:
        from salve_tpu.ops.warp import pack_rgb888, render_identity_bank_extended

        # Extended warp-source banks (packed rgb888 i32: one gather per
        # cell, no per-batch packing) replace the raw depth/rgb banks in
        # the score body's first two slots (same arity, so the sharded
        # in_specs are unchanged).
        with profiler.stage_timer("fused/warp_bank"):
            bank_px = 2 * render_cfg.img_px  # double the target extent
            ext_ceil = pack_rgb888(
                render_identity_bank_extended(
                    depths_d, rgbs_d, (0.5, jnp.inf), render_cfg, bank_px=bank_px
                )
            )
            ext_floor = pack_rgb888(
                render_identity_bank_extended(
                    depths_d, rgbs_d, (-jnp.inf, -1.0), render_cfg,
                    bank_px=bank_px,
                )
            )
            depths_d, rgbs_d = ext_ceil, ext_floor

    results: List[ScoredHypothesis] = []
    for start in range(0, len(hypotheses), batch_size):
        chunk = hypotheses[start : start + batch_size]
        pad = batch_size - len(chunk)
        chunk_p = chunk + [chunk[-1]] * pad

        i1_idx = jnp.asarray([pano_id_to_bank_row[h[0]] for h in chunk_p])
        i2_idx = jnp.asarray([pano_id_to_bank_row[h[1]] for h in chunk_p])
        rotations = jnp.asarray(
            np.stack([h[2].i2Ti1.rotation for h in chunk_p]).astype(np.float32)
        )
        translations = jnp.asarray(
            np.stack([h[2].i2Ti1.translation for h in chunk_p]).astype(np.float32)
        )

        with profiler.stage_timer("fused/score_batch"):
            y_hat, prob = score_batch(
                state.params, state.batch_stats, depths_d, rgbs_d,
                bank_ceil, bank_floor, i1_idx, i2_idx, rotations, translations,
            )
            y_hat, prob = np.asarray(y_hat), np.asarray(prob)
        for k, (i1, i2, ah) in enumerate(chunk):
            results.append(
                ScoredHypothesis(
                    i1=i1,
                    i2=i2,
                    wdo_pair_uuid=f"{ah.wdo_alignment_object}_{ah.i1_wdo_idx}_{ah.i2_wdo_idx}",
                    configuration=ah.configuration,
                    y_hat=int(y_hat[k]),
                    prob=float(prob[k]),
                )
            )
    return results
