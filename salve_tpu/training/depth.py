"""Depth-network training on ZInD layout-raycast supervision.

Fills the role of HoHoNet's training recipe with data the pipeline already
has: every ZInD pano carries GT room geometry + camera height, so
synthesize_depth_from_layout yields dense metric depth for supervision.
Loss is scale-aware log-depth L1 (robust to the long-tailed depth
distribution of indoor panos).
"""

from __future__ import annotations

from pathlib import Path
from typing import Iterator, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state

from salve_tpu.models.depth_net import PANO_H, PANO_W, PanoDepthNet


class DepthTrainState(train_state.TrainState):
    batch_stats: dict = None


def create_depth_train_state(
    rng: jax.Array,
    num_layers: int = 50,
    learning_rate: float = 1e-4,
    input_hw: Tuple[int, int] = (PANO_H, PANO_W),
) -> DepthTrainState:
    model = PanoDepthNet(num_layers=num_layers)
    variables = model.init(
        rng, jnp.zeros((1, input_hw[0], input_hw[1], 3)), train=False
    )
    return DepthTrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=optax.adam(learning_rate),
    )


def make_depth_train_step():
    """jitted step: (state, rgb (B,H,W,3), depth_gt (B,H,W), valid) -> state, loss."""

    def step(state: DepthTrainState, rgb, depth_gt, valid):
        def loss_fn(params):
            pred, new_state = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                rgb,
                train=True,
                mutable=["batch_stats"],
            )
            err = jnp.abs(jnp.log1p(pred) - jnp.log1p(depth_gt)) * valid
            loss = err.sum() / jnp.maximum(valid.sum(), 1.0)
            return loss, new_state

        (loss, new_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        state = state.apply_gradients(
            grads=grads, batch_stats=new_state["batch_stats"]
        )
        return state, loss

    return jax.jit(step, donate_argnums=(0,))


def collect_depth_examples(raw_dataset_dir: str, building_ids):
    """(img_fpath, pano, camera_height_m) triples for every GT pano available."""
    from salve_tpu.common import posegraph2d

    examples = []
    for bid in building_ids:
        try:
            floors = posegraph2d.compute_available_floors_for_building(
                bid, raw_dataset_dir
            )
        except (FileNotFoundError, KeyError):
            continue
        for floor_id in floors:
            pg = posegraph2d.get_gt_pose_graph(bid, floor_id, raw_dataset_dir)
            for i, pano in pg.nodes.items():
                img_fpath = f"{raw_dataset_dir}/{bid}/panos/{Path(pano.image_path).name}"
                examples.append((img_fpath, pano, pg.get_camera_height_m(i)))
    return examples


def load_depth_example(
    img_fpath: str,
    pano,
    cam_h: float,
    synthetic_rgb: bool = False,
    hw: Tuple[int, int] = (PANO_H, PANO_W),
    seed: int = 0,
    depth_cache_root: str = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """One (rgb f32, depth f32) supervision pair.

    ZInD layouts are ego-normalized (camera at height 1 unit), so metric room
    vertices are layout * camera_height_m — the raycast must see consistent
    units or wall depth would be off by the scale factor.

    With synthetic_rgb=True the pano image is ray-cast from the same layout
    (rendering/synthetic.py) instead of read from disk — this is how the
    depth net trains/evaluates in environments without the ZInD imagery.

    With depth_cache_root set, GT depth comes from the cached u16-mm PNG
    (the multi-room world depth materialize_synthetic_building writes, which
    sees through door portals) instead of the single-room layout raycast —
    use this with materialized synthetic datasets.
    """
    from salve_tpu.models.depth_net import synthesize_depth_from_layout
    from salve_tpu.rendering.synthetic import render_synthetic_pano

    h, w = hw
    verts_m = np.asarray(pano.room_vertices_local_2d, dtype=np.float64) * float(cam_h)
    if synthetic_rgb:
        out = render_synthetic_pano(
            verts_m, camera_height_m=cam_h, h=h, w=w, seed=seed
        )
        # RGB in [0,1]: the depth-model input contract everywhere
        # (depth/cache.py registered-producer contract; load_pano_rgb).
        return out["rgb"].astype(np.float32) / 255.0, out["depth"].astype(np.float32)
    from salve_tpu.rendering.bev_pair import load_pano_rgb

    rgb = load_pano_rgb(img_fpath)
    if depth_cache_root is not None:
        from salve_tpu.depth.cache import depth_fpath_for_pano

        building_id = Path(img_fpath).parent.parent.name
        depth_fpath = depth_fpath_for_pano(depth_cache_root, building_id, img_fpath)
        if Path(depth_fpath).exists():
            import imageio.v2 as imageio

            depth_mm = np.asarray(imageio.imread(depth_fpath))
            return rgb.astype(np.float32), depth_mm.astype(np.float32) / 1000.0
    # ZInD rooms: assume ceiling at ~2x camera height unless annotated.
    depth = synthesize_depth_from_layout(
        verts_m, camera_height_m=cam_h, ceiling_height_m=2 * cam_h, h=h, w=w
    )
    return rgb.astype(np.float32), depth.astype(np.float32)


# Prerendered synthetic supervision, keyed by (img_fpath, variant). Raycasting
# a 512x1024 pano against a many-edge layout costs ~1s on the single host
# core; caching a few texture variants makes multi-epoch training host-cheap.
_SYNTH_CACHE: dict = {}


def iter_layout_depth_batches(
    raw_dataset_dir: str,
    building_ids,
    batch_size: int,
    seed: int = 0,
    synthetic_rgb: bool = False,
    hw: Tuple[int, int] = (PANO_H, PANO_W),
    cache_variants: int = 0,
    depth_cache_root: str = None,
) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Yield (rgb, depth_gt, valid) batches from ZInD panos + layout raycasts.

    Depth GT comes from synthesize_depth_from_layout with the pano's GT room
    polygon and camera/ceiling heights. With synthetic_rgb=False, panos whose
    image is missing on disk are skipped; with synthetic_rgb=True every GT
    pano contributes (imagery is ray-cast, textures seeded per pano+epoch).
    cache_variants>0 memoizes that many texture variants per pano, with the
    epoch seed cycling through them.
    """
    rng = np.random.default_rng(seed)
    examples = collect_depth_examples(raw_dataset_dir, building_ids)
    if not synthetic_rgb:
        examples = [e for e in examples if Path(e[0]).exists()]

    order = rng.permutation(len(examples))
    batch_rgb, batch_depth = [], []
    for k in order:
        img_fpath, pano, cam_h = examples[k]
        if synthetic_rgb and cache_variants > 0:
            variant = seed % cache_variants
            key = (img_fpath, hw, variant)
            if key not in _SYNTH_CACHE:
                import zlib

                stable = zlib.crc32(img_fpath.encode())
                rgb, depth = load_depth_example(
                    img_fpath, pano, cam_h, synthetic_rgb=True, hw=hw,
                    seed=(stable ^ (variant * 7919)) & 0x7FFFFFFF,
                )
                _SYNTH_CACHE[key] = (
                    np.clip(rgb * 255.0 + 0.5, 0, 255).astype(np.uint8),
                    depth.astype(np.float16),
                )
            rgb_u8, depth_f16 = _SYNTH_CACHE[key]
            rgb = rgb_u8.astype(np.float32) / 255.0
            depth = depth_f16.astype(np.float32)
        else:
            rgb, depth = load_depth_example(
                img_fpath,
                pano,
                cam_h,
                synthetic_rgb=synthetic_rgb,
                hw=hw,
                seed=(seed * 100003 + int(k)) & 0x7FFFFFFF,
                depth_cache_root=depth_cache_root,
            )
        batch_rgb.append(rgb)
        batch_depth.append(depth)
        if len(batch_rgb) == batch_size:
            rgb_b = np.stack(batch_rgb)
            depth_b = np.stack(batch_depth)
            valid = np.isfinite(depth_b) & (depth_b > 0.1) & (depth_b < 64.0)
            yield rgb_b, depth_b, valid.astype(np.float32)
            batch_rgb, batch_depth = [], []


def evaluate_depth(
    predict_fn,
    raw_dataset_dir: str,
    building_ids,
    synthetic_rgb: bool = True,
    hw: Tuple[int, int] = (PANO_H, PANO_W),
    max_panos: int = None,
    seed: int = 999331,
    depth_cache_root: str = None,
) -> dict:
    """Depth-error metrics over held-out panos.

    predict_fn: (H,W,3) f32 RGB -> (H,W) f32 depth meters.
    Returns {'rmse_m', 'abs_rel', 'log10', 'delta1', 'n_panos'} over valid px.
    """
    examples = collect_depth_examples(raw_dataset_dir, building_ids)
    if not synthetic_rgb:
        examples = [e for e in examples if Path(e[0]).exists()]
    if max_panos is not None:
        examples = examples[:max_panos]

    sq_err = abs_rel = log10 = d1 = n = 0.0
    for k, (img_fpath, pano, cam_h) in enumerate(examples):
        rgb, gt = load_depth_example(
            img_fpath, pano, cam_h, synthetic_rgb=synthetic_rgb, hw=hw,
            seed=(seed + k), depth_cache_root=depth_cache_root,
        )
        pred = np.asarray(predict_fn(rgb), dtype=np.float64)
        gt = gt.astype(np.float64)
        valid = np.isfinite(gt) & (gt > 0.1) & (gt < 64.0) & (pred > 1e-3)
        p, g = pred[valid], gt[valid]
        sq_err += float(((p - g) ** 2).sum())
        abs_rel += float((np.abs(p - g) / g).sum())
        log10 += float(np.abs(np.log10(p) - np.log10(g)).sum())
        d1 += float((np.maximum(p / g, g / p) < 1.25).sum())
        n += float(valid.sum())
    n = max(n, 1.0)
    return {
        "rmse_m": float(np.sqrt(sq_err / n)),
        "abs_rel": float(abs_rel / n),
        "log10": float(log10 / n),
        "delta1": float(d1 / n),
        "n_panos": len(examples),
    }
