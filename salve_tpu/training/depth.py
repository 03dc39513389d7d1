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


def iter_layout_depth_batches(
    raw_dataset_dir: str,
    building_ids,
    batch_size: int,
    seed: int = 0,
) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Yield (rgb, depth_gt, valid) batches from ZInD panos + layout raycasts.

    Depth GT comes from synthesize_depth_from_layout with the pano's GT room
    polygon and camera/ceiling heights; panos without GT layout are skipped.
    """
    from salve_tpu.common import posegraph2d
    from salve_tpu.models.depth_net import synthesize_depth_from_layout
    from salve_tpu.rendering.bev_pair import load_pano_rgb

    rng = np.random.default_rng(seed)
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
                if not Path(img_fpath).exists():
                    continue
                examples.append((img_fpath, pano, pg.get_camera_height_m(i)))

    order = rng.permutation(len(examples))
    batch_rgb, batch_depth = [], []
    for k in order:
        img_fpath, pano, cam_h = examples[k]
        rgb = load_pano_rgb(img_fpath)
        # ZInD rooms: assume ceiling at ~2x camera height unless annotated.
        depth = synthesize_depth_from_layout(
            pano.room_vertices_local_2d, camera_height_m=cam_h, ceiling_height_m=2 * cam_h
        )
        batch_rgb.append(rgb.astype(np.float32))
        batch_depth.append(depth.astype(np.float32))
        if len(batch_rgb) == batch_size:
            rgb_b = np.stack(batch_rgb)
            depth_b = np.stack(batch_depth)
            valid = np.isfinite(depth_b) & (depth_b > 0.1) & (depth_b < 64.0)
            yield rgb_b, depth_b, valid.astype(np.float32)
            batch_rgb, batch_depth = [], []
