"""Train-step smoke for every modality arity (2/4/6 images)."""

import jax
import numpy as np
import pytest

from salve_tpu.training import train as train_lib
from salve_tpu.training.config import TrainingConfig


@pytest.mark.parametrize(
    "modalities,n_imgs",
    [
        (("layout",), 2),
        (("ceiling_rgb_texture", "floor_rgb_texture"), 4),
        (("ceiling_rgb_texture", "floor_rgb_texture", "layout"), 6),
    ],
)
def test_train_step_all_arities(modalities, n_imgs) -> None:
    cfg = TrainingConfig(
        num_layers=18,
        resize_h=36,
        resize_w=36,
        train_h=32,
        train_w=32,
        batch_size=4,
        modalities=modalities,
        compute_dtype="float32",
    )
    state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0), max_iter=10)
    # Widened stem: 3 channels per fused image.
    stem = state.params["ResNet_0"]["conv_init"]["kernel"]
    assert stem.shape[2] == 3 * n_imgs

    step = train_lib.make_train_step(cfg)
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (4, n_imgs, 36, 36, 3)).astype(np.uint8)
    labels = rng.integers(0, 2, 4).astype(np.int32)
    state, metrics = step(state, imgs, labels, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))

    eval_step = train_lib.make_eval_step(cfg)
    out = eval_step(state, imgs, labels)
    assert out["probs"].shape == (4, 2)
