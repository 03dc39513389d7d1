"""Early-fusion verifier CNN.

Parity: salve/models/early_fusion.py:11 (EarlyFusionCEResnet) — a ResNet
trunk whose stem conv is widened to accept 2/4/6 channel-concatenated RGB
renderings of a hypothesis pair, with a 2-class linear head. The number of
input images is determined by the modality set, exactly as the reference:

    {layout} | {ceiling_rgb_texture} | {floor_rgb_texture}     -> 2 images
    {ceiling_rgb_texture, floor_rgb_texture}                   -> 4 images
    {ceiling_rgb_texture, floor_rgb_texture, layout}           -> 6 images

TPU-native differences: NHWC channel-concat fusion (the channel dim is the
minor-most axis, so the widened stem conv still tiles cleanly onto the
MXU), bfloat16 activations, and no DataParallel — replication/sharding is
handled by the pjit train step in salve_tpu.parallel.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from salve_tpu.models.resnet import ResNet

_VALID_MODALITY_SETS = [
    ({"layout"}, 2),
    ({"ceiling_rgb_texture"}, 2),
    ({"floor_rgb_texture"}, 2),
    ({"ceiling_rgb_texture", "floor_rgb_texture"}, 4),
    ({"ceiling_rgb_texture", "floor_rgb_texture", "layout"}, 6),
]


def num_images_for_modalities(modalities: Sequence[str]) -> int:
    """Tuple arity (2/4/6 images) for a modality set (early_fusion.py:22-34)."""
    mset = set(modalities)
    for valid, n in _VALID_MODALITY_SETS:
        if mset == valid:
            return n
    raise ValueError(f"Unsupported modalities: {sorted(mset)}")


class EarlyFusionCEResnet(nn.Module):
    """Early-fusion model for a cross-entropy loss.

    Call with a tuple of (B,H,W,3) images; they are concatenated along the
    channel axis and pushed through the widened-stem trunk.
    """

    num_layers: int = 152
    num_classes: int = 2
    modalities: Tuple[str, ...] = ("ceiling_rgb_texture", "floor_rgb_texture")
    compute_dtype: Any = jnp.bfloat16
    # Append explicit (img_{2k} - img_{2k+1}) channels per image pair before
    # the stem. The verifier's decision is a comparison; giving the network
    # the subtraction directly removes the hardest thing a from-scratch
    # trunk must discover on its own. No reference analog (their trunk is
    # ImageNet-pretrained); OFF by default — released-checkpoint conversion
    # is only shape-compatible with the plain stem.
    append_pair_difference: bool = False

    @nn.compact
    def __call__(self, images: Sequence[jnp.ndarray], train: bool = False):
        expected = num_images_for_modalities(self.modalities)
        if len(images) != expected:
            raise ValueError(
                f"Modalities {self.modalities} require {expected} images, got {len(images)}"
            )
        images = list(images)
        if self.append_pair_difference:
            images += [
                images[i] - images[i + 1] for i in range(0, len(images), 2)
            ]
        x = jnp.concatenate(images, axis=-1)  # NHWC channel concat
        feats = ResNet(num_layers=self.num_layers, compute_dtype=self.compute_dtype)(
            x, train=train
        )
        logits = nn.Dense(self.num_classes, dtype=jnp.float32, name="fc")(feats)
        return logits
