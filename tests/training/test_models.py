"""Tests for the Flax early-fusion verifier."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from salve_tpu.models.early_fusion import (
    EarlyFusionCEResnet,
    num_images_for_modalities,
)
from salve_tpu.models.resnet import ResNet, get_resnet_feature_dim


class TestModalityArity:
    def test_arities(self) -> None:
        assert num_images_for_modalities(["layout"]) == 2
        assert num_images_for_modalities(["ceiling_rgb_texture"]) == 2
        assert num_images_for_modalities(["floor_rgb_texture"]) == 2
        assert (
            num_images_for_modalities(["ceiling_rgb_texture", "floor_rgb_texture"]) == 4
        )
        assert (
            num_images_for_modalities(
                ["ceiling_rgb_texture", "floor_rgb_texture", "layout"]
            )
            == 6
        )

    def test_invalid(self) -> None:
        with pytest.raises(ValueError):
            num_images_for_modalities(["layout", "ceiling_rgb_texture"])


class TestResNet:
    def test_feature_dims(self) -> None:
        assert get_resnet_feature_dim(18) == 512
        assert get_resnet_feature_dim(34) == 512
        assert get_resnet_feature_dim(50) == 2048
        assert get_resnet_feature_dim(152) == 2048

    def test_forward_resnet18(self) -> None:
        model = ResNet(num_layers=18, compute_dtype=jnp.float32)
        x = jnp.ones((2, 64, 64, 3))
        variables = model.init(jax.random.PRNGKey(0), x)
        feats = model.apply(variables, x)
        assert feats.shape == (2, 512)
        assert feats.dtype == jnp.float32


class TestEarlyFusion:
    def test_forward_pair(self) -> None:
        model = EarlyFusionCEResnet(
            num_layers=18,
            modalities=("floor_rgb_texture",),
            compute_dtype=jnp.float32,
        )
        imgs = [jnp.ones((2, 64, 64, 3))] * 2
        variables = model.init(jax.random.PRNGKey(0), imgs)
        logits = model.apply(variables, imgs)
        assert logits.shape == (2, 2)

    def test_widened_stem(self) -> None:
        """4-image fusion -> the stem conv consumes 12 input channels."""
        model = EarlyFusionCEResnet(
            num_layers=18,
            modalities=("ceiling_rgb_texture", "floor_rgb_texture"),
            compute_dtype=jnp.float32,
        )
        imgs = [jnp.ones((1, 64, 64, 3))] * 4
        variables = model.init(jax.random.PRNGKey(0), imgs)
        stem = variables["params"]["ResNet_0"]["conv_init"]["kernel"]
        assert stem.shape == (7, 7, 12, 64)

    def test_append_pair_difference_widens_stem(self) -> None:
        """Difference channels: 4 images + 2 diffs -> 18-channel stem, and
        the diff actually reaches the network (swapping one pair's images
        flips the diff sign and changes the logits)."""
        model = EarlyFusionCEResnet(
            num_layers=18,
            modalities=("ceiling_rgb_texture", "floor_rgb_texture"),
            compute_dtype=jnp.float32,
            append_pair_difference=True,
        )
        rng = jax.random.PRNGKey(0)
        keys = jax.random.split(rng, 4)
        imgs = [jax.random.normal(k, (1, 64, 64, 3)) for k in keys]
        variables = model.init(jax.random.PRNGKey(1), imgs)
        stem = variables["params"]["ResNet_0"]["conv_init"]["kernel"]
        assert stem.shape == (7, 7, 18, 64)
        l1 = model.apply(variables, imgs)
        l2 = model.apply(variables, [imgs[1], imgs[0], imgs[2], imgs[3]])
        assert not jnp.allclose(l1, l2)

    def test_wrong_arity_raises(self) -> None:
        model = EarlyFusionCEResnet(
            num_layers=18,
            modalities=("floor_rgb_texture",),
            compute_dtype=jnp.float32,
        )
        imgs = [jnp.ones((1, 64, 64, 3))] * 4
        with pytest.raises(ValueError):
            model.init(jax.random.PRNGKey(0), imgs)

    def test_batchnorm_train_mode_mutates_stats(self) -> None:
        model = EarlyFusionCEResnet(
            num_layers=18,
            modalities=("floor_rgb_texture",),
            compute_dtype=jnp.float32,
        )
        imgs = [jnp.ones((2, 32, 32, 3))] * 2
        variables = model.init(jax.random.PRNGKey(0), imgs)
        logits, new_state = model.apply(
            variables, imgs, train=True, mutable=["batch_stats"]
        )
        assert "batch_stats" in new_state
