"""Tests for on-device batched augmentation."""

import jax
import jax.numpy as jnp
import numpy as np

from salve_tpu.training import transforms


class TestAugmentTrain:
    def test_shapes(self) -> None:
        key = jax.random.PRNGKey(0)
        imgs = jnp.ones((3, 4, 40, 40, 3)) * 128.0
        out = transforms.augment_train(key, imgs, 32, 32)
        assert out.shape == (3, 4, 32, 32, 3)

    def test_tuple_consistent_crop_and_flip(self) -> None:
        """Every image of a tuple gets the same crop offset and flips."""
        key = jax.random.PRNGKey(42)
        b, n, h, w = 8, 4, 40, 40
        rng = np.random.default_rng(0)
        base = rng.uniform(0, 255, (b, 1, h, w, 3)).astype(np.float32)
        imgs = jnp.asarray(np.repeat(base, n, axis=1))  # identical within tuple
        out = np.asarray(transforms.augment_train(key, imgs, 32, 32))
        for i in range(1, n):
            assert np.allclose(out[:, 0], out[:, i])

    def test_randomness_across_samples(self) -> None:
        key = jax.random.PRNGKey(1)
        imgs = jnp.asarray(
            np.random.default_rng(0).uniform(0, 255, (4, 2, 40, 40, 3)).astype(np.float32)
        )
        out1 = np.asarray(transforms.augment_train(key, imgs, 32, 32))
        out2 = np.asarray(
            transforms.augment_train(jax.random.PRNGKey(2), imgs, 32, 32)
        )
        assert not np.allclose(out1, out2)


class TestPreprocessEval:
    def test_center_crop_and_normalize(self) -> None:
        imgs = jnp.ones((2, 2, 234, 234, 3)) * 255.0
        out = np.asarray(transforms.preprocess_eval(imgs, 224, 224))
        assert out.shape == (2, 2, 224, 224, 3)
        # (255 - mean)/std for R channel
        expected_r = (255 - 0.485 * 255) / (0.229 * 255)
        assert np.allclose(out[..., 0], expected_r, atol=1e-5)

    def test_deterministic(self) -> None:
        imgs = jnp.asarray(
            np.random.default_rng(0).uniform(0, 255, (1, 2, 34, 34, 3)).astype(np.float32)
        )
        out1 = np.asarray(transforms.preprocess_eval(imgs, 32, 32))
        out2 = np.asarray(transforms.preprocess_eval(imgs, 32, 32))
        assert np.array_equal(out1, out2)


class TestPhotometricShift:
    def test_range_preserved(self) -> None:
        key = jax.random.PRNGKey(0)
        imgs = jnp.asarray(
            np.random.default_rng(0).uniform(0, 255, (2, 2, 16, 16, 3)).astype(np.float32)
        )
        out = np.asarray(transforms.photometric_shift(key, imgs))
        assert out.min() >= 0.0 and out.max() <= 255.0
        assert not np.allclose(out, np.asarray(imgs))
