"""Tests for the pjit train/eval steps: overfit a tiny synthetic task."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from salve_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from salve_tpu.training import train as train_lib
from salve_tpu.training.config import TrainingConfig


def tiny_config(**overrides) -> TrainingConfig:
    base = dict(
        num_layers=18,
        resize_h=36,
        resize_w=36,
        train_h=32,
        train_w=32,
        batch_size=8,
        modalities=("floor_rgb_texture",),
        compute_dtype="float32",
        pretrained=False,
    )
    base.update(overrides)
    return TrainingConfig(**base)


def synthetic_batch(cfg, b=8, seed=0):
    """Class-separable images: label 1 -> bright, label 0 -> dark."""
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, 2, b).astype(np.int32)
    imgs = rng.uniform(0, 40, (b, 2, cfg.resize_h, cfg.resize_w, 3)).astype(np.float32)
    imgs += labels[:, None, None, None, None] * 180.0
    return imgs, labels


class TestTrainStep:
    def test_loss_decreases(self) -> None:
        cfg = tiny_config()
        state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0), max_iter=50)
        step = train_lib.make_train_step(cfg)
        imgs, labels = synthetic_batch(cfg)

        rng = jax.random.PRNGKey(1)
        losses = []
        for i in range(12):
            rng, sub = jax.random.split(rng)
            state, metrics = step(state, imgs, labels, sub)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0]
        assert float(metrics["accuracy"]) >= 0.8

    def test_eval_step_matches_train_distribution(self) -> None:
        cfg = tiny_config()
        state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0), max_iter=50)
        eval_step = train_lib.make_eval_step(cfg)
        imgs, labels = synthetic_batch(cfg)
        metrics = eval_step(state, imgs, labels)
        assert metrics["probs"].shape == (8, 2)
        assert metrics["y_hat"].shape == (8,)


class TestMeshDataParallel:
    def test_sharded_train_step(self) -> None:
        """Same step under an 8-device mesh with a data-sharded batch."""
        cfg = tiny_config(batch_size=16)
        mesh = make_mesh()
        assert mesh.size == 8  # conftest forces 8 virtual CPU devices
        state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0), max_iter=50)
        step = train_lib.make_train_step(cfg)
        imgs, labels = synthetic_batch(cfg, b=16)

        with mesh:
            state = replicate(mesh, state)
            imgs_d, labels_d = shard_batch(mesh, (imgs, labels))
            state, metrics = step(state, imgs_d, labels_d, jax.random.PRNGKey(2))
            assert np.isfinite(float(metrics["loss"]))

    def test_sharded_matches_single_device(self) -> None:
        """DP-sharded loss == unsharded loss on the same batch."""
        cfg = tiny_config(batch_size=16)
        imgs, labels = synthetic_batch(cfg, b=16)

        state1 = train_lib.create_train_state(cfg, jax.random.PRNGKey(0), max_iter=50)
        eval_step = train_lib.make_eval_step(cfg)
        loss_single = float(eval_step(state1, imgs, labels)["loss"])

        mesh = make_mesh()
        state2 = train_lib.create_train_state(cfg, jax.random.PRNGKey(0), max_iter=50)
        with mesh:
            state2 = replicate(mesh, state2)
            imgs_d, labels_d = shard_batch(mesh, (imgs, labels))
            loss_sharded = float(eval_step(state2, imgs_d, labels_d)["loss"])
        assert np.isclose(loss_single, loss_sharded, rtol=1e-4)


class TestCheckpoint:
    def test_save_and_load_roundtrip(self, tmp_path) -> None:
        cfg = tiny_config()
        state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0), max_iter=10)
        ckpt = train_lib.save_checkpoint(str(tmp_path), state, epoch=3, val_mAcc=0.9, cfg=cfg)

        fresh = train_lib.create_train_state(cfg, jax.random.PRNGKey(7), max_iter=10)
        restored = train_lib.load_model_checkpoint(ckpt, fresh)

        leaves_a = jax.tree_util.tree_leaves(state.params)
        leaves_b = jax.tree_util.tree_leaves(restored.params)
        for a, b in zip(leaves_a, leaves_b):
            assert np.allclose(np.asarray(a), np.asarray(b))


class TestOrbaxCheckpoint:
    def test_orbax_roundtrip(self, tmp_path) -> None:
        cfg = tiny_config()
        state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0), max_iter=10)
        ckpt = train_lib.save_checkpoint(
            str(tmp_path), state, epoch=1, val_mAcc=0.8, cfg=cfg, format="orbax"
        )
        import os

        assert os.path.isdir(ckpt)
        fresh = train_lib.create_train_state(cfg, jax.random.PRNGKey(9), max_iter=10)
        restored = train_lib.load_model_checkpoint(ckpt, fresh)
        for a, b in zip(
            jax.tree_util.tree_leaves(state.params),
            jax.tree_util.tree_leaves(restored.params),
        ):
            assert np.allclose(np.asarray(a), np.asarray(b))

    def test_orbax_full_state_resume_equivalence(self, tmp_path) -> None:
        """Mid-training orbax resume restores params, batch_stats, adam
        moments, AND step — and training continues identically (same depth
        of coverage as the msgpack path)."""
        cfg = tiny_config()
        rng = np.random.default_rng(0)
        n_imgs = 2 * len(cfg.modalities)
        imgs = jnp.asarray(
            rng.integers(
                0, 255, (2, n_imgs, cfg.resize_h, cfg.resize_w, 3)
            ).astype(np.float32)
        )
        labels = jnp.asarray(np.array([0, 1], np.int32))
        step_fn = train_lib.make_train_step(cfg)

        state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0), max_iter=10)
        for i in range(2):  # non-trivial adam moments + BN stats
            state, _ = step_fn(state, imgs, labels, jax.random.PRNGKey(i))
        ckpt = train_lib.save_checkpoint(
            str(tmp_path), state, epoch=2, val_mAcc=0.5, cfg=cfg, format="orbax"
        )

        fresh = train_lib.create_train_state(cfg, jax.random.PRNGKey(9), max_iter=10)
        restored = train_lib.load_model_checkpoint(ckpt, fresh)

        assert int(restored.step) == int(state.step)
        for tree_a, tree_b in (
            (state.params, restored.params),
            (state.batch_stats, restored.batch_stats),
            (state.opt_state, restored.opt_state),
        ):
            for a, b in zip(
                jax.tree_util.tree_leaves(tree_a), jax.tree_util.tree_leaves(tree_b)
            ):
                assert np.allclose(np.asarray(a), np.asarray(b)), "state leaf diverged"

        # One more step from each must agree (same rng, same data).
        state2, m_orig = step_fn(state, imgs, labels, jax.random.PRNGKey(42))
        restored2, m_rest = step_fn(restored, imgs, labels, jax.random.PRNGKey(42))
        assert np.allclose(float(m_orig["loss"]), float(m_rest["loss"]), atol=1e-6)
        for a, b in zip(
            jax.tree_util.tree_leaves(state2.params),
            jax.tree_util.tree_leaves(restored2.params),
        ):
            assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-6)


class TestFinetuneRestore:
    def test_params_only_restore_keeps_fresh_optimizer(self, tmp_path) -> None:
        """params_only restores weights but NOT step/opt moments — a full
        restore of a finished run into a shorter one would start past the
        poly-LR horizon at lr=0 and train nothing."""
        cfg = tiny_config()
        rng = np.random.default_rng(0)
        n_imgs = 2 * len(cfg.modalities)
        imgs = jnp.asarray(
            rng.integers(0, 255, (2, n_imgs, cfg.resize_h, cfg.resize_w, 3)).astype(
                np.float32
            )
        )
        labels = jnp.asarray(np.array([0, 1], np.int32))
        step_fn = train_lib.make_train_step(cfg)
        state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0), max_iter=10)
        state, _ = step_fn(state, imgs, labels, jax.random.PRNGKey(0))
        assert int(state.step) == 1
        ckpt = train_lib.save_checkpoint(str(tmp_path), state, 1, 0.5, cfg)

        fresh = train_lib.create_train_state(cfg, jax.random.PRNGKey(9), max_iter=10)
        tuned = train_lib.load_model_checkpoint(ckpt, fresh, params_only=True)
        assert int(tuned.step) == 0
        for a, b in zip(
            jax.tree_util.tree_leaves(state.params),
            jax.tree_util.tree_leaves(tuned.params),
        ):
            assert np.allclose(np.asarray(a), np.asarray(b))
        # Adam moments stay zeroed (fresh), unlike the full restore.
        mu_leaves = jax.tree_util.tree_leaves(tuned.opt_state)
        assert any(np.allclose(np.asarray(l), 0.0) for l in mu_leaves)


class TestPolySchedule:
    def test_matches_reference_formula(self) -> None:
        cfg = tiny_config(base_lr=0.01, poly_lr_power=0.9)
        sched = train_lib.make_poly_schedule(cfg, max_iter=100)
        for it in [0, 10, 50, 99]:
            expected = 0.01 * (1 - it / 100) ** 0.9
            assert np.isclose(float(sched(it)), expected, rtol=1e-6)
