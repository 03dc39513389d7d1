"""Verifier train/eval steps and checkpointing.

Parity targets:
  * salve/train_utils.py:18 (cross_entropy_forward), :57 (poly LR),
    :163-226 (optimizer/model factories)
  * scripts/train.py:40-167 (epoch loop, best-val_mAcc checkpointing,
    results-JSON schema)

TPU-native design: one jitted train step consumes a (B, N, H, W, 3)
uint8/float batch, runs on-device augmentation, the bf16 forward/backward,
and the optax update; under a Mesh the same step is pjit-sharded with the
batch split over 'data' and params replicated (gradient psum inserted by
XLA — the DataParallel equivalent, minus the host gather).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict

import flax
import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from salve_tpu.models.early_fusion import EarlyFusionCEResnet, num_images_for_modalities
from salve_tpu.training import transforms
from salve_tpu.training.config import TrainingConfig


class TrainState(train_state.TrainState):
    """TrainState carrying batch-norm statistics."""

    batch_stats: Any = None


def make_poly_schedule(cfg: TrainingConfig, max_iter: int) -> optax.Schedule:
    """lr = base_lr * (1 - iter/max_iter)^power (train_utils.py:57)."""
    return optax.polynomial_schedule(
        init_value=cfg.base_lr,
        end_value=0.0,
        power=cfg.poly_lr_power,
        transition_steps=max_iter,
    )


def make_optimizer(cfg: TrainingConfig, max_iter: int) -> optax.GradientTransformation:
    """Adam with L2 weight decay folded into gradients (= torch Adam w/ wd)."""
    if cfg.optimizer_algo != "adam":
        raise RuntimeError(f"Unknown optimizer {cfg.optimizer_algo}")
    schedule = (
        make_poly_schedule(cfg, max_iter)
        if cfg.lr_annealing_strategy == "poly"
        else cfg.base_lr
    )
    return optax.chain(
        optax.add_decayed_weights(cfg.weight_decay),
        optax.adam(learning_rate=schedule),
    )


def build_model(cfg: TrainingConfig) -> EarlyFusionCEResnet:
    return EarlyFusionCEResnet(
        num_layers=cfg.num_layers,
        num_classes=cfg.num_ce_classes,
        modalities=tuple(cfg.modalities),
        compute_dtype=jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32,
        append_pair_difference=cfg.append_pair_difference,
    )


def create_train_state(
    cfg: TrainingConfig, rng: jax.Array, max_iter: int
) -> TrainState:
    """Initialize model params + optimizer state."""
    model = build_model(cfg)
    n_imgs = num_images_for_modalities(cfg.modalities)
    dummy = [jnp.zeros((1, cfg.train_h, cfg.train_w, 3)) for _ in range(n_imgs)]
    variables = model.init(rng, dummy, train=False)
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=make_optimizer(cfg, max_iter),
    )


def _split_images(batch_imgs: jnp.ndarray):
    """(B, N, H, W, 3) -> list of N (B, H, W, 3) images for the model."""
    return [batch_imgs[:, i] for i in range(batch_imgs.shape[1])]


def make_train_step(cfg: TrainingConfig):
    """Returns jitted train_step(state, imgs, labels, rng) -> (state, metrics).

    imgs: (B, N, resize_h, resize_w, 3) float32 in [0,255] (pre-resize done
    at render/load time); labels: (B,) int32.
    """

    def train_step(state: TrainState, imgs, labels, rng):
        imgs = transforms.augment_train(
            rng,
            imgs,
            cfg.train_h,
            cfg.train_w,
            photometric=cfg.apply_photometric_augmentation,
        )

        def loss_fn(params):
            logits, new_model_state = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                _split_images(imgs),
                train=True,
                mutable=["batch_stats"],
            )
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
            if cfg.class_balanced_loss:
                # Reweight so each class contributes equally per batch —
                # aligned:misaligned hypotheses run ~1:8, and at fixture
                # scale (small batches) unweighted CE collapses to the
                # majority class. Off by default (reference parity:
                # salve/train_utils.py:18 uses plain CE).
                pos = labels == 1
                n_pos = jnp.maximum(jnp.sum(pos), 1)
                n_neg = jnp.maximum(jnp.sum(~pos), 1)
                w = jnp.where(pos, 0.5 / n_pos, 0.5 / n_neg)
                loss = jnp.sum(ce * w)
            else:
                loss = ce.mean()
            return loss, (logits, new_model_state)

        (loss, (logits, new_model_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        state = state.apply_gradients(
            grads=grads, batch_stats=new_model_state["batch_stats"]
        )
        probs = jax.nn.softmax(logits, axis=1)
        acc = jnp.mean(jnp.argmax(logits, axis=1) == labels)
        return state, {"loss": loss, "accuracy": acc, "probs": probs}

    return jax.jit(train_step, donate_argnums=(0,))


def make_eval_step(cfg: TrainingConfig):
    """Returns jitted eval_step(state, imgs, labels) -> metrics (no grad)."""

    def eval_step(state: TrainState, imgs, labels):
        imgs = transforms.preprocess_eval(imgs, cfg.train_h, cfg.train_w)
        logits = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            _split_images(imgs),
            train=False,
        )
        loss = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
        probs = jax.nn.softmax(logits, axis=1)
        y_hat = jnp.argmax(logits, axis=1)
        return {"loss": loss, "probs": probs, "y_hat": y_hat}

    return jax.jit(eval_step)


# ---------------------------------------------------------------------------
# Checkpointing (best-val_mAcc policy; scripts/train.py:84-111).
# ---------------------------------------------------------------------------


def save_checkpoint(
    save_dir: str,
    state: TrainState,
    epoch: int,
    val_mAcc: float,
    cfg: TrainingConfig,
    format: str = "flax",
) -> str:
    """Serialize {params, batch_stats, opt_state, epoch, val_mAcc} to disk.

    format="flax" writes a single msgpack blob; format="orbax" writes an
    orbax StandardCheckpointer directory (sharding-aware, async-capable —
    the production choice for multi-host runs).
    """
    os.makedirs(save_dir, exist_ok=True)
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    # Start every leaf's device->host copy before converting any of them:
    # serializing a leaf at a time pays one full link round trip per tensor
    # (~1.5k leaves for RN152 + adam), which over a high-latency link turns
    # one save into minutes; with the copies in flight it is one link-
    # bandwidth pass.
    for leaf in jax.tree_util.tree_leaves(payload):
        if hasattr(leaf, "copy_to_host_async"):
            leaf.copy_to_host_async()
    import numpy as np

    payload = jax.tree_util.tree_map(np.asarray, payload)
    if format == "orbax":
        import orbax.checkpoint as ocp

        ckpt_fpath = os.path.join(os.path.abspath(save_dir), "train_ckpt_orbax")
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(ckpt_fpath, payload, force=True)
    elif format == "flax":
        # Atomic write (tmp + rename): a crash or kill mid-save must never
        # leave a truncated checkpoint — a resume loop that picks the newest
        # ckpt would otherwise die on msgpack "incomplete input" forever
        # (observed when a SIGKILL landed during a best-val save).
        ckpt_fpath = os.path.join(save_dir, "train_ckpt.flax")
        tmp_fpath = ckpt_fpath + ".tmp"
        with open(tmp_fpath, "wb") as f:
            f.write(flax.serialization.to_bytes(payload))
        os.replace(tmp_fpath, ckpt_fpath)
    else:
        raise ValueError(f"Unknown checkpoint format {format}")
    meta = {
        "epoch": epoch,
        "val_mAcc": val_mAcc,
        "max_epochs": cfg.num_epochs,
        "num_layers": cfg.num_layers,
        "modalities": list(cfg.modalities),
    }
    with open(os.path.join(save_dir, "train_ckpt.meta.json"), "w") as f:
        json.dump(meta, f, indent=4)
    return ckpt_fpath


def load_model_checkpoint(
    ckpt_fpath: str, state: TrainState, params_only: bool = False
) -> TrainState:
    """Restore params/batch_stats/opt_state into a freshly-created state.

    Accepts a .flax msgpack file, an orbax checkpoint directory, or a
    reference torch ``.pth``/``.pt`` checkpoint (the 7 released SALVe
    verifier weights, reference README.md:195-203) — the latter is
    converted via models.torch_weights with a fresh optimizer state.

    params_only restores only params + batch_stats, keeping the fresh
    optimizer state and step 0 — the fine-tune entry point. A completed
    run's checkpoint carries step >= the new run's poly-LR horizon, so a
    FULL restore into a shorter run would clamp the learning rate to 0 and
    train nothing; fine-tuning must restart the schedule.
    """
    if ckpt_fpath.endswith((".pth", ".pt")):
        from salve_tpu.models.torch_weights import load_reference_checkpoint

        params, batch_stats = load_reference_checkpoint(ckpt_fpath)
        return state.replace(
            params=jax.tree_util.tree_map(jnp.asarray, params),
            batch_stats=jax.tree_util.tree_map(jnp.asarray, batch_stats),
        )
    template = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    if os.path.isdir(ckpt_fpath):
        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as ckptr:
            payload = ckptr.restore(os.path.abspath(ckpt_fpath), template)
    else:
        with open(ckpt_fpath, "rb") as f:
            payload = flax.serialization.from_bytes(template, f.read())
    if params_only:
        return state.replace(
            params=payload["params"], batch_stats=payload["batch_stats"]
        )
    return state.replace(
        params=payload["params"],
        batch_stats=payload["batch_stats"],
        opt_state=payload["opt_state"],
        step=payload["step"],
    )


def save_results_json(
    results_dir: str, results_dict: Dict[str, Any], cfg: TrainingConfig
) -> None:
    """Write per-epoch results JSON + config copy (scripts/train.py:109-111)."""
    os.makedirs(results_dir, exist_ok=True)
    with open(os.path.join(results_dir, "results-fields.json"), "w") as f:
        json.dump(results_dict, f, indent=4)
    from dataclasses import asdict

    with open(os.path.join(results_dir, "config.json"), "w") as f:
        json.dump({k: v for k, v in asdict(cfg).items()}, f, indent=4, default=str)
