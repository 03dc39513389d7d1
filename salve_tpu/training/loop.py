"""Training and evaluation epoch loops (parity: scripts/train.py, scripts/test.py).

The loop keeps the reference's behavioral contract — per-epoch train+val
metrics accumulated into a results dict, best-`val_mAcc` checkpointing,
results-JSON + config copy — while the compute runs as pjit-sharded steps
over the device mesh (batch on 'data', params replicated).
"""

from __future__ import annotations

import functools
import logging
import time
from collections import defaultdict
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from salve_tpu.dataset.bev_pairs import BEVPairDataset
from salve_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from salve_tpu.training import train as train_lib
from salve_tpu.training.config import TrainingConfig
from salve_tpu.training.meters import SegmentationAverageMeter
from salve_tpu.utils.io import save_json_file

logger = logging.getLogger(__name__)


@functools.lru_cache(maxsize=4)
def _make_metric_fold(num_classes: int):
    """Jitted fold of one step's outputs into a device-side accumulator.

    The epoch loop dispatches this right after each step, so the running
    loss/confusion-matrix lives ON the device and the host never blocks on
    per-step metric fetches (over the axon tunnel each fetch is a 0.2-0.5 s
    round trip — fetching every step caps training at ~3 steps/s no matter
    how fast the device step is). One fetch per log interval / epoch end.
    """

    def fold(acc, loss, probs, labels, valid):
        # `valid` masks wrap-around padding rows a DeviceCorpus adds to
        # equalize shards (device_corpus.py): without it the duplicated
        # examples are double-counted in the val confusion matrix every
        # epoch, biasing the val_mAcc best-checkpoint selection. The step
        # loss is a batch mean (per-example losses aren't exposed), so
        # loss_sum weights it by the valid count — exact when the batch has
        # no padding (all train steps), off by the duplicated examples'
        # contribution otherwise (<= mesh-1 examples per epoch).
        y_hat = jnp.argmax(probs, axis=1)
        w = valid.astype(jnp.int32)
        cm = jnp.zeros((num_classes, num_classes), jnp.int32)
        cm = cm.at[labels, y_hat].add(w)
        n_valid = w.sum()
        return {
            "cm": acc["cm"] + cm,
            "loss_sum": acc["loss_sum"] + loss * n_valid,
            "n": acc["n"] + n_valid,
        }

    return jax.jit(fold)


def _metrics_from_acc(acc) -> Tuple[float, float, List[float]]:
    """(avg_loss, mAcc, per-class accuracy) from a fetched accumulator.

    Same math as SegmentationAverageMeter.get_metrics (meters.py:64): the
    confusion matrix carries intersection (diagonal) and target histogram
    (row sums); mAcc averages per-class accuracy over all classes.
    """
    cm = np.asarray(acc["cm"], dtype=np.float64)
    inter = np.diag(cm)
    target = cm.sum(axis=1)
    accuracy_class = inter / (target + 1e-10)
    n = float(np.asarray(acc["n"]))
    avg_loss = float(np.asarray(acc["loss_sum"])) / max(n, 1.0)
    return avg_loss, float(np.mean(accuracy_class)), list(map(float, accuracy_class))


def run_epoch(
    cfg: TrainingConfig,
    epoch: int,
    state,
    step_fn,
    dataset: BEVPairDataset,
    split: str,
    rng: Optional[jax.Array] = None,
    max_batches: Optional[int] = None,
    mesh=None,
) -> Tuple[object, Dict[str, float]]:
    """One pass over a split. Returns (state, metrics dict).

    Every dispatch (batch gather, step, metric fold) is asynchronous; the
    only host sync points are the periodic log lines (every print_every
    batches — which also bounds how far the host can run ahead of the
    device) and the final accumulator fetch.
    """
    fold = _make_metric_fold(cfg.num_ce_classes)
    acc = {
        "cm": jnp.zeros((cfg.num_ce_classes, cfg.num_ce_classes), jnp.int32),
        "loss_sum": jnp.zeros((), jnp.float32),
        "n": jnp.zeros((), jnp.int32),
    }

    n_batches = 0
    t_start = time.time()
    # Bound host run-ahead independently of the logging interval: every
    # dispatch is asynchronous, and each in-flight gathered batch pins a
    # batch-sized uint8 buffer in HBM (~20+ MB at the 234px recipe), so a
    # large print_every would let the host queue multi-GB of transient
    # buffers. A cheap device-scalar fetch every `sync_every` steps drains
    # the queue to at most that many outstanding steps; the fetch latency
    # overlaps the device working through the queued window.
    sync_every = max(1, min(cfg.print_every, 32))
    for batch in dataset.iter_batches(
        cfg.batch_size, shuffle=(split == "train"), seed=epoch
    ):
        imgs, labels = batch[0], batch[1]
        # DeviceCorpus yields a 4th element masking its wrap-around shard
        # padding; host-streamed batches are all valid.
        valid = batch[3] if len(batch) > 3 else np.ones(len(labels), bool)
        if mesh is not None and imgs.shape[0] % mesh.size == 0:
            if isinstance(imgs, jax.Array):
                # DeviceCorpus batches arrive already sharded on the mesh;
                # only the host labels still need placing.
                labels, valid = shard_batch(mesh, (labels, valid))
            else:
                imgs, labels, valid = shard_batch(mesh, (imgs, labels, valid))
        if split == "train":
            rng, sub = jax.random.split(rng)
            state, metrics = step_fn(state, imgs, labels, sub)
        else:
            metrics = step_fn(state, imgs, labels)
        acc = fold(acc, metrics["loss"], metrics["probs"], labels, valid)
        n_batches += 1
        if n_batches % cfg.print_every == 0:
            avg_loss, mAcc, _ = _metrics_from_acc(acc)  # syncs to this step
            logger.info(
                "[%s] epoch %d batch %d loss %.4f mAcc %.4f (%.2fs/batch)",
                split, epoch, n_batches, avg_loss, mAcc,
                (time.time() - t_start) / n_batches,
            )
        elif n_batches % sync_every == 0:
            int(np.asarray(acc["n"]))  # backpressure sync only
        if max_batches is not None and n_batches >= max_batches:
            break

    avg_loss, mAcc, accuracy_class = (
        _metrics_from_acc(acc) if n_batches else (0.0, 0.0, [])
    )
    metrics_dict = {
        "avg_loss": avg_loss,
        "mAcc": mAcc,
        "class_accs": accuracy_class,
    }
    return state, metrics_dict


def train(
    cfg: TrainingConfig,
    seed: int = 0,
    max_batches_per_epoch: Optional[int] = None,
    resume_from: Optional[str] = None,
    finetune_from: Optional[str] = None,
) -> Dict[str, List[float]]:
    """Full training run (parity: scripts/train.py:40-116).

    resume_from restores params/batch_stats/opt_state from a checkpoint
    before the loop (the reference kept this hook commented out,
    scripts/train.py:54-58; implemented here) — for continuing the SAME
    run. finetune_from restores params/batch_stats only (fresh optimizer +
    LR schedule) — for short follow-on training over a grown corpus, where
    a full restore would start past the poly-LR horizon at lr=0.

    Returns the accumulated results dict (train_/val_ prefixed metrics).
    """
    if resume_from is not None and finetune_from is not None:
        raise ValueError(
            "resume_from and finetune_from are mutually exclusive: a full "
            "restore would resume past the new run's poly-LR horizon "
            "(lr=0, no learning) — pick one."
        )
    np.random.seed(0)

    mesh = make_mesh(cfg.mesh_shape)
    train_ds = BEVPairDataset("train", cfg, workers=cfg.workers)
    val_ds = BEVPairDataset("val", cfg, workers=cfg.workers)

    steps_per_epoch = max(len(train_ds) // cfg.batch_size, 1)
    max_iter = cfg.num_epochs * steps_per_epoch

    rng = jax.random.PRNGKey(seed)
    rng, init_rng = jax.random.split(rng)
    state = train_lib.create_train_state(cfg, init_rng, max_iter)
    if resume_from is not None:
        state = train_lib.load_model_checkpoint(resume_from, state)
        logger.info("Resumed training state from %s", resume_from)
    elif finetune_from is not None:
        state = train_lib.load_model_checkpoint(
            finetune_from, state, params_only=True
        )
        logger.info("Fine-tuning from %s (fresh optimizer)", finetune_from)

    # HBM-resident corpus: upload the train split once and gather batches
    # on device (training/device_corpus.py) — epochs then run at device
    # speed instead of host-link speed. Falls back to host streaming when
    # the split exceeds the budget or a batch can't split over the mesh.
    train_data, val_data = train_ds, val_ds
    budget_gb = float(getattr(cfg, "device_corpus_gb", 0.0) or 0.0)
    if budget_gb > 0 and len(train_ds) > 0:
        from salve_tpu.training import device_corpus as dc

        def _fits_one_step(ds) -> bool:
            # DeviceCorpus.iter_batches raises when a device's shard can't
            # fill even one per-device batch (device_corpus.py); a split
            # smaller than one mesh-wide batch must keep streaming from the
            # host, which handles partial batches (drop_last=False).
            per_dev = cfg.batch_size // mesh.size
            return -(-len(ds) // mesh.size) >= per_dev > 0

        est_train = dc.estimated_corpus_bytes(train_ds)
        est_val = dc.estimated_corpus_bytes(val_ds)
        if (
            est_train <= budget_gb * 1e9
            and cfg.batch_size % mesh.size == 0
            and _fits_one_step(train_ds)
        ):
            train_data = dc.DeviceCorpus(train_ds, mesh)
            # The val split rides along when the budget covers both: per-
            # epoch best-ckpt selection otherwise re-streams it every epoch.
            # (Device-corpus val drops the sub-batch tail — bounded metric
            # noise of < batch_size pairs out of the whole split.)
            if 0 < est_val <= budget_gb * 1e9 - est_train and _fits_one_step(val_ds):
                val_data = dc.DeviceCorpus(val_ds, mesh)
            elif len(val_ds) > 0:
                logger.warning(
                    "device_corpus: val split streams from host "
                    "(%.2f GB over remaining budget, or < one full step)",
                    est_val / 1e9,
                )
        else:
            logger.warning(
                "device_corpus disabled: corpus %.2f GB vs budget %.2f GB, "
                "batch %d vs mesh size %d, or split smaller than one step",
                est_train / 1e9, budget_gb, cfg.batch_size, mesh.size,
            )

    with mesh:
        state = replicate(mesh, state)
        train_step = train_lib.make_train_step(cfg)
        eval_step = train_lib.make_eval_step(cfg)

        results_dict: Dict[str, List[float]] = defaultdict(list)
        exp_start_time = time.strftime("%Y_%m_%d_%H_%M_%S")
        results_dir = f"{cfg.model_save_dirpath}/{exp_start_time}"

        for epoch in range(cfg.num_epochs):
            logger.info("On epoch %d", epoch)
            rng, epoch_rng = jax.random.split(rng)
            state, train_metrics = run_epoch(
                cfg, epoch, state, train_step, train_data, "train",
                rng=epoch_rng, max_batches=max_batches_per_epoch, mesh=mesh,
            )
            for k, v in train_metrics.items():
                results_dict[f"train_{k}"].append(v)

            if len(val_ds) > 0:
                _, val_metrics = run_epoch(
                    cfg, epoch, state, eval_step, val_data, "val",
                    max_batches=max_batches_per_epoch, mesh=mesh,
                )
            else:
                # No val-split buildings rendered (e.g. fixture-scale runs):
                # fall back to train metrics for checkpoint selection.
                logger.warning("val split is empty; selecting ckpt on train_mAcc")
                val_metrics = train_metrics
            for k, v in val_metrics.items():
                results_dict[f"val_{k}"].append(v)

            crit = results_dict["val_mAcc"]
            is_best = epoch == 0 or crit[-1] > max(crit[:-1])
            if is_best:
                train_lib.save_checkpoint(results_dir, state, epoch, crit[-1], cfg)
            save_json_file(
                f"{results_dir}/results-{exp_start_time}-{cfg.cfg_stem}.json",
                dict(results_dict),
            )
            train_lib.save_results_json(results_dir, dict(results_dict), cfg)
            logger.info("val_mAcc history: %s", [f"{v:.3f}" for v in crit])

    return dict(results_dict)


def evaluate(
    cfg: TrainingConfig,
    ckpt_fpath: str,
    split: str,
    serialization_save_dir: str,
    max_batches: Optional[int] = None,
) -> Tuple[float, float, float]:
    """Run inference over a split and serialize per-batch predictions.

    Parity: scripts/test.py:156-254 — each batch writes batch_{i}.json with
    {y_hat, y_true, y_hat_probs, fp0, fp1}; this is the Stage C -> Stage D
    interface contract.
    """
    from salve_tpu.training.meters import PrecisionRecallMeter

    mesh = make_mesh(cfg.mesh_shape)
    ds = BEVPairDataset(split, cfg, workers=cfg.workers)
    state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0), max_iter=1)
    state = train_lib.load_model_checkpoint(ckpt_fpath, state)

    pr_meter = PrecisionRecallMeter()
    sam = SegmentationAverageMeter()

    with mesh:
        state = replicate(mesh, state)
        eval_step = train_lib.make_eval_step(cfg)

        for batch_idx, (imgs, labels, tuples) in enumerate(
            ds.iter_batches(cfg.batch_size, shuffle=False)
        ):
            if imgs.shape[0] % mesh.size == 0:
                imgs, labels = shard_batch(mesh, (imgs, labels))
            metrics = eval_step(state, imgs, labels)
            y_hat = np.asarray(metrics["y_hat"])
            probs = np.asarray(metrics["probs"])

            labels_np = np.asarray(labels)
            pr_meter.update(labels_np, y_hat)
            sam.update_metrics(y_hat, labels_np, num_classes=cfg.num_ce_classes)

            n = y_hat.shape[0]
            save_json_file(
                f"{serialization_save_dir}/batch_{batch_idx}.json",
                {
                    "y_hat": y_hat.tolist(),
                    "y_true": labels_np.tolist(),
                    "y_hat_probs": probs[np.arange(n), y_hat].tolist(),
                    "fp0": [t[0] for t in tuples],
                    "fp1": [t[1] for t in tuples],
                },
            )
            if max_batches is not None and batch_idx + 1 >= max_batches:
                break

    prec, rec, mAcc = pr_meter.get_metrics()
    logger.info("%s split: prec %.3f rec %.3f mAcc %.3f", split, prec, rec, mAcc)
    return prec, rec, mAcc
