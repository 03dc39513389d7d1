"""Training hyperparameters (parity: salve/training_config.py:8).

Defaults follow the best released model's config
(salve/configs/1200ffbe47d836557d88fef052952337.yaml): ResNet-152, batch
256, 234->224 crops, adam + poly LR, ceiling+floor RGB modalities.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple


@dataclass
class TrainingConfig:
    """Model training hyperparameters for a single experiment."""

    lr_annealing_strategy: str = "poly"
    base_lr: float = 0.001
    weight_decay: float = 0.0001
    num_ce_classes: int = 2
    print_every: int = 10
    poly_lr_power: float = 0.9
    optimizer_algo: str = "adam"
    num_layers: int = 152
    pretrained: bool = True
    dataparallel: bool = True  # kept for config parity; mesh DP is always on
    resize_h: int = 234
    resize_w: int = 234
    train_h: int = 224
    train_w: int = 224
    apply_photometric_augmentation: bool = False
    # Per-batch inverse-frequency CE reweighting; off = reference parity
    # (plain CE, salve/train_utils.py:18). Used by fixture-scale runs where
    # the ~1:8 aligned:misaligned imbalance collapses small-batch training.
    class_balanced_loss: bool = False
    modalities: Tuple[str, ...] = ("ceiling_rgb_texture", "floor_rgb_texture")

    cfg_stem: str = ""
    num_epochs: int = 50
    workers: int = 15
    batch_size: int = 256

    data_root: str = ""
    layout_data_root: str = ""
    model_save_dirpath: str = ""
    gpu_ids: Optional[str] = None

    # TPU-specific additions (no reference analog).
    compute_dtype: str = "bfloat16"
    mesh_shape: Optional[Tuple[int, ...]] = None  # None -> all devices on one axis
    # Append explicit per-pair difference channels before the fusion stem
    # (models/early_fusion.py). Incompatible with converted reference
    # checkpoints (plain-stem shapes); used by from-scratch training.
    append_pair_difference: bool = False
    # RAM budget for the decoded-image dataset cache (dataset/bev_pairs.py):
    # when the resized uint8 corpus fits, epochs after the first skip disk
    # and JPEG decode. 0 disables. Oversized corpora auto-disable.
    decoded_cache_gb: float = 8.0
    # HBM budget for an on-device uint8 train corpus (training/
    # device_corpus.py): when the resized split fits, it is uploaded to the
    # mesh ONCE (sharded over 'data') and every batch is a local on-device
    # gather — epochs run at device speed instead of host-link speed.
    # 0 disables (host streaming). Oversized corpora fall back silently.
    device_corpus_gb: float = 0.0
    # Per-building split reassignment, {building_id: "train"|"val"|"test"}.
    # Overrides the official ZInD partition (dataset/zind_partition.py) for
    # cross-validation experiments (e.g. hold out a train-split building).
    # None/absent building ids keep their official split.
    split_overrides: Optional[Dict[str, str]] = None


def load_training_config(yaml_fpath: str) -> TrainingConfig:
    """Load a reference-format hydra YAML (TrainingConfig: {_target_, ...})."""
    import yaml

    with open(yaml_fpath, "r") as f:
        raw = yaml.safe_load(f)
    params = dict(raw["TrainingConfig"])
    params.pop("_target_", None)
    params = {k: v for k, v in params.items() if v is not None}
    if "modalities" in params:
        params["modalities"] = tuple(params["modalities"])
    known = set(TrainingConfig.__dataclass_fields__)
    return TrainingConfig(**{k: v for k, v in params.items() if k in known})
