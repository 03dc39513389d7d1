"""Torch checkpoint -> Flax parameter conversion for the verifier.

Lets users of the reference bring their trained weights with them:

- the 7 released SALVe verifier checkpoints (reference README.md:195-203;
  saved by scripts/train.py:97-107 as ``{"state_dict": model.state_dict()}``
  of an ``EarlyFusionCEResnet``), and
- any torchvision ResNet-{18,34,50,152} ImageNet state_dict, used to
  initialize the trunk when ``TrainingConfig.pretrained`` is set
  (parity: salve/models/resnet_factory.py:38-44 — torchvision
  ``pretrained=True``; this environment has no torchvision and no network,
  so weights must be supplied as a local ``.pth`` file).

Layout conversion rules (torch -> flax):
  conv weight  (O, I, kh, kw)  -> kernel (kh, kw, I, O)
  linear weight (out, in)      -> kernel (in, out)
  batchnorm weight/bias        -> scale/bias      (params)
  batchnorm running_mean/var   -> mean/var        (batch_stats)

The reference model keeps a vanilla torchvision trunk at ``resnet.`` and
replaces the stem conv + head at the top level (early_fusion.py:38-39):
``conv1`` is the widened 3*n_imgs-channel stem and ``fc`` the 2-class head;
``resnet.conv1``/``resnet.fc`` are present in the state_dict but unused.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np

from salve_tpu.models.resnet import RESNET_SPECS

__all__ = [
    "convert_early_fusion_state_dict",
    "convert_trunk_state_dict",
    "load_reference_checkpoint",
]


def _np(t: Any) -> np.ndarray:
    """Torch tensor / array-like -> float32 numpy (torch import not required)."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def _conv(sd: Mapping[str, Any], key: str) -> np.ndarray:
    return _np(sd[key]).transpose(2, 3, 1, 0)  # OIHW -> HWIO


def _bn(sd: Mapping[str, Any], prefix: str) -> Tuple[Dict, Dict]:
    params = {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}
    stats = {"mean": _np(sd[f"{prefix}.running_mean"]), "var": _np(sd[f"{prefix}.running_var"])}
    return params, stats


def _strip_prefixes(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """Drop DataParallel's ``module.`` wrapper (reference wraps the model in
    nn.DataParallel before saving, train_utils.py:214-216)."""
    return {(k[7:] if k.startswith("module.") else k): v for k, v in sd.items()}


def convert_trunk_state_dict(
    sd: Mapping[str, Any], num_layers: int, trunk_prefix: str = ""
) -> Tuple[Dict, Dict]:
    """Convert the ResNet trunk (layer1..layer4 + bn1) under ``trunk_prefix``.

    Returns (params, batch_stats) for our ``ResNet`` module EXCLUDING the
    stem conv (handled separately since the reference widens it).
    """
    block_kind, stage_sizes, _ = RESNET_SPECS[num_layers]
    block_name = "BasicBlock" if block_kind == "basic" else "BottleneckBlock"
    n_convs = 2 if block_kind == "basic" else 3

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    bn1_p, bn1_s = _bn(sd, f"{trunk_prefix}bn1")
    params["bn_init"], stats["bn_init"] = bn1_p, bn1_s

    block_idx = 0
    for stage, n_blocks in enumerate(stage_sizes, start=1):
        for j in range(n_blocks):
            t = f"{trunk_prefix}layer{stage}.{j}"
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            for c in range(n_convs):
                bp[f"Conv_{c}"] = {"kernel": _conv(sd, f"{t}.conv{c + 1}.weight")}
                bn_p, bn_s = _bn(sd, f"{t}.bn{c + 1}")
                bp[f"BatchNorm_{c}"], bs[f"BatchNorm_{c}"] = bn_p, bn_s
            if f"{t}.downsample.0.weight" in sd:
                bp["conv_proj"] = {"kernel": _conv(sd, f"{t}.downsample.0.weight")}
                bn_p, bn_s = _bn(sd, f"{t}.downsample.1")
                bp["norm_proj"], bs["norm_proj"] = bn_p, bn_s
            name = f"{block_name}_{block_idx}"
            params[name], stats[name] = bp, bs
            block_idx += 1

    return params, stats


def _widen_stem(kernel_rgb: np.ndarray, num_input_images: int) -> np.ndarray:
    """Tile a pretrained 3-channel stem kernel across image slots.

    Each of the n concatenated RGB images sees the ImageNet RGB filter,
    scaled by 1/n so the stem activation magnitude is preserved. (The
    reference leaves its widened stem randomly initialized; tiling is a
    strictly more informative start for the same architecture.)
    """
    tiled = np.concatenate([kernel_rgb] * num_input_images, axis=2)
    return tiled / float(num_input_images)


def convert_early_fusion_state_dict(
    sd: Mapping[str, Any], num_layers: int
) -> Tuple[Dict, Dict]:
    """Reference ``EarlyFusionCEResnet.state_dict()`` -> (params, batch_stats).

    The widened stem lives at ``conv1`` and the 2-class head at ``fc``
    (early_fusion.py:38-39); the trunk at ``resnet.``.
    """
    sd = _strip_prefixes(sd)
    trunk_p, trunk_s = convert_trunk_state_dict(sd, num_layers, trunk_prefix="resnet.")
    trunk_p["conv_init"] = {"kernel": _conv(sd, "conv1.weight")}
    params = {
        "ResNet_0": trunk_p,
        "fc": {
            "kernel": _np(sd["fc.weight"]).T,
            "bias": _np(sd["fc.bias"]),
        },
    }
    return params, {"ResNet_0": trunk_s}


def convert_torchvision_resnet_state_dict(
    sd: Mapping[str, Any],
    num_layers: int,
    num_input_images: int,
    num_classes: int = 2,
    rng_seed: int = 0,
) -> Tuple[Dict, Dict]:
    """Vanilla torchvision ImageNet state_dict -> early-fusion (params, batch_stats).

    The trunk is taken verbatim; the stem is tiled to 3*num_input_images
    channels; the 1000-class ImageNet head is replaced by a fresh
    ``num_classes`` head (LeCun-normal, zero bias) — mirroring what the
    reference's ``pretrained=True`` + fresh conv1/fc achieves.
    """
    sd = _strip_prefixes(sd)
    trunk_p, trunk_s = convert_trunk_state_dict(sd, num_layers, trunk_prefix="")
    stem = _conv(sd, "conv1.weight")  # (7,7,3,64)
    trunk_p["conv_init"] = {"kernel": _widen_stem(stem, num_input_images)}

    feature_dim = RESNET_SPECS[num_layers][2]
    rng = np.random.default_rng(rng_seed)
    fc_kernel = rng.normal(0.0, 1.0 / np.sqrt(feature_dim), (feature_dim, num_classes))
    params = {
        "ResNet_0": trunk_p,
        "fc": {"kernel": fc_kernel.astype(np.float32), "bias": np.zeros(num_classes, np.float32)},
    }
    return params, {"ResNet_0": trunk_s}


def load_reference_checkpoint(
    ckpt_fpath: str, num_layers: Optional[int] = None
) -> Tuple[Dict, Dict]:
    """Load a reference ``train_ckpt.pth`` into (params, batch_stats).

    Accepts either the full training checkpoint dict (``state_dict`` key,
    scripts/train.py:97-107) or a bare state_dict. ``num_layers`` is
    inferred from the trunk depth when not given.
    """
    import torch

    ckpt = torch.load(ckpt_fpath, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    sd = _strip_prefixes(sd)
    if num_layers is None:
        num_layers = _infer_num_layers(sd)
    return convert_early_fusion_state_dict(sd, num_layers)


def _infer_num_layers(sd: Mapping[str, Any]) -> int:
    """Infer trunk depth from block counts + block kind in the state_dict."""
    prefix = "resnet." if any(k.startswith("resnet.") for k in sd) else ""
    is_bottleneck = f"{prefix}layer1.0.conv3.weight" in sd
    n_layer3 = len({k.split(".")[1 + (prefix != "")] for k in sd if k.startswith(f"{prefix}layer3.")})
    if not is_bottleneck:
        return 18 if n_layer3 == 2 else 34
    return 50 if n_layer3 == 6 else 152
