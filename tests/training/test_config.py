"""TrainingConfig loading tests (parity: reference tests/test_training_config.py).

The reference instantiates its hydra YAML into a TrainingConfig; ours parses
the identical on-disk format via load_training_config.
"""

from pathlib import Path

import pytest

from salve_tpu.training.config import TrainingConfig, load_training_config

_REF_CONFIGS = Path("/root/reference/salve/configs")
_OUR_CONFIGS = Path(__file__).resolve().parents[2] / "salve_tpu" / "configs"


@pytest.mark.skipif(not _REF_CONFIGS.exists(), reason="reference configs unavailable")
def test_load_reference_hydra_yaml() -> None:
    """A real reference hydra config parses into a TrainingConfig."""
    cfg = load_training_config(str(_REF_CONFIGS / "1200ffbe47d836557d88fef052952337.yaml"))
    assert isinstance(cfg, TrainingConfig)
    assert cfg.num_layers == 152
    assert cfg.num_ce_classes == 2
    assert cfg.train_h == 224 and cfg.train_w == 224
    assert cfg.modalities == ("ceiling_rgb_texture", "floor_rgb_texture")
    assert isinstance(cfg.modalities, tuple)  # hashable for jit static args


@pytest.mark.skipif(not _REF_CONFIGS.exists(), reason="reference configs unavailable")
def test_all_reference_configs_parse() -> None:
    """Every TrainingConfig-bearing reference YAML round-trips without error."""
    import yaml

    n_parsed = 0
    for fp in sorted(_REF_CONFIGS.glob("*.yaml")):
        with open(fp) as f:
            raw = yaml.safe_load(f)
        if not isinstance(raw, dict) or "TrainingConfig" not in raw:
            continue
        cfg = load_training_config(str(fp))
        assert isinstance(cfg, TrainingConfig)
        assert cfg.num_layers in (18, 34, 50, 152)
        n_parsed += 1
    assert n_parsed >= 3


def test_all_local_configs_parse() -> None:
    """Our shipped configs parse and carry valid modality sets."""
    valid_mods = {"ceiling_rgb_texture", "floor_rgb_texture", "layout"}
    n = 0
    for fp in sorted(_OUR_CONFIGS.glob("*.yaml")):
        cfg = load_training_config(str(fp))
        assert isinstance(cfg, TrainingConfig)
        assert set(cfg.modalities) <= valid_mods
        n += 1
    assert n >= 5
