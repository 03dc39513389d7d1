"""CLI-level released-artifact smokes (VERDICT r3 item 8).

The torch->Flax converters are unit-proven (tests/training/test_torch_weights.py,
tests/models/test_hohonet.py); these tests drive the WHOLE deployment path a
user of the reference's released weights would take:

  * a reference-format ResNet-152 `.pth` (scripts/train.py:97-107 layout,
    DataParallel `module.` prefixes) -> `cli/test.py` inference over rendered
    BEV fixtures -> batch_{i}.json predictions;
  * an ep60-format HoHoNet state dict -> `cli/batch_hohonet_inference.py
    --model_ckpt` on a fixture pano -> u16 mm depth PNG cache.

Weights are synthetic (no released checkpoint ships in this environment) but
the formats, CLIs, and file contracts are exactly the released-artifact ones.
"""

from __future__ import annotations

import importlib.util
import json
import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

_TESTS_DIR = Path(__file__).resolve().parent.parent


def _load_test_module(rel_path: str, name: str):
    spec = importlib.util.spec_from_file_location(name, _TESTS_DIR / rel_path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _write_bev_tuples(data_root: Path, building_id: str, label_type: str,
                      pair_indices, seed: int = 0) -> int:
    """Write 4-file (ceiling+floor x 2 panos) rendered tuples in the
    production filename grammar (rendering/bev_pair.py:bev_fname_from_img_fpath)."""
    import imageio.v2 as imageio

    out_dir = data_root / label_type / building_id
    out_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    n = 0
    for pair_idx in pair_indices:
        for surface in ("ceiling", "floor"):
            for pano in (1, 2):
                stem = f"floor_01_partial_room_01_pano_{pano}"
                fname = (
                    f"pair_{pair_idx}___door_0_0_identity_{surface}_rgb_{stem}.jpg"
                )
                imageio.imwrite(
                    str(out_dir / fname),
                    rng.integers(0, 255, (501, 501, 3), dtype=np.uint8),
                )
        n += 1
    return n


class TestReleasedVerifierCheckpointThroughTestCLI:
    def test_rn152_pth_to_batch_predictions(self, tmp_path) -> None:
        """Reference RN152 `.pth` (module.-prefixed) -> cli/test.py -> batch JSONs."""
        from click.testing import CliRunner

        from salve_tpu.cli.test import run_test

        tw = _load_test_module(
            "training/test_torch_weights.py", "_tw_smoke_helpers"
        )
        rng = np.random.default_rng(0)
        sd = tw.make_reference_state_dict(rng, n_imgs=4, num_layers=152)
        # Released checkpoints carry DataParallel's module. prefix
        # (salve/train_utils.py:214-216) inside the training-dict layout.
        sd = {f"module.{k}": v for k, v in sd.items()}
        ckpt_fpath = tmp_path / "rn152_release.pth"
        torch.save({"epoch": 50, "state_dict": sd, "max_epochs": 50}, ckpt_fpath)

        data_root = tmp_path / "bev"
        # 0010 is an official ZInD test-split id -> discovered by split="test".
        n_pos = _write_bev_tuples(data_root, "0010", "gt_alignment_approx", [0])
        n_neg = _write_bev_tuples(data_root, "0010", "incorrect_alignment", [0], seed=1)

        preds_dir = tmp_path / "preds"
        result = CliRunner().invoke(
            run_test,
            [
                "--ckpt_fpath", str(ckpt_fpath),
                "--data_root", str(data_root),
                "--split", "test",
                "--serialization_save_dir", str(preds_dir),
                "--batch_size", "2",
            ],
            catch_exceptions=False,
        )
        assert result.exit_code == 0, result.output
        batch_files = sorted(preds_dir.glob("batch_*.json"))
        assert batch_files, "no serialized predictions written"
        rows = 0
        for fpath in batch_files:
            d = json.load(open(fpath))
            assert set(d) >= {"y_hat", "y_true", "y_hat_probs", "fp0", "fp1"}
            for p in d["y_hat_probs"]:
                assert 0.0 <= p <= 1.0
            for fp in d["fp0"]:
                assert "0010" in fp
            rows += len(d["y_hat"])
        assert rows == n_pos + n_neg


class TestHoHoNetCheckpointThroughBatchInferenceCLI:
    def test_ep60_pth_to_depth_png_cache(self, tmp_path) -> None:
        """ep60-format state dict -> cli/batch_hohonet_inference -> u16 PNG."""
        import imageio.v2 as imageio
        from click.testing import CliRunner

        from salve_tpu.cli.batch_hohonet_inference import run_batch_hohonet_inference

        th = _load_test_module("models/test_hohonet.py", "_hoho_smoke_helpers")
        tm = th.HoHoNetDepthT().eval()
        th._randomize(tm, seed=2)
        ckpt_fpath = tmp_path / "ep60.pth"
        # The released artifact wraps the weights in a {"state_dict": ...}
        # training dict (salve/utils/infer_depth.py:28 loads it that way).
        torch.save({"state_dict": tm.state_dict()}, ckpt_fpath)

        raw = tmp_path / "zind"
        pano_dir = raw / "9999" / "panos"
        pano_dir.mkdir(parents=True)
        rng = np.random.default_rng(0)
        stem = "floor_01_partial_room_01_pano_3"
        imageio.imwrite(
            str(pano_dir / f"{stem}.jpg"),
            rng.integers(0, 255, (1024, 2048, 3), dtype=np.uint8),
        )

        depth_root = tmp_path / "depth"
        result = CliRunner().invoke(
            run_batch_hohonet_inference,
            [
                "--raw_dataset_dir", str(raw),
                "--depth_save_root", str(depth_root),
                "--building_id", "9999",
                "--model_ckpt", str(ckpt_fpath),
                # The synthetic mirror is built at the test resolution
                # (tests/models/test_hohonet.py HW); a real ep60 run keeps
                # the 512,1024 default.
                "--hohonet_input_hw", f"{th.HW[0]},{th.HW[1]}",
            ],
            catch_exceptions=False,
        )
        assert result.exit_code == 0, result.output
        assert "missing: 0" in result.output
        depth_fpath = depth_root / "9999" / f"{stem}.depth.png"
        assert depth_fpath.exists()
        depth = imageio.imread(str(depth_fpath))
        assert depth.dtype == np.uint16
        assert depth.shape == (512, 1024)
