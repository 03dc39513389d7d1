"""Tests for BEV-pair dataset discovery (filename-grammar parity)."""

import numpy as np
import pytest

from salve_tpu.dataset import bev_pairs
from salve_tpu.training.config import TrainingConfig


class TestFilenameParsing:
    def test_pair_idx(self) -> None:
        fp = "x/pair_58___door_0_0_rotated_ceiling_rgb_floor_01_partial_room_07_pano_8.jpg"
        assert bev_pairs.pair_idx_from_fpath(fp) == 58

    def test_pano_id(self) -> None:
        fp = "x/pair_58___door_0_0_rotated_ceiling_rgb_floor_01_partial_room_07_pano_8.jpg"
        assert bev_pairs.pano_id_from_fpath(fp) == 8


class TestTupleGrouping:
    def test_reference_fixture_files(self, ref_test_data) -> None:
        """The real 4-file fixture pair groups into one ceiling-first tuple."""
        import glob

        fpaths = glob.glob(
            str(ref_test_data / "Renderings/gt_alignment_approx/1208/*.jpg")
        )
        assert len(fpaths) == 4
        cfg = TrainingConfig()
        tuples = bev_pairs.get_tuples_from_fpath_list(fpaths, label_idx=1, args=cfg)
        assert len(tuples) == 1
        fp1c, fp2c, fp1f, fp2f, label = tuples[0]
        assert "_ceiling_rgb_" in fp1c and "_ceiling_rgb_" in fp2c
        assert "_floor_rgb_" in fp1f and "_floor_rgb_" in fp2f
        assert label == 1
        assert bev_pairs.pano_id_from_fpath(fp1c) != bev_pairs.pano_id_from_fpath(fp2c)

    def test_incomplete_pair_skipped(self) -> None:
        cfg = TrainingConfig()
        fpaths = ["a/pair_3___door_0_0_identity_ceiling_rgb_floor_01_pano_1.jpg"]
        assert bev_pairs.get_tuples_from_fpath_list(fpaths, 1, cfg) == []

    def test_single_modality(self) -> None:
        cfg = TrainingConfig(modalities=("floor_rgb_texture",))
        fpaths = [
            "a/pair_3___door_0_0_identity_ceiling_rgb_floor_01_pano_1.jpg",
            "a/pair_3___door_0_0_identity_ceiling_rgb_floor_01_pano_2.jpg",
            "a/pair_3___door_0_0_identity_floor_rgb_floor_01_pano_1.jpg",
            "a/pair_3___door_0_0_identity_floor_rgb_floor_01_pano_2.jpg",
        ]
        tuples = bev_pairs.get_tuples_from_fpath_list(fpaths, 0, cfg)
        assert len(tuples) == 1
        fp1, fp2, label = tuples[0]
        assert "_floor_rgb_" in fp1 and "_floor_rgb_" in fp2
        assert label == 0


class TestMakeDataset:
    def test_synthetic_tree(self, tmp_path) -> None:
        """Synthetic directory tree with the reference grammar is discovered."""
        import cv2

        from salve_tpu.dataset.zind_partition import DATASET_SPLITS

        b = sorted(DATASET_SPLITS["train"])[0]
        for label_dir in ["gt_alignment_approx", "incorrect_alignment"]:
            d = tmp_path / label_dir / b
            d.mkdir(parents=True)
            for surface in ["ceiling", "floor"]:
                for pano in [1, 2]:
                    fp = d / f"pair_0___door_0_0_identity_{surface}_rgb_floor_01_pano_{pano}.jpg"
                    cv2.imwrite(str(fp), np.zeros((8, 8, 3), np.uint8))

        cfg = TrainingConfig(resize_h=16, resize_w=16)
        data_list = bev_pairs.make_dataset("train", str(tmp_path), cfg)
        assert len(data_list) == 2
        labels = sorted(t[-1] for t in data_list)
        assert labels == [0, 1]

        ds = bev_pairs.BEVPairDataset("train", cfg, data_root=str(tmp_path), workers=2)
        imgs, labels_arr, tuples = ds.load_batch([0, 1])
        assert imgs.shape == (2, 4, 16, 16, 3)
        assert set(labels_arr.tolist()) == {0, 1}

    def test_decoded_cache(self, tmp_path) -> None:
        """The in-RAM decoded cache serves repeat epochs without re-decoding
        and is bit-identical to the uncached path; a zero budget disables it."""
        import cv2

        from salve_tpu.dataset.zind_partition import DATASET_SPLITS

        b = sorted(DATASET_SPLITS["train"])[0]
        d = tmp_path / "gt_alignment_approx" / b
        d.mkdir(parents=True)
        rng = np.random.default_rng(0)
        for pair in range(3):
            for surface in ["ceiling", "floor"]:
                for pano in [1, 2]:
                    fp = d / f"pair_{pair}___door_0_0_identity_{surface}_rgb_floor_01_pano_{pano}.jpg"
                    cv2.imwrite(str(fp), rng.integers(0, 255, (32, 32, 3)).astype(np.uint8))

        cfg = TrainingConfig(resize_h=16, resize_w=16, decoded_cache_gb=1.0)
        ds = bev_pairs.BEVPairDataset("train", cfg, data_root=str(tmp_path), workers=2)
        assert ds._cache is not None
        imgs1, labels1, _ = ds.load_batch([0, 2, 1])
        assert set(ds._cache) == {0, 1, 2}
        imgs2, labels2, _ = ds.load_batch([0, 2, 1])
        np.testing.assert_array_equal(imgs1, imgs2)
        np.testing.assert_array_equal(labels1, labels2)

        cfg0 = TrainingConfig(resize_h=16, resize_w=16, decoded_cache_gb=0.0)
        ds0 = bev_pairs.BEVPairDataset("train", cfg0, data_root=str(tmp_path), workers=2)
        assert ds0._cache is None
        imgs0, _, _ = ds0.load_batch([0, 2, 1])
        np.testing.assert_array_equal(imgs0, imgs1)

    def test_split_overrides(self, tmp_path) -> None:
        """split_overrides reassigns buildings across splits (cross-validation
        flips, config.py:split_overrides); unlisted buildings keep the
        official partition."""
        import cv2

        from salve_tpu.dataset.zind_partition import DATASET_SPLITS

        b_train = sorted(DATASET_SPLITS["train"])[0]  # officially train
        b_test = sorted(DATASET_SPLITS["test"])[0]  # officially test
        for b in [b_train, b_test]:
            d = tmp_path / "gt_alignment_approx" / b
            d.mkdir(parents=True)
            for surface in ["ceiling", "floor"]:
                for pano in [1, 2]:
                    fp = d / f"pair_0___door_0_0_identity_{surface}_rgb_floor_01_pano_{pano}.jpg"
                    cv2.imwrite(str(fp), np.zeros((8, 8, 3), np.uint8))

        # No overrides: official partition applies.
        cfg = TrainingConfig()
        assert len(bev_pairs.make_dataset("train", str(tmp_path), cfg)) == 1
        assert len(bev_pairs.make_dataset("test", str(tmp_path), cfg)) == 1

        # Flip: the train building becomes test and vice versa.
        cfg = TrainingConfig(
            split_overrides={b_train: "test", b_test: "train"}
        )
        train_list = bev_pairs.make_dataset("train", str(tmp_path), cfg)
        test_list = bev_pairs.make_dataset("test", str(tmp_path), cfg)
        assert len(train_list) == len(test_list) == 1
        assert f"/{b_test}/" in train_list[0][0]
        assert f"/{b_train}/" in test_list[0][0]

        # One-sided override: the other building keeps its official split.
        cfg = TrainingConfig(split_overrides={b_train: "test"})
        assert len(bev_pairs.make_dataset("train", str(tmp_path), cfg)) == 0
        assert len(bev_pairs.make_dataset("test", str(tmp_path), cfg)) == 2
