"""DeviceCorpus: HBM-resident corpus + per-shard sampling (training/device_corpus.py).

Runs on the 8-device virtual CPU mesh from tests/conftest.py, so the
shard_map gather and the DistributedSampler-style per-shard permutation are
exercised with real multi-device sharding.
"""

import glob

import numpy as np
import pytest

import jax

from salve_tpu.parallel.mesh import make_mesh
from salve_tpu.training.config import TrainingConfig
from salve_tpu.training.device_corpus import (
    DeviceCorpus,
    estimated_corpus_bytes,
)


class FakeDataset:
    """Stands in for BEVPairDataset: index i renders as constant pixel i%251."""

    def __init__(self, n, n_imgs=2, h=8, w=8):
        self.args = TrainingConfig(resize_h=h, resize_w=w)
        self.data_list = [
            (f"img_{i}_a.jpg", f"img_{i}_b.jpg", i % 2) for i in range(n)
        ]
        self.n_imgs = n_imgs

    def __len__(self):
        return len(self.data_list)

    def _load_tuples(self, tuples):
        a = self.args
        out = np.empty(
            (len(tuples), self.n_imgs, a.resize_h, a.resize_w, 3), np.uint8
        )
        for j, t in enumerate(tuples):
            out[j] = int(t[0].split("_")[1]) % 251
        return out


def _tuple_index(t) -> int:
    return int(t[0].split("_")[1])


class TestDeviceCorpus:
    def test_estimated_bytes(self):
        ds = FakeDataset(10, n_imgs=2, h=8, w=8)
        assert estimated_corpus_bytes(ds) == 10 * 2 * 8 * 8 * 3

    def test_batches_match_labels_and_tuples(self):
        mesh = make_mesh()
        ds = FakeDataset(50)
        dc = DeviceCorpus(ds, mesh)
        assert len(dc) == 50
        n_batches = 0
        for imgs, labels, tuples, valid in dc.iter_batches(16, shuffle=True, seed=3):
            assert isinstance(imgs, jax.Array)
            assert imgs.shape == (16, 2, 8, 8, 3) and imgs.dtype == np.uint8
            host = np.asarray(imgs)
            for b in range(16):
                idx = _tuple_index(tuples[b])
                assert host[b, 0, 0, 0, 0] == idx % 251
                assert labels[b] == idx % 2
            n_batches += 1
        # 50 pads to 56 -> shard size 7, batch/device 2 -> 3 full steps.
        assert n_batches == 3

    def test_full_coverage_without_padding(self):
        mesh = make_mesh()
        ds = FakeDataset(64)
        dc = DeviceCorpus(ds, mesh)
        seen = []
        for _, _, tuples, _v in dc.iter_batches(16, shuffle=True, seed=0):
            seen.extend(_tuple_index(t) for t in tuples)
        # 64 % (8 devices) == 0 and 64 % 16 == 0: every example exactly once.
        assert sorted(seen) == list(range(64))

    def test_shuffle_varies_by_seed_and_sequential_when_off(self):
        mesh = make_mesh()
        ds = FakeDataset(64)
        dc = DeviceCorpus(ds, mesh)

        def order(shuffle, seed):
            out = []
            for _, _, tuples, _v in dc.iter_batches(16, shuffle=shuffle, seed=seed):
                out.extend(_tuple_index(t) for t in tuples)
            return out

        assert order(True, 0) != order(True, 1)
        assert order(True, 0) == order(True, 0)
        # shuffle off: each shard walks its rows in order.
        seq = order(False, 0)
        shard = 64 // mesh.size
        for s in range(mesh.size):
            rows = [i for i in seq if s * shard <= i < (s + 1) * shard]
            assert rows == sorted(rows)

    def test_batch_not_divisible_raises(self):
        mesh = make_mesh()
        dc = DeviceCorpus(FakeDataset(64), mesh)
        with pytest.raises(ValueError, match="not divisible"):
            next(iter(dc.iter_batches(12, shuffle=False)))


@pytest.fixture()
def tiny_bev_tree(tmp_path):
    """Minimal class-separable rendered tree (mirrors test_loop_e2e)."""
    import cv2

    from salve_tpu.dataset.zind_partition import DATASET_SPLITS

    rng = np.random.default_rng(0)
    for split in ["train", "val", "test"]:
        b = sorted(DATASET_SPLITS[split])[0]
        for label_dir, base in [
            ("gt_alignment_approx", 180), ("incorrect_alignment", 40)
        ]:
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


class TestTrainLoopWithDeviceCorpus:
    def test_train_uses_device_corpus(self, tmp_path, tiny_bev_tree, caplog):
        from salve_tpu.training.loop import train

        cfg = TrainingConfig(
            num_layers=18,
            resize_h=36, resize_w=36, train_h=32, train_w=32,
            batch_size=8,
            num_epochs=2,
            workers=2,
            print_every=100,
            compute_dtype="float32",
            data_root=str(tiny_bev_tree),
            model_save_dirpath=str(tmp_path / "ckpts"),
            device_corpus_gb=1.0,
        )
        with caplog.at_level("INFO"):
            results = train(cfg)
        assert any("DeviceCorpus:" in r.message for r in caplog.records)
        assert len(results["train_avg_loss"]) == 2
        assert all(np.isfinite(v) for v in results["train_avg_loss"])
        assert glob.glob(f"{cfg.model_save_dirpath}/*/train_ckpt.flax")

    def test_oversized_corpus_falls_back_to_streaming(
        self, tmp_path, tiny_bev_tree, caplog
    ):
        from salve_tpu.training.loop import train

        cfg = TrainingConfig(
            num_layers=18,
            resize_h=36, resize_w=36, train_h=32, train_w=32,
            batch_size=8,
            num_epochs=1,
            workers=2,
            print_every=100,
            compute_dtype="float32",
            data_root=str(tiny_bev_tree),
            model_save_dirpath=str(tmp_path / "ckpts"),
            device_corpus_gb=1e-9,  # guaranteed too small
        )
        with caplog.at_level("INFO"):
            results = train(cfg)
        assert any(
            "device_corpus disabled" in r.message for r in caplog.records
        )
        assert not any("DeviceCorpus:" in r.message for r in caplog.records)
        assert len(results["train_avg_loss"]) == 1


class TestPaddingValidityMask:
    def test_valid_masks_wraparound_padding(self):
        """50 pads to 56: exactly 6 padded (duplicate) rows across the epoch
        are flagged invalid; all real rows are valid exactly once."""
        mesh = make_mesh()
        ds = FakeDataset(50)
        dc = DeviceCorpus(ds, mesh)
        n_valid = n_invalid = 0
        for _, _, tuples, valid in dc.iter_batches(56, shuffle=False, seed=0):
            for t, v in zip(tuples, valid):
                if v:
                    n_valid += 1
                else:
                    n_invalid += 1
                    # padding wraps to the FIRST examples
                    assert _tuple_index(t) < 6
        assert n_valid == 50 and n_invalid == 6

    def test_small_split_falls_back_to_streaming(
        self, tmp_path, tiny_bev_tree, caplog
    ):
        """A split smaller than one mesh-wide batch must stream from host
        (DeviceCorpus.iter_batches would raise mid-epoch otherwise)."""
        from salve_tpu.training.loop import train

        cfg = TrainingConfig(
            num_layers=18,
            resize_h=36, resize_w=36, train_h=32, train_w=32,
            batch_size=200,  # > the 24-pair tiny split: zero full steps
            num_epochs=1,
            workers=2,
            print_every=100,
            compute_dtype="float32",
            data_root=str(tiny_bev_tree),
            model_save_dirpath=str(tmp_path / "ckpts"),
            device_corpus_gb=1.0,
        )
        with caplog.at_level("INFO"):
            results = train(cfg)
        assert any("device_corpus disabled" in r.message for r in caplog.records)
        assert len(results["train_avg_loss"]) == 1
        assert all(np.isfinite(v) for v in results["train_avg_loss"])
