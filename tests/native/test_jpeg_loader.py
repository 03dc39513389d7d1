"""Tests for the native C++ JPEG batch loader (vs cv2 as oracle)."""

import cv2
import numpy as np
import pytest

from salve_tpu.native.loader import decode_resize_batch, native_loader_available

pytestmark = pytest.mark.skipif(
    not native_loader_available(), reason="native loader unavailable (no g++/libjpeg)"
)


@pytest.fixture()
def jpeg_files(tmp_path):
    rng = np.random.default_rng(0)
    paths = []
    for i in range(6):
        img = rng.integers(0, 255, (100 + i * 10, 160, 3), dtype=np.uint8)
        # Smooth it so JPEG compression error stays small.
        img = cv2.GaussianBlur(img, (15, 15), 5)
        p = tmp_path / f"img_{i}.jpg"
        cv2.imwrite(str(p), img[:, :, ::-1], [cv2.IMWRITE_JPEG_QUALITY, 98])
        paths.append(str(p))
    return paths


class TestNativeLoader:
    def test_matches_cv2(self, jpeg_files) -> None:
        out_h, out_w = 64, 96
        imgs, ok = decode_resize_batch(jpeg_files, out_h, out_w)
        assert ok.all()
        assert imgs.shape == (len(jpeg_files), out_h, out_w, 3)
        for i, p in enumerate(jpeg_files):
            ref = cv2.imread(p)[:, :, ::-1]
            ref = cv2.resize(ref, (out_w, out_h), interpolation=cv2.INTER_LINEAR)
            # Same decode (libjpeg both) + same sampling convention; small
            # differences allowed from cv2's fixed-point interpolation.
            diff = np.abs(imgs[i] - ref.astype(np.float32))
            assert diff.mean() < 1.5
            assert np.median(diff) <= 1.0

    def test_missing_file_flagged(self, jpeg_files, tmp_path) -> None:
        paths = jpeg_files + [str(tmp_path / "missing.jpg")]
        imgs, ok = decode_resize_batch(paths, 32, 32)
        assert ok[:-1].all()
        assert not ok[-1]

    def test_dataset_uses_native_path(self, tmp_path) -> None:
        """BEVPairDataset returns identical batches via native and cv2 paths."""
        from salve_tpu.dataset.bev_pairs import BEVPairDataset
        from salve_tpu.dataset.zind_partition import DATASET_SPLITS
        from salve_tpu.training.config import TrainingConfig

        b = sorted(DATASET_SPLITS["train"])[0]
        rng = np.random.default_rng(1)
        d = tmp_path / "gt_alignment_approx" / b
        d.mkdir(parents=True)
        for surface in ["ceiling", "floor"]:
            for pano in [1, 2]:
                img = cv2.GaussianBlur(
                    rng.integers(0, 255, (64, 64, 3), dtype=np.uint8), (15, 15), 5
                )
                fp = d / f"pair_0___door_0_0_identity_{surface}_rgb_floor_01_pano_{pano}.jpg"
                cv2.imwrite(str(fp), img)
        (tmp_path / "incorrect_alignment").mkdir()

        cfg = TrainingConfig(resize_h=32, resize_w=32)
        ds = BEVPairDataset("train", cfg, data_root=str(tmp_path), workers=2)
        imgs_native, labels, tuples = ds.load_batch([0])

        imgs_cv2 = np.stack([ds._load_one(t)[0] for t in tuples])
        assert imgs_native.shape == imgs_cv2.shape
        assert imgs_native.dtype == np.uint8
        diff = np.abs(imgs_native.astype(np.int16) - imgs_cv2.astype(np.int16))
        assert diff.mean() < 1.5
