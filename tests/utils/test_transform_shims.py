"""Tests for the torch-free tuple-transform shims."""

import random

import numpy as np
import pytest

from salve_tpu.utils import transform as T


def _imgs(n, h=40, w=40, seed=0):
    rng = np.random.default_rng(seed)
    return tuple(rng.integers(0, 255, (h, w, 3), dtype=np.uint8) for _ in range(n))


class TestComposeChain:
    def test_quadruplet_train_chain(self) -> None:
        random.seed(0)
        train, evaln = T.get_imagenet_transform_lists()
        out = train(*_imgs(4))
        assert len(out) == 4
        for o in out:
            assert o.shape == (3, 224, 224)
            assert o.dtype == np.float32

    def test_eval_chain_deterministic(self) -> None:
        _, evaln = T.get_imagenet_transform_lists()
        a = evaln(*_imgs(4))
        b = evaln(*_imgs(4))
        for x, y in zip(a, b):
            assert np.array_equal(x, y)

    def test_arity_enforced(self) -> None:
        with pytest.raises(ValueError):
            T.ResizePair((8, 8))(*_imgs(4))


class TestCrop:
    def test_shared_offset(self) -> None:
        random.seed(1)
        base = _imgs(1)[0]
        crop = T.CropQuadruplet((32, 32), crop_type="rand", padding=(0, 0, 0))
        out = crop(base, base.copy(), base.copy(), base.copy())
        for o in out[1:]:
            assert np.array_equal(out[0], o)

    def test_padding_when_small(self) -> None:
        img = _imgs(1, h=16, w=16)[0]
        crop = T.CropPair((32, 32), crop_type="center", padding=(10, 10, 10))
        a, b = crop(img, img)
        assert a.shape == (32, 32, 3)


class TestFlips:
    def test_tuple_consistent(self) -> None:
        imgs = _imgs(2, seed=3)
        flipped_any = False
        for seed in range(6):
            random.seed(seed)
            a, b = T.RandomHorizontalFlipPair(p=0.5)(*imgs)
            same_a = np.array_equal(a, imgs[0])
            same_b = np.array_equal(b, imgs[1])
            assert same_a == same_b  # both flipped or both not
            flipped_any |= not same_a
        assert flipped_any


class TestPhotometric:
    def test_changes_and_clips(self) -> None:
        random.seed(0)
        imgs = _imgs(4, seed=2)
        out = T.PhotometricShiftQuadruplet()(*imgs)
        assert any(not np.array_equal(o, i) for o, i in zip(out, imgs))
        for o in out:
            assert o.min() >= 0 and o.max() <= 255
