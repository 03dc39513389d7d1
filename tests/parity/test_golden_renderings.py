"""Golden-render fixtures: discovery + transform parity on REAL reference data.

The reference ships 4 real production BEV renders (building 1208, pair 58)
at tests/test_data/Renderings; its tests use them for dataset discovery
(tests/dataset/test_zind_data.py:12) and transform-pipeline inputs
(tests/utils/test_transform.py:18). These tests exercise the same fixtures
through salve_tpu's production paths.
"""

import shutil
from pathlib import Path

import numpy as np
import pytest

RENDERINGS = Path("/root/reference/tests/test_data/Renderings")

IMG_FNAME_CEILING_1 = "pair_58___door_0_0_rotated_ceiling_rgb_floor_01_partial_room_04_pano_5.jpg"
IMG_FNAME_CEILING_2 = "pair_58___door_0_0_rotated_ceiling_rgb_floor_01_partial_room_07_pano_8.jpg"
IMG_FNAME_FLOOR_1 = "pair_58___door_0_0_rotated_floor_rgb_floor_01_partial_room_04_pano_5.jpg"
IMG_FNAME_FLOOR_2 = "pair_58___door_0_0_rotated_floor_rgb_floor_01_partial_room_07_pano_8.jpg"


@pytest.fixture()
def golden_root(tmp_path):
    if not RENDERINGS.exists():
        pytest.skip("reference golden renders unavailable")
    shutil.copytree(RENDERINGS / "gt_alignment_approx", tmp_path / "gt_alignment_approx")
    return tmp_path


def test_make_dataset_discovers_golden_quadruplet(golden_root):
    """Filename-grammar discovery on the real renders (zind_data.py:198 parity)."""
    from salve_tpu.dataset.bev_pairs import make_dataset
    from salve_tpu.training.config import TrainingConfig

    cfg = TrainingConfig(
        modalities=("ceiling_rgb_texture", "floor_rgb_texture"),
        data_root=str(golden_root),
    )
    # Building 1208 belongs to the train split.
    data_list = make_dataset("train", str(golden_root), cfg)
    assert len(data_list) == 1
    x1c, x2c, x1f, x2f, is_match = data_list[0]
    assert Path(x1c).name == IMG_FNAME_CEILING_1
    assert Path(x2c).name == IMG_FNAME_CEILING_2
    assert Path(x1f).name == IMG_FNAME_FLOOR_1
    assert Path(x2f).name == IMG_FNAME_FLOOR_2
    assert is_match == 1


def test_device_eval_transform_matches_reference_shims_on_golden_renders(golden_root):
    """Production device preprocessing == reference transform semantics.

    The production path (BEVPairDataset cv2 resize + device center-crop +
    ImageNet normalize, training/transforms.py) must match the reference's
    val/test composition Resize -> CenterCrop -> ToTensor -> Normalize
    (salve/train_utils.py:126-160), evaluated through our torch-free shims
    on the real reference renders.
    """
    import cv2
    import jax.numpy as jnp

    import imageio.v2 as imageio

    from salve_tpu.training import transforms as device_transforms
    from salve_tpu.utils import transform as shims
    from salve_tpu.utils.normalization_utils import get_imagenet_mean_std

    root = golden_root / "gt_alignment_approx" / "1208"
    imgs = [
        imageio.imread(root / f)
        for f in (
            IMG_FNAME_CEILING_1, IMG_FNAME_CEILING_2,
            IMG_FNAME_FLOOR_1, IMG_FNAME_FLOOR_2,
        )
    ]
    resize_hw, crop_hw = (234, 234), (224, 224)
    mean, std = get_imagenet_mean_std()

    # Reference-shim composition (val/test path).
    compose = shims.ComposeQuadruplet(
        [
            shims.ResizeQuadruplet(resize_hw),
            shims.CropQuadruplet(size=crop_hw, crop_type="center", padding=mean),
            shims.ToTensorQuadruplet(),
            shims.NormalizeQuadruplet(mean=mean, std=std),
        ]
    )
    ref_out = compose(*imgs)  # 4 x (3, 224, 224) CHW float arrays

    # Production path: host cv2 resize (dataset/bev_pairs.py:_load_one) +
    # device center crop + normalize (training/transforms.py:preprocess_eval).
    resized = np.stack(
        [cv2.resize(im, resize_hw[::-1], interpolation=cv2.INTER_LINEAR) for im in imgs]
    )
    device_out = np.asarray(
        device_transforms.preprocess_eval(
            jnp.asarray(resized[None].astype(np.float32)), crop_hw[0], crop_hw[1]
        )
    )[0]  # (4, 224, 224, 3) normalized NHWC

    for k in range(4):
        ref_chw = np.asarray(ref_out[k])
        got = device_out[k].transpose(2, 0, 1)
        assert got.shape == ref_chw.shape == (3, 224, 224)
        assert np.allclose(got, ref_chw, atol=1e-4), (
            k, np.abs(got - ref_chw).max()
        )
