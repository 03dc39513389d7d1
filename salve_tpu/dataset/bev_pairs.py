"""Dataset over rendered BEV texture-map pairs (parity: salve/dataset/zind_data.py).

Example discovery is filename-driven, exactly as the reference: tuples are
grouped by the `pair_{idx}___...` grammar, labels come from the directory
name (gt_alignment_approx=1, incorrect_alignment=0), and tuple arity is
2/4/6 images depending on the modality set.

Instead of 15 torch DataLoader worker processes, batches are assembled by
a thread pool (JPEG decode + host resize, both releasing the GIL through
cv2) and handed to the jitted on-device augmentation in
salve_tpu.training.transforms.
"""

from __future__ import annotations

import glob
import random
from collections import defaultdict
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Iterator, List, Sequence, Tuple

import numpy as np

from salve_tpu.dataset.zind_partition import DATASET_SPLITS
from salve_tpu.training.config import TrainingConfig

LABEL_DICT = {"gt_alignment_approx": 1, "incorrect_alignment": 0}
FLOOR_IDS = ["floor_00", "floor_01", "floor_02", "floor_03", "floor_04"]


def pair_idx_from_fpath(fpath: str) -> int:
    """Parse the pair index from `pair_{idx}___...` (zind_data.py:53)."""
    return int(Path(fpath).stem.split("___")[0].split("_")[1])


def pano_id_from_fpath(fpath: str) -> int:
    """Parse the pano ID from the trailing `..._pano_{id}` (zind_data.py:61)."""
    return int(Path(fpath).stem.split("_")[-1])


def get_tuples_from_fpath_list(
    fpaths: List[str], label_idx: int, args: TrainingConfig
) -> List[Tuple]:
    """Group one floor's rendered files into (fpaths..., label) tuples.

    Parity: salve/dataset/zind_data.py:71-180, including the skip-if-
    incomplete rule (a pair must have all 4 renderings) and the
    ceiling-first sort order within each tuple.
    """
    pairidx_to_fpath_dict = defaultdict(list)
    for fpath in fpaths:
        pairidx_to_fpath_dict[pair_idx_from_fpath(fpath)].append(fpath)

    mset = set(args.modalities)
    layout_only = mset == {"layout"}
    expected_n_files = 2 if layout_only else 4

    tuples: List[Tuple] = []
    for pair_idx, pair_fpaths in pairidx_to_fpath_dict.items():
        if len(pair_fpaths) != expected_n_files:
            continue
        pair_fpaths.sort()

        if layout_only:
            fp1l, fp2l = pair_fpaths
            tuples.append((fp1l, fp2l, label_idx))
            continue

        fp1c, fp2c, fp1f, fp2f = pair_fpaths
        if "layout" in mset:
            fp1l = fp1f.replace(args.data_root, args.layout_data_root)
            fp2l = fp2f.replace(args.data_root, args.layout_data_root)
            if not (Path(fp1l).exists() and Path(fp2l).exists()):
                continue

        if mset == {"ceiling_rgb_texture"}:
            tuples.append((fp1c, fp2c, label_idx))
        elif mset == {"floor_rgb_texture"}:
            tuples.append((fp1f, fp2f, label_idx))
        elif mset == {"ceiling_rgb_texture", "floor_rgb_texture"}:
            tuples.append((fp1c, fp2c, fp1f, fp2f, label_idx))
        elif mset == {"ceiling_rgb_texture", "floor_rgb_texture", "layout"}:
            tuples.append((fp1c, fp2c, fp1f, fp2f, fp1l, fp2l, label_idx))
        else:
            raise RuntimeError(f"Unsupported modalities {args.modalities}")
    return tuples


def get_available_building_ids(dataset_root: str) -> List[str]:
    building_ids = [
        Path(p).stem for p in glob.glob(f"{dataset_root}/*") if Path(p).is_dir()
    ]
    return sorted(building_ids, key=lambda x: int(x))


def make_dataset(split: str, data_root: str, args: TrainingConfig) -> List[Tuple]:
    """All (fpaths..., label) tuples of a split (zind_data.py:198)."""
    if not Path(data_root).exists():
        raise RuntimeError(f"Dataset root {data_root} does not exist.")

    data_list: List[Tuple] = []
    available = get_available_building_ids(f"{data_root}/gt_alignment_approx")
    members = set(DATASET_SPLITS[split]).intersection(available)
    if args.split_overrides:
        # Reassign overridden buildings: drop the ones moved out of this
        # split, pull in the ones moved into it (config.py:split_overrides).
        members = {b for b in members if args.split_overrides.get(b, split) == split}
        members |= {
            b for b, s in args.split_overrides.items()
            if s == split and b in available
        }
    split_building_ids = sorted(members, key=int)

    for label_name, label_idx in LABEL_DICT.items():
        for building_id in split_building_ids:
            for floor_id in FLOOR_IDS:
                fpaths = glob.glob(
                    f"{data_root}/{label_name}/{building_id}/pair_*___*_rgb_{floor_id}_*.jpg"
                )
                if fpaths:
                    data_list.extend(get_tuples_from_fpath_list(fpaths, label_idx, args))
    return data_list


class BEVPairDataset:
    """Batch loader over rendered BEV pairs.

    Loads each tuple's JPEGs with a thread pool, resizes to
    (resize_h, resize_w) on the host (cv2, INTER_LINEAR — same as the
    reference Resize transform), and returns uint8 arrays of shape
    (B, n_imgs, resize_h, resize_w, 3) — 4x cheaper to move to the device
    than float32; cropping/flips/upcast/normalize run on device afterward.
    """

    def __init__(
        self, split: str, args: TrainingConfig, data_root: str = "", workers: int = 8
    ) -> None:
        self.args = args
        self.split = split
        self.data_list = make_dataset(split, data_root or args.data_root, args)
        self.n_imgs = len(self.data_list[0]) - 1 if self.data_list else 0
        self._pool = ThreadPoolExecutor(max_workers=workers)
        # In-RAM decoded-image cache, enabled when the whole resized corpus
        # fits the configured budget (config.py:decoded_cache_gb).
        cache_gb = getattr(args, "decoded_cache_gb", 0.0) or 0.0
        est_bytes = (
            len(self.data_list) * self.n_imgs * args.resize_h * args.resize_w * 3
        )
        self._cache = {} if 0 < est_bytes <= cache_gb * 1e9 else None

    def __len__(self) -> int:
        return len(self.data_list)

    def _load_one(self, tup: Tuple) -> Tuple[np.ndarray, int]:
        import cv2

        fpaths, label = tup[:-1], tup[-1]
        imgs = []
        for fp in fpaths:
            img = cv2.imread(fp)[:, :, ::-1]  # BGR -> RGB
            img = cv2.resize(
                img,
                (self.args.resize_w, self.args.resize_h),
                interpolation=cv2.INTER_LINEAR,
            )
            imgs.append(img)
        return np.stack(imgs).astype(np.uint8), label

    def load_batch(self, indices: Sequence[int]) -> Tuple[np.ndarray, np.ndarray, List[Tuple]]:
        """Returns (imgs (B,N,H,W,3) f32, labels (B,) i32, tuples).

        Uses the native C++ libjpeg thread-pool loader when available
        (salve_tpu.native), falling back to cv2 in Python threads. When the
        decoded corpus fits TrainingConfig.decoded_cache_gb, resized uint8
        stacks are kept in RAM keyed by dataset index, so every epoch after
        the first skips disk and JPEG decode entirely (decode is the
        single-host training bottleneck; the device step is faster than one
        batch of cv2 decodes).
        """
        tuples = [self.data_list[i] for i in indices]
        labels = np.array([t[-1] for t in tuples], dtype=np.int32)

        if self._cache is None:
            return self._load_tuples(tuples), labels, tuples
        miss = [i for i in indices if i not in self._cache]
        if miss:
            loaded = self._load_tuples([self.data_list[i] for i in miss])
            for j, i in enumerate(miss):
                self._cache[i] = loaded[j]
        imgs = np.stack([self._cache[i] for i in indices])
        return imgs, labels, tuples

    def _load_tuples(self, tuples: List[Tuple]) -> np.ndarray:
        """Decode + resize each tuple's images: (len(tuples),N,H,W,3) u8."""
        native_imgs = self._load_batch_native(tuples)
        if native_imgs is not None:
            return native_imgs
        results = list(self._pool.map(self._load_one, tuples))
        return np.stack([r[0] for r in results])

    def _load_batch_native(self, tuples: List[Tuple]) -> "np.ndarray | None":
        """Flat batched decode via the native loader; None if unavailable."""
        try:
            from salve_tpu.native.loader import (
                decode_resize_batch,
                native_loader_available,
            )
        except ImportError:
            return None
        if not native_loader_available():
            return None
        n_imgs = len(tuples[0]) - 1
        flat_paths = [fp for t in tuples for fp in t[:-1]]
        imgs, ok = decode_resize_batch(
            flat_paths, self.args.resize_h, self.args.resize_w
        )
        if not ok.all():
            return None  # fall back (e.g. non-JPEG inputs)
        imgs = np.clip(np.round(imgs), 0, 255).astype(np.uint8)
        return imgs.reshape(len(tuples), n_imgs, self.args.resize_h, self.args.resize_w, 3)

    def iter_batches(
        self, batch_size: int, shuffle: bool, seed: int = 0, drop_last: bool = False
    ) -> Iterator[Tuple[np.ndarray, np.ndarray, List[Tuple]]]:
        order = list(range(len(self.data_list)))
        if shuffle:
            random.Random(seed).shuffle(order)
        for start in range(0, len(order), batch_size):
            chunk = order[start : start + batch_size]
            if drop_last and len(chunk) < batch_size:
                break
            yield self.load_batch(chunk)
