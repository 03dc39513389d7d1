"""HBM-resident training corpus (TPU-native; no reference analog).

The reference streams every batch from host workers into the GPU each step
(salve/dataset/zind_data.py + torch DataLoader). On TPU the equivalent
host->device link is the slowest resource in the system — over the axon
tunnel it caps training at the transfer bandwidth (~58 pairs/s for the
234px recipe) while the device step itself runs an order of magnitude
faster. A resized BEV-pair corpus is small (uint8, a few hundred KB per
pair), so for multi-epoch training the TPU-native answer is to upload the
whole split ONCE, sharded over the mesh's 'data' axis, and draw every
batch as an on-device gather: after the one-time upload, epochs run at
device speed and the host link carries only labels and metrics.

Sampling follows the torch DistributedSampler contract the reference
implicitly relies on: the corpus is padded to a multiple of the mesh size,
each device owns a contiguous shard, and every epoch each device draws a
fresh local permutation of its own shard — no cross-device gathers, so
the per-batch index lookup stays a local ``take`` inside ``shard_map``.
"""

from __future__ import annotations

import logging
import time
from typing import Iterator, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)

_UPLOAD_CHUNK = 512  # tuples decoded per host staging step


def estimated_corpus_bytes(dataset) -> int:
    """uint8 bytes of the whole resized split (matches the decoded-cache
    estimate in dataset/bev_pairs.py)."""
    if len(dataset) == 0 or dataset.n_imgs == 0:
        return 0
    a = dataset.args
    return len(dataset) * dataset.n_imgs * a.resize_h * a.resize_w * 3


class DeviceCorpus:
    """A BEVPairDataset uploaded once to the mesh, batch-gathered on device.

    Exposes the same ``iter_batches(batch_size, shuffle, seed)`` surface as
    BEVPairDataset so the training loop (training/loop.py) can swap it in
    transparently; yielded images are already-sharded ``jax.Array``s.
    """

    def __init__(self, dataset, mesh: Mesh) -> None:
        self.dataset = dataset
        self.mesh = mesh
        self.n_devices = mesh.size
        n = len(dataset)
        if n == 0:
            raise ValueError("DeviceCorpus over an empty dataset")

        # Pad to a multiple of the mesh size by wrapping around (the
        # DistributedSampler padding rule) so every shard is equal-sized.
        n_pad = -(-n // self.n_devices) * self.n_devices
        self._src_index = np.arange(n_pad, dtype=np.int64) % n
        self.shard_size = n_pad // self.n_devices
        self._labels = np.array(
            [dataset.data_list[i][-1] for i in self._src_index], dtype=np.int32
        )

        a = dataset.args
        shape = (n_pad, dataset.n_imgs, a.resize_h, a.resize_w, 3)
        t0 = time.time()
        staging = np.empty(shape, dtype=np.uint8)
        for s in range(0, n_pad, _UPLOAD_CHUNK):
            idx = self._src_index[s : s + _UPLOAD_CHUNK]
            staging[s : s + len(idx)] = dataset._load_tuples(
                [dataset.data_list[i] for i in idx]
            )
        t_decode = time.time() - t0

        t0 = time.time()
        self.corpus = jax.device_put(
            staging, NamedSharding(mesh, P("data"))
        )
        self.corpus.block_until_ready()
        t_upload = time.time() - t0
        del staging
        logger.info(
            "DeviceCorpus: %d pairs (%d padded) x %d imgs @ %dpx = %.2f GB "
            "on %d device(s); decode %.1fs upload %.1fs",
            n, n_pad, dataset.n_imgs, a.resize_h,
            np.prod(shape) / 1e9, self.n_devices, t_decode, t_upload,
        )

        def _local_take(corpus_shard, idx_shard):
            return jnp.take(corpus_shard, idx_shard, axis=0)

        self._gather = jax.jit(
            shard_map(
                _local_take,
                mesh=mesh,
                in_specs=(P("data"), P("data")),
                out_specs=P("data"),
            )
        )

    def __len__(self) -> int:
        return len(self.dataset)

    def iter_batches(
        self, batch_size: int, shuffle: bool, seed: int = 0, drop_last: bool = True
    ) -> Iterator[Tuple[jax.Array, np.ndarray, List[Tuple], np.ndarray]]:
        """Yields (imgs sharded on device, labels host i32, tuples, valid).

        Each device draws ``batch_size / n_devices`` examples per step from
        its OWN shard (local permutation when ``shuffle``); partial tail
        steps are always dropped so every dispatch keeps one compiled shape.
        ``valid`` (host bool) is False on the wrap-around padding rows that
        equalize the shards — the metric fold masks them so duplicated
        examples never contaminate val statistics (they still flow through
        the train step, where <= mesh-1 duplicates per epoch is noise).
        """
        if batch_size % self.n_devices:
            raise ValueError(
                f"batch_size {batch_size} not divisible by mesh size "
                f"{self.n_devices} (required for the per-shard gather)"
            )
        k = batch_size // self.n_devices
        steps = self.shard_size // k
        if steps == 0:
            raise ValueError(
                f"shard size {self.shard_size} < per-device batch {k}: "
                "shrink the batch or stream from host instead"
            )
        rng = np.random.default_rng(seed)
        local_orders = [
            rng.permutation(self.shard_size) if shuffle
            else np.arange(self.shard_size)
            for _ in range(self.n_devices)
        ]
        for t in range(steps):
            local_idx = np.concatenate(
                [order[t * k : (t + 1) * k] for order in local_orders]
            ).astype(np.int32)
            global_rows = np.concatenate(
                [
                    s * self.shard_size + order[t * k : (t + 1) * k]
                    for s, order in enumerate(local_orders)
                ]
            )
            imgs = self._gather(self.corpus, local_idx)
            labels = self._labels[global_rows]
            tuples = [
                self.dataset.data_list[self._src_index[g]] for g in global_rows
            ]
            valid = global_rows < len(self.dataset)
            yield imgs, labels, tuples, valid
