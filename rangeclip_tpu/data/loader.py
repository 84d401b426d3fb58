"""Deterministic splits + sharded, prefetching batch loader.

Reference: dataloader.py:95-140 —
  * deterministic 60/20/20 split with ``random.seed(42)`` + shuffle — the
    exact same index permutation is reproduced here (python's Mersenne
    shuffle, so checkpoints trained against the reference's split remain
    comparable);
  * DistributedSampler per split + per-epoch reshuffle (train_util.py:273);
  * n_train_steps = ceil(n/batch) * n_epoch (:137-138).

TPU-native loader design: a background thread pipelines host-side decode +
transform ahead of the device; each host reads only its shard (the
DistributedSampler equivalent: pad indices to a multiple of the shard count,
then round-robin).  Batches are fixed-shape; a final ragged batch is padded
by repeating its first sample with ``sample_valid = 0`` so jit never sees a
new shape (the reference instead lets torch emit a ragged last batch).
"""

from __future__ import annotations

import queue
import random
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np


def deterministic_split(
    n: int, seed: int = 42
) -> Tuple[List[int], List[int], List[int]]:
    """60/20/20 split identical to the reference (dataloader.py:95-109)."""
    indices = list(range(n))
    random.Random(seed).shuffle(indices)
    split1 = int(0.6 * n)
    split2 = int(0.8 * n)
    return indices[:split1], indices[split1:split2], indices[split2:]


def _shard_indices(
    indices: Sequence[int], epoch: int, shard_id: int, num_shards: int, shuffle: bool,
    seed: int = 0,
) -> List[int]:
    """DistributedSampler semantics: shuffle(seed+epoch), pad to a multiple
    of num_shards by wrapping, take every num_shards-th element."""
    idx = list(indices)
    if shuffle:
        g = np.random.default_rng(seed + epoch)
        idx = [idx[i] for i in g.permutation(len(idx))]
    if num_shards > 1 and len(idx) > 0:
        total = -(-len(idx) // num_shards) * num_shards
        # Modular wrap: repeat the list however many times the pad needs
        # (a single doubling under-fills when num_shards > 2*len(idx),
        # giving ragged shard lengths -> multi-host step-count skew).
        idx = [idx[i % len(idx)] for i in range(total)]
        idx = idx[shard_id::num_shards]
    return idx


class ShardedBatchLoader:
    """Iterates fixed-shape batches of a dataset subset with prefetch.

    Yields dicts of stacked numpy arrays with an extra ``sample_valid``
    [B] float32 mask (0 marks padding in the final ragged batch).
    """

    def __init__(
        self,
        dataset,
        indices: Sequence[int],
        batch_size: int,
        shard_id: int = 0,
        num_shards: int = 1,
        shuffle: bool = False,
        seed: int = 0,
        drop_last: bool = False,
        prefetch: int = 2,
        num_workers: int = 4,
    ):
        self.dataset = dataset
        self.indices = list(indices)
        self.batch_size = batch_size
        self.shard_id = shard_id
        self.num_shards = num_shards
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.num_workers = max(1, num_workers)
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        """Per-epoch reshuffle hook (train_util.py:273)."""
        self.epoch = epoch

    def __len__(self) -> int:
        n = len(_shard_indices(self.indices, self.epoch, self.shard_id,
                               self.num_shards, False))
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _fetch(self, i: int, position: int):
        """One sample with a deterministic per-position RNG, so multi-worker
        decode order never changes the data (the reference's per-worker
        torch seeds are order-dependent)."""
        rng = np.random.default_rng(
            (self.seed, self.epoch, self.shard_id, position)
        )
        try:
            return self.dataset.__getitem__(i, rng=rng)
        except TypeError:  # datasets without an rng kwarg
            return self.dataset[i]

    def _make_batch(self, batch_indices: List[int], batch_start: int,
                    pool: Optional[ThreadPoolExecutor]) -> Dict[str, np.ndarray]:
        n_real = len(batch_indices)
        padded = batch_indices + [batch_indices[0]] * (self.batch_size - n_real)
        positions = range(batch_start, batch_start + self.batch_size)
        if pool is not None:
            samples = list(pool.map(self._fetch, padded, positions))
        else:
            samples = [self._fetch(i, p) for i, p in zip(padded, positions)]
        batch = {
            k: np.stack([s[k] for s in samples], axis=0) for k in samples[0]
        }
        valid = np.zeros((self.batch_size,), np.float32)
        valid[:n_real] = 1.0
        batch["sample_valid"] = valid
        return batch

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        idx = _shard_indices(self.indices, self.epoch, self.shard_id,
                             self.num_shards, self.shuffle, self.seed)
        batches: List[List[int]] = [
            idx[i : i + self.batch_size] for i in range(0, len(idx), self.batch_size)
        ]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        pool = (ThreadPoolExecutor(max_workers=self.num_workers)
                if self.num_workers > 1 else None)

        def producer():
            try:
                for bi, b in enumerate(batches):
                    q.put(self._make_batch(b, bi * self.batch_size, pool))
            finally:
                q.put(sentinel)
                if pool is not None:
                    pool.shutdown(wait=False)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
        t.join()


def setup_dataloaders(
    metadata_file: str,
    labels_file: str,
    resize_shape: Tuple[int, int],
    batch_size: int,
    n_epoch: int,
    shard_id: int = 0,
    num_shards: int = 1,
    seed: int = 42,
):
    """Build train/val/test loaders + labels (dataloader.py:11-140).

    Returns (train_loader, val_loader, test_loader, n_train_steps, labels).
    """
    from rangeclip_tpu.data.dataset import ImageDepthTextDataset

    dataset = ImageDepthTextDataset(
        metadata_file=metadata_file, labels_path=labels_file, resize_shape=resize_shape
    )
    train_idx, val_idx, test_idx = deterministic_split(len(dataset), seed=seed)

    train_loader = ShardedBatchLoader(
        dataset, train_idx, batch_size, shard_id, num_shards, shuffle=True,
        drop_last=True,
    )
    val_loader = ShardedBatchLoader(
        dataset, val_idx, batch_size, shard_id, num_shards, shuffle=False
    )
    test_loader = ShardedBatchLoader(
        dataset, test_idx, batch_size, shard_id, num_shards, shuffle=False
    )
    n_train_steps = -(-len(train_idx) // batch_size) * n_epoch
    return train_loader, val_loader, test_loader, n_train_steps, dataset.labels
