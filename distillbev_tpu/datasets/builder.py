"""Dataset + dataloader construction.

Capability parity with the reference builders
(reference: mmdet3d/datasets/builder.py:31-120 build_dataset /
build_dataloader; datasets/samplers/group_sampler.py — seeded
DistributedSampler/DistributedGroupSampler; dataset_wrappers.py:8 CBGS).

TPU-native loader: a thread-pool prefetch pipeline producing numpy
batches; per-host sharding happens by slicing the global index stream by
``jax.process_index()`` (the GSPMD analogue of rank-sliced samplers).
"""
from __future__ import annotations

import itertools
import queue
import threading
from typing import Iterator, Optional, Sequence

import numpy as np

from ..registry import build_from_cfg
from .nuscenes_dataset import DATASETS
from .pipelines.formating import collate_samples


def build_dataset(cfg):
    cfg = dict(cfg)
    if cfg.get("type") == "CBGSDataset":
        from .cbgs import CBGSDataset
        inner = build_dataset(cfg["dataset"])
        return CBGSDataset(inner)
    if cfg.get("type") == "RepeatDataset":
        inner = build_dataset(cfg["dataset"])
        times = cfg.get("times", 1)
        from .cbgs import RepeatDataset
        return RepeatDataset(inner, times)
    return build_from_cfg(cfg, DATASETS)


class EpochSampler:
    """Deterministic seeded shuffling + per-host sharding
    (reference DistributedSampler.set_epoch semantics)."""

    def __init__(self, n: int, shuffle: bool = True, seed: int = 0,
                 shard_index: int = 0, num_shards: int = 1):
        self.n = n
        self.shuffle = shuffle
        self.seed = seed
        self.shard_index = shard_index
        self.num_shards = num_shards

    def indices(self, epoch: int) -> np.ndarray:
        if self.shuffle:
            rng = np.random.RandomState(self.seed + epoch)
            order = rng.permutation(self.n)
        else:
            order = np.arange(self.n)
        # round up so every shard gets equal count (reference pads)
        per = int(np.ceil(self.n / self.num_shards))
        total = per * self.num_shards
        order = np.concatenate([order, order[:total - self.n]])
        return order[self.shard_index::self.num_shards]


class DataLoader:
    """Thread-prefetched batched loader over a map-style dataset."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 num_workers: int = 4, seed: int = 0, drop_last: bool =
                 True, shard_index: int = 0, num_shards: int = 1,
                 prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_workers = max(num_workers, 1)
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.sampler = EpochSampler(len(dataset), shuffle, seed,
                                    shard_index, num_shards)
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self) -> int:
        n = len(self.sampler.indices(0))
        return n // self.batch_size if self.drop_last else \
            int(np.ceil(n / self.batch_size))

    def __iter__(self) -> Iterator[dict]:
        idx = self.sampler.indices(self.epoch)
        n_batches = len(self)
        batches = [idx[i * self.batch_size:(i + 1) * self.batch_size]
                   for i in range(n_batches)]
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def worker():
            try:
                for b in batches:
                    if stop.is_set():
                        return
                    samples = [self.dataset[int(i)] for i in b]
                    q.put(collate_samples(samples))
            finally:
                q.put(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    return
                yield batch
        finally:
            stop.set()


def build_dataloader(dataset, samples_per_gpu: int, workers_per_gpu: int,
                     num_gpus: int = 1, dist: bool = False,
                     shuffle: bool = True, seed: Optional[int] = None,
                     **kwargs) -> DataLoader:
    """mmcv-compatible signature; num_gpus/dist map to host sharding."""
    try:
        import jax
        shard_index = jax.process_index()
        num_shards = jax.process_count()
    except Exception:
        shard_index, num_shards = 0, 1
    return DataLoader(dataset, batch_size=samples_per_gpu,
                      shuffle=shuffle, num_workers=workers_per_gpu,
                      seed=seed or 0, shard_index=shard_index,
                      num_shards=num_shards)
