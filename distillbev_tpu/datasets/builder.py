"""Dataset + dataloader construction.

Capability parity with the reference builders
(reference: mmdet3d/datasets/builder.py:31-120 build_dataset /
build_dataloader; datasets/samplers/group_sampler.py — seeded
DistributedSampler/DistributedGroupSampler; dataset_wrappers.py:8 CBGS).

TPU-native loader: a fork-based worker-process pipeline producing numpy
batches (the Python pipeline is GIL-bound — PIL decode + transform logic
serialize under threads, measured 1.3x scaling 1->4 threads vs ~linear
with processes); per-host sharding happens by slicing the global index
stream by ``jax.process_index()`` (the GSPMD analogue of rank-sliced
samplers).  Workers never touch JAX — fork is safe for the numpy-only
children even with an initialized TPU client in the parent.
"""
from __future__ import annotations

import itertools
import multiprocessing as mp
import os
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


def _worker_seed(seed: int, epoch: int, worker_id: int) -> int:
    """Distinct, deterministic numpy seed per (run seed, epoch, worker).
    Fork inherits the parent's np.random state verbatim, so without this
    every worker would draw the identical augmentation stream and repeat
    it every epoch (the PyTorch worker_init_fn problem)."""
    return (seed * 1000003 + epoch * 8191 + worker_id) & 0xFFFFFFFF


def _proc_worker(dataset, task_q, result_q, reseed: int):
    """Worker-process loop: indices in, collated batches out.  Runs
    pure numpy/PIL/C++ code — never JAX."""
    np.random.seed(reseed)
    while True:
        item = task_q.get()
        if item is None:
            return
        bid, idxs = item
        samples = [dataset[int(i)] for i in idxs]
        result_q.put((bid, collate_samples(samples)))


class DataLoader:
    """Multi-process (fork) prefetched batched loader over a map-style
    dataset.  ``use_processes=False`` falls back to a single prefetch
    thread (tests / non-POSIX)."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 num_workers: int = 4, seed: int = 0, drop_last: bool =
                 True, shard_index: int = 0, num_shards: int = 1,
                 prefetch: int = 2,
                 use_processes: Optional[bool] = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_workers = max(num_workers, 1)
        self.drop_last = drop_last
        self.prefetch = prefetch
        if use_processes is None:
            env = os.environ.get("DISTILLBEV_LOADER_PROCS")
            if env is not None:
                use_processes = env not in ("0", "false", "False")
            else:
                use_processes = os.name == "posix" and \
                    self.num_workers > 1
        self.use_processes = use_processes
        self.seed = seed
        self.sampler = EpochSampler(len(dataset), shuffle, seed,
                                    shard_index, num_shards)
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self) -> int:
        n = len(self.sampler.indices(0))
        return n // self.batch_size if self.drop_last else \
            int(np.ceil(n / self.batch_size))

    def _batches(self):
        idx = self.sampler.indices(self.epoch)
        return [idx[i * self.batch_size:(i + 1) * self.batch_size]
                for i in range(len(self))]

    def __iter__(self) -> Iterator[dict]:
        if self.use_processes:
            yield from self._iter_processes()
        else:
            yield from self._iter_thread()

    def _iter_processes(self) -> Iterator[dict]:
        """Fan indices out to fork()ed workers; yield batches in order
        (a reorder buffer keeps the sampler's determinism)."""
        batches = self._batches()
        nw = self.num_workers
        ctx = mp.get_context("fork")
        # One task queue per worker: batch->worker assignment is
        # deterministic round-robin (bid % nw), so each worker's RNG
        # stream meets the same batches every run — (seed, epoch)
        # fully reproduces the epoch's augmentations.
        task_qs = [ctx.Queue() for _ in range(nw)]
        result_q = ctx.Queue(maxsize=nw * 2)
        procs = [ctx.Process(
            target=_proc_worker,
            args=(self.dataset, task_qs[wid], result_q,
                  _worker_seed(self.seed, self.epoch, wid)),
            daemon=True)
            for wid in range(nw)]
        for p in procs:
            p.start()
        try:
            # Feed incrementally so the reorder buffer stays bounded:
            # with the whole epoch enqueued up front, one slow batch
            # lets the other workers race ahead and the parent buffers
            # an unbounded prefix of completed ~100MB batches.
            iters = [iter([(bid, b) for bid, b in enumerate(batches)
                           if bid % nw == wid]) for wid in range(nw)]
            in_flight = [0] * nw
            done = [False] * nw
            max_per_worker = 2

            def feed(wid):
                while in_flight[wid] < max_per_worker:
                    try:
                        bid, b = next(iters[wid])
                    except StopIteration:
                        if not done[wid]:
                            task_qs[wid].put(None)
                            done[wid] = True
                        return
                    task_qs[wid].put((bid, b))
                    in_flight[wid] += 1

            for wid in range(nw):
                feed(wid)
            pending: dict = {}
            for want in range(len(batches)):
                while want not in pending:
                    bid, batch = result_q.get()
                    in_flight[bid % nw] -= 1
                    pending[bid] = batch
                    feed(bid % nw)
                yield pending.pop(want)
        finally:
            for p in procs:
                p.terminate()
            for p in procs:
                p.join(timeout=5)

    def _iter_thread(self) -> Iterator[dict]:
        batches = self._batches()
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def worker():
            np.random.seed(_worker_seed(self.seed, self.epoch, 0))
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
