"""Dataset wrappers: class-balanced resampling + repeat.

Capability parity with the reference's ``CBGSDataset``
(reference: mmdet3d/datasets/dataset_wrappers.py:8-70 — per-class index
pools resampled so each class approaches 1/K frequency) and mmdet's
RepeatDataset.
"""
from __future__ import annotations

import numpy as np


class CBGSDataset:

    def __init__(self, dataset):
        self.dataset = dataset
        self.CLASSES = dataset.CLASSES
        self.sample_indices = self._get_sample_indices()
        self.flag = np.zeros(len(self), dtype=np.uint8)

    def _get_sample_indices(self):
        class_sample_idxs = {i: [] for i in range(len(self.CLASSES))}
        for idx in range(len(self.dataset)):
            for cat_id in self.dataset.get_cat_ids(idx):
                class_sample_idxs[cat_id].append(idx)
        duplicated = sum(len(v) for v in class_sample_idxs.values())
        class_ratios = {k: len(v) / max(duplicated, 1)
                        for k, v in class_sample_idxs.items()}
        frac = 1.0 / len(self.CLASSES)
        ratios = [frac / max(v, 1e-9) for v in class_ratios.values()]
        sample_indices = []
        for cls_inds, ratio in zip(class_sample_idxs.values(), ratios):
            n = int(len(cls_inds) * ratio)
            if len(cls_inds) == 0:
                continue
            sample_indices += np.random.choice(cls_inds, n).tolist()
        return sample_indices or list(range(len(self.dataset)))

    def __len__(self):
        return len(self.sample_indices)

    def __getitem__(self, idx):
        return self.dataset[self.sample_indices[idx]]

    def get_cat_ids(self, idx):
        return self.dataset.get_cat_ids(self.sample_indices[idx])

    def evaluate(self, *args, **kwargs):
        return self.dataset.evaluate(*args, **kwargs)


class RepeatDataset:

    def __init__(self, dataset, times: int):
        self.dataset = dataset
        self.times = times
        self.CLASSES = dataset.CLASSES
        self.flag = np.zeros(len(self), dtype=np.uint8)

    def __len__(self):
        return len(self.dataset) * self.times

    def __getitem__(self, idx):
        return self.dataset[idx % len(self.dataset)]

    def evaluate(self, *args, **kwargs):
        return self.dataset.evaluate(*args, **kwargs)
