"""Device mesh + sharding helpers (GSPMD data parallelism).

Replaces the reference's distributed stack (reference: torch DDP wrap
apis/mmdet_train.py:72-86, NCCL init tools/train.py:137-144,
DistributedSampler datasets/samplers/) with the TPU-native formulation
(SURVEY.md §2.8): one ``jax.sharding.Mesh`` over the slice, batch-sharded
``NamedSharding(('data',))`` inputs, replicated params, and XLA-inserted
psum for gradients.  No explicit collectives in user code.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence] = None,
              axis_name: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over all (or given) devices."""
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), (axis_name,))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (batch) across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch pytree with the batch axis sharded over ICI."""
    sh = data_sharding(mesh)

    def place(x):
        return jax.device_put(x, sh)

    return jax.tree_util.tree_map(place, batch)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def local_batch_slice(global_batch: int, process_index: Optional[int] = None,
                      process_count: Optional[int] = None) -> slice:
    """Per-host shard of the global batch (multi-host input pipelines;
    the analogue of DistributedSampler rank slicing)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    assert global_batch % pc == 0
    per = global_batch // pc
    return slice(pi * per, (pi + 1) * per)
