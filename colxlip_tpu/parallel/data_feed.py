"""Host-local batch -> global device array assembly for multi-host training.

The reference feeds each DDP rank its own batch (torchrun, one process per
GPU). The jax analog: each host's input pipeline yields a LOCAL batch
(local_device_count * per_device_batch) and
``jax.make_array_from_process_local_data`` assembles the logical global array
sharded over the 'data' mesh axis — no cross-host data movement, each host's
samples land on its own chips.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS


def global_batch_size(per_device_batch: int, model_parallel: int = 1) -> int:
    """Global batch for a per-DATA-GROUP batch: with model parallelism each
    group of ``model_parallel`` chips shares one batch shard, so the batch
    scales with the data-axis size, NOT the chip count (main.py:295-303 —
    a 'model'-replicating mesh must not inflate the batch)."""
    return per_device_batch * (jax.device_count() // model_parallel)


class DeviceFeeder:
    """Wraps a host-local batch iterator into global sharded arrays."""

    def __init__(self, mesh: Optional[Mesh]):
        self.mesh = mesh
        if mesh is not None:
            self.sharding = NamedSharding(mesh, P(DATA_AXIS))
        else:
            self.sharding = None

    def __call__(self, images: np.ndarray, texts: np.ndarray):
        if self.sharding is None or jax.process_count() == 1:
            # single host: device_put with the (possibly sharded) layout
            if self.sharding is not None:
                return (
                    jax.device_put(images, self.sharding),
                    jax.device_put(texts, self.sharding),
                )
            return jax.numpy.asarray(images), jax.numpy.asarray(texts)
        return (
            jax.make_array_from_process_local_data(self.sharding, images),
            jax.make_array_from_process_local_data(self.sharding, texts),
        )
