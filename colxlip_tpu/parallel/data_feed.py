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


def local_batch_size(per_device_batch: int) -> int:
    return per_device_batch * jax.local_device_count()


def global_batch_size(per_device_batch: int) -> int:
    return per_device_batch * jax.device_count()


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
