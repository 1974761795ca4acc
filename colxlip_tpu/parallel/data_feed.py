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


def pack_batch(images: np.ndarray, texts: np.ndarray) -> np.ndarray:
    """Fuse a uint8 image batch and an int32 token batch into ONE per-sample
    byte buffer [B, img_bytes + 2*ctx] for a single host->device transfer.

    Every transfer on a PCIe/relay link carries a fixed per-call cost (this
    container's relay: ~30-40 ms/put — a measurable slice of a ViT-L step);
    one put per step instead of two hides it. Token ids are < 49408 so they
    ship as little-endian uint16 pairs (half the text bytes as a bonus);
    ``unpack_batch`` is the in-jit inverse.
    """
    if images.dtype != np.uint8:
        raise ValueError(
            "packed feed requires a uint8 wire format (--normalize-on-device "
            f"or --ship-format yuv420); got images {images.dtype}")
    b = images.shape[0]
    if texts.shape[0] != b:
        raise ValueError(f"batch mismatch: {images.shape} vs {texts.shape}")
    if texts.min() < 0 or texts.max() >= 1 << 16:
        raise ValueError("token ids must fit uint16 for the packed feed")
    txt_u8 = np.ascontiguousarray(texts.astype("<u2")).view(np.uint8)
    return np.concatenate(
        [images.reshape(b, -1), txt_u8.reshape(b, -1)], axis=1)


def unpack_batch(buf, img_shape, ctx: int):
    """In-jit inverse of :func:`pack_batch`: [B, bytes] uint8 ->
    (images [B, *img_shape] uint8, texts [B, ctx] int32). Endian-explicit
    integer reassembly (lo | hi << 8), no bitcast."""
    import jax.numpy as jnp

    b = buf.shape[0]
    n_img = 1
    for d in img_shape:
        n_img *= d
    images = buf[:, :n_img].reshape((b,) + tuple(img_shape))
    t = buf[:, n_img:].reshape(b, ctx, 2).astype(jnp.int32)
    texts = t[..., 0] | (t[..., 1] << 8)
    return images, texts


class DeviceFeeder:
    """Wraps a host-local batch iterator into global sharded arrays.

    With ``packed=True`` the feeder fuses (images, texts) into one buffer
    (``pack_batch``) and returns ``(buf, None)`` — the train step must have
    been built with the matching ``packed_feed`` spec so it unpacks in-jit.
    """

    def __init__(self, mesh: Optional[Mesh], packed: bool = False):
        self.mesh = mesh
        self.packed = packed
        if mesh is not None:
            self.sharding = NamedSharding(mesh, P(DATA_AXIS))
        else:
            self.sharding = None

    def _put(self, arr: np.ndarray):
        if self.sharding is None or jax.process_count() == 1:
            if self.sharding is not None:
                return jax.device_put(arr, self.sharding)
            return jax.numpy.asarray(arr)
        return jax.make_array_from_process_local_data(self.sharding, arr)

    def __call__(self, images: np.ndarray, texts: np.ndarray):
        if self.packed:
            return self._put(pack_batch(images, np.asarray(texts))), None
        return self._put(images), self._put(texts)
