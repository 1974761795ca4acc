"""Device mesh construction.

The TPU-native replacement for the reference's process-group init
(open_clip_train.distributed.init_distributed_device, SURVEY.md §2.2): one
jax runtime per host, a ``jax.sharding.Mesh`` over all chips, collectives on
ICI. The reference's DDP data parallelism maps to a 1-D ``('data',)`` mesh; a
2-D ``('data', 'model')`` mesh is supported for optional tensor sharding of
the towers (SURVEY.md §2.3: TP "comes nearly free under pjit").
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def _slice_ids(devices: Sequence, num_slices: Optional[int]) -> list:
    """Slice id per device. Real multi-slice TPU deployments expose
    ``device.slice_index``; ``num_slices`` forces a virtual partition into
    equal contiguous groups (for CPU-mesh tests and dryruns)."""
    if num_slices is not None:
        if num_slices < 1 or len(devices) % num_slices:
            raise ValueError(
                f"num_slices={num_slices} must divide {len(devices)} devices")
        per = len(devices) // num_slices
        return [i // per for i in range(len(devices))]
    ids = [getattr(d, "slice_index", None) for d in devices]
    if any(i is None for i in ids):
        return [0] * len(devices)
    return ids


def slice_major_device_array(
    devices: Sequence, model_parallel: int, slice_ids: Sequence[int]
) -> np.ndarray:
    """Order devices so the mesh maps onto the ICI/DCN hierarchy:

    - the 'model' axis (fastest-varying) stays entirely WITHIN a slice, so
      tensor-parallel collectives (the per-layer all-reduces) ride ICI only;
    - the 'data' axis is slice-major: consecutive data-axis neighbors share
      a slice except at the num_slices-1 slice boundaries, so ring/all-gather
      data collectives cross DCN the minimum number of times.

    SURVEY §2.3 backend row: "jax distributed runtime over ICI (intra-slice)
    / DCN (multi-slice)". Single-slice inputs reduce to the plain reshape.
    """
    groups: dict = {}
    for d, s in zip(devices, slice_ids):
        groups.setdefault(s, []).append(d)
    sizes = {len(g) for g in groups.values()}
    if len(sizes) != 1:
        raise ValueError(
            f"unequal devices per slice: { {k: len(v) for k, v in groups.items()} }")
    per = sizes.pop()
    if per % model_parallel:
        raise ValueError(
            f"model_parallel={model_parallel} must divide the {per} devices "
            "of one slice — a model axis spanning DCN would put per-layer "
            "all-reduces on the slow interconnect")
    rows = [np.asarray(groups[s], dtype=object).reshape(per // model_parallel,
                                                        model_parallel)
            for s in sorted(groups)]
    return np.concatenate(rows, axis=0)


def create_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    devices: Optional[Sequence] = None,
    num_slices: Optional[int] = None,
) -> Mesh:
    """Build a ('data',) or ('data', 'model') mesh over the available chips,
    slice-aware on multi-slice (DCN-connected) deployments."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"create_mesh: asked for {n_devices} devices but only "
                f"{len(devices)} are available — a silently smaller mesh "
                "would skew batch/sharding assumptions")
        devices = devices[:n_devices]
    arr = slice_major_device_array(
        devices, model_parallel, _slice_ids(devices, num_slices))
    if model_parallel > 1:
        return Mesh(arr, (DATA_AXIS, MODEL_AXIS))
    return Mesh(arr.reshape(-1), (DATA_AXIS,))


def batch_spec(mesh: Mesh) -> P:
    return P(DATA_AXIS)


def replicated_spec(mesh: Mesh) -> P:
    return P()


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Multi-host runtime init (jax.distributed.initialize), the analog of the
    reference's torchrun/env:// rendezvous (main.py:90). No-op on one host."""
    if num_processes is None or num_processes <= 1:
        return
    try:
        # cross-process collectives on the CPU backend need a transport;
        # gloo ships in jaxlib. Only consulted when a CPU client is created
        # (the multi-host CPU-mesh tests; harmless on TPU, where collectives
        # ride ICI/DCN through the TPU client).
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:  # older jaxlib without the option
        pass
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
