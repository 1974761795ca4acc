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


def create_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ('data',) or ('data', 'model') mesh over the available chips."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"create_mesh: asked for {n_devices} devices but only "
                f"{len(devices)} are available — a silently smaller mesh "
                "would skew batch/sharding assumptions")
        devices = devices[:n_devices]
    n = len(devices)
    if model_parallel > 1:
        assert n % model_parallel == 0, (n, model_parallel)
        arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
        return Mesh(arr, (DATA_AXIS, MODEL_AXIS))
    return Mesh(np.asarray(devices), (DATA_AXIS,))


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
