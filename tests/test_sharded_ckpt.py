"""Distributed (sharded-state) checkpoint surface, unit-level on one process.

The cross-PROCESS behavior (2 real jax processes, shards on different hosts)
is covered by tests/test_multihost.py::test_two_process_fsdp_sharded_checkpoint_resume;
these pin the save/restore/rotation contracts of
``save_checkpoint_sharded`` / ``restore_sharded_checkpoint`` on the
single-process 8-device mesh where they are cheap to exercise.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from colxlip_tpu.training import checkpoint as ck


def _sharded_state(value_offset=0.0):
    mesh = Mesh(np.array(jax.devices()).reshape(8), ("data",))
    w = jax.device_put(
        jnp.arange(32, dtype=jnp.float32).reshape(8, 4) + value_offset,
        NamedSharding(mesh, P("data")))
    scale = jax.device_put(jnp.float32(7.0 + value_offset),
                           NamedSharding(mesh, P()))
    return {"step": jnp.int32(3), "params": {"w": w, "scale": scale}}


def test_sharded_save_restore_roundtrip(tmp_path):
    state = _sharded_state()
    d = str(tmp_path / "ckpts")
    p = ck.save_checkpoint_sharded(d, state, epoch=2, name="t")
    assert p.endswith("epoch_2")
    # restore INTO a differently-valued template with the same shardings:
    # values must come from disk, layout from the template
    template = _sharded_state(value_offset=100.0)
    restored = ck.restore_sharded_checkpoint(p, template)
    assert restored["epoch"] == 2 and restored["name"] == "t"
    s = restored["state"]
    np.testing.assert_array_equal(np.asarray(s["params"]["w"]),
                                  np.arange(32, dtype=np.float32).reshape(8, 4))
    assert float(s["params"]["scale"]) == 7.0
    assert int(s["step"]) == 3
    assert s["params"]["w"].sharding == template["params"]["w"].sharding


def test_sharded_mid_epoch_sidecar(tmp_path):
    state = _sharded_state()
    d = str(tmp_path / "ckpts")
    p = ck.save_checkpoint_sharded(d, state, epoch=1, name="t",
                                   most_recent=True, step_in_epoch=5)
    assert p.endswith("epoch_latest")
    assert ck.read_step_in_epoch(p) == 5


def test_background_sharded_save_defers_rotation(tmp_path):
    d = str(tmp_path / "ckpts")
    ck.save_checkpoint_sharded(d, _sharded_state(), epoch=1, name="t")
    assert os.path.isdir(os.path.join(d, "epoch_1"))
    p = ck.save_checkpoint_sharded(d, _sharded_state(1.0), epoch=2, name="t",
                                   background=True, rotate_keep_epoch=2)
    # rotation must not run until the superseding save is durable
    ck.wait_for_saves()
    assert not os.path.isdir(os.path.join(d, "epoch_1"))
    restored = ck.restore_sharded_checkpoint(p, _sharded_state())
    np.testing.assert_array_equal(
        np.asarray(restored["state"]["params"]["w"]),
        np.arange(32, dtype=np.float32).reshape(8, 4) + 1.0)
