"""One process of a 2-process CPU-mesh driver run (spawned by
tests/test_multihost.py).

This is the real multi-HOST path — ``jax.distributed.initialize`` rendezvous
(the analog of the reference's torchrun env:// init, reference main.py:90),
gloo collectives BETWEEN processes, per-host synthetic data shards assembled
into global arrays by ``make_array_from_process_local_data`` — not the
single-process 8-virtual-device simulation the rest of the suite uses.

Usage: python tests/multihost_worker.py <process_id> <num_processes> <port>
       <logs_dir> [epochs] [extra driver args...]
"""
import os
import sys


def main() -> int:
    pid, nproc, port, logs = (int(sys.argv[1]), int(sys.argv[2]),
                              sys.argv[3], sys.argv[4])
    epochs = sys.argv[5] if len(sys.argv) > 5 else "2"
    extra = sys.argv[6:]
    # OVERRIDE any inherited device-count flag (the pytest parent's conftest
    # exports an 8-device XLA_FLAGS; each worker must get exactly 8/nproc)
    flags = " ".join(
        f for f in os.environ.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f)
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={8 // nproc}")

    import jax

    # same dance as tests/conftest.py: the container's sitecustomize
    # pre-registers the TPU plugin, so force the platform via config
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    from colxlip_tpu.main import main as driver_main

    return driver_main([
        "--model", "ViT-S-16-test",
        "--dataset-type", "synthetic",
        "--train-num-samples", "64",
        "--batch-size", "2",
        "--epochs", epochs,
        "--lr", "1e-3",
        "--warmup", "2",
        "--precision", "fp32",
        "--logs", logs,
        "--name", "mh",
        "--workers", "0",
        "--log-every-n-steps", "1",
        "--save-frequency", "1",
        "--resume", "latest",   # exercises the rank-0 discovery broadcast
        "--maxsim-impl", "xla",
        "--seed", "0",
        "--report-to", "jsonl",
        "--dist-coordinator", f"localhost:{port}",
        "--dist-num-processes", str(nproc),
        "--dist-process-id", str(pid),
    ] + extra)


if __name__ == "__main__":
    sys.exit(main())
