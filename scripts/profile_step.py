#!/usr/bin/env python
"""Capture a jax.profiler trace of the train step and print the op breakdown.

Usage (TPU):
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_step.py \
        --loss colclip --batch-size 256 [--out /tmp/prof]

Prints the top HLO ops by self-time from the captured xplane so kernel-level
optimization targets are visible without a TensorBoard UI.
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="ViT-B-16-colxlip")
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--loss", default="colclip")
    p.add_argument("--gelu", default="erf", choices=["erf", "tanh"])
    p.add_argument("--remat", default="", choices=["", "full", "mlp", "mlp_scope", "act"])
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--out", default="/tmp/prof")
    p.add_argument("--top", type=int, default=40)
    args = p.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import dataclasses
    import jax.numpy as jnp
    import numpy as np
    from colxlip_tpu.models import ColXLIP, CLIPCfg, get_model_config
    from colxlip_tpu.parallel.train_step import (
        TrainStepConfig, init_train_state, make_train_step,
    )
    from colxlip_tpu.training.optim import create_optimizer
    from colxlip_tpu.training.schedules import cosine_lr

    cfg = CLIPCfg.from_dict(get_model_config(args.model))
    cfg = dataclasses.replace(cfg, gelu_approximate=args.gelu == "tanh")
    remat = {"": False, "full": True, "mlp": "mlp",
             "mlp_scope": "mlp_scope", "act": "act"}[args.remat]
    model = ColXLIP(cfg, dtype=jnp.bfloat16, remat=remat)
    tx = create_optimizer(cosine_lr(1e-3, 100, 10000), weight_decay=0.2)

    b = args.batch_size
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((b, 224, 224, 3)).astype(np.float32))
    texts_np = np.zeros((b, cfg.text_cfg.context_length), np.int32)
    texts_np[:, 0] = 49406
    texts_np[:, 1:20] = rng.integers(1, 49000, (b, 19))
    texts_np[:, 20] = 49407
    texts = jnp.asarray(texts_np)

    state = init_train_state(model, tx, jax.random.PRNGKey(0), images[:2], texts[:2])
    step = make_train_step(
        model, tx, TrainStepConfig(loss_type=args.loss), donate=True)

    # warmup / compile
    for _ in range(2):
        state, metrics = step(state, images, texts)
    jax.device_get(metrics["total_loss"])

    t0 = time.perf_counter()
    with jax.profiler.trace(args.out):
        for _ in range(args.steps):
            state, metrics = step(state, images, texts)
        jax.device_get(metrics["total_loss"])
    dt = time.perf_counter() - t0
    print(f"{args.steps} steps in {dt*1e3:.1f} ms -> "
          f"{args.steps * b / dt:.1f} img/s ({dt/args.steps*1e3:.1f} ms/step)")

    xplanes = sorted(glob.glob(
        os.path.join(args.out, "**", "*.xplane.pb"), recursive=True))
    if not xplanes:
        print("no xplane captured")
        return
    xplane = xplanes[-1]
    print(f"parsing {xplane}")
    summarize(xplane, args.top)


def summarize(xplane: str, top: int) -> None:
    """Top ops by device self-time, parsed straight from the XSpace proto.

    (The tensorboard_plugin_profile converters are broken in this image —
    protobuf/pywrap version skew — so read the TPU plane's "XLA Ops" line
    directly.)
    """
    import re
    from collections import defaultdict

    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(xplane, "rb") as f:
        xs.ParseFromString(f.read())
    for plane in xs.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        evmeta = plane.event_metadata
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            agg = defaultdict(float)
            cnt = defaultdict(int)
            remat = defaultdict(float)
            total = 0.0
            for ev in line.events:
                name = evmeta[ev.metadata_id].name
                fam = re.sub(r"\.\d+", "", name.split(" = ")[0])
                shape = name.split(" = ")[1].split(" ")[0] if " = " in name else ""
                key = f"{fam} {shape}"
                dur = ev.duration_ps / 1e9
                agg[key] += dur
                cnt[key] += 1
                total += dur
                if ".remat" in name:
                    remat[key] += dur
            print(f"total device op-time {total:.1f} ms "
                  f"(remat re-execution {sum(remat.values()):.1f} ms)")
            for key, t in sorted(agg.items(), key=lambda kv: -kv[1])[:top]:
                r = f" [remat {remat[key]:.1f}]" if remat.get(key) else ""
                print(f"{t:9.2f} ms  x{cnt[key]:<5d} {key[:100]}{r}")


if __name__ == "__main__":
    main()
