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
    model = ColXLIP(cfg, dtype=jnp.bfloat16)
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
    """Top ops by self-time via the tensorboard profile plugin converters."""
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    params = {"tqx": "out:json;"}
    for tool in ("op_profile", "overview_page"):
        try:
            data, _ = rtd.xspace_to_tool_data([xplane], tool, params)
        except Exception as e:  # noqa: BLE001
            print(f"[{tool}] failed: {e}")
            continue
        if tool == "op_profile":
            _print_op_profile(data, top)
        else:
            _print_overview(data)


def _walk(node, depth, rows):
    m = node.get("metrics", {})
    rows.append((m.get("time", 0.0), depth, node.get("name", "?"),
                 m.get("flops", 0.0), m.get("memoryBandwidth", 0.0)))
    for c in node.get("children", []):
        _walk(c, depth + 1, rows)


def _print_op_profile(data, top) -> None:
    prof = json.loads(data) if isinstance(data, (str, bytes)) else data
    root = prof.get("byProgram") or prof.get("byCategory")
    if root is None:
        print(json.dumps(prof)[:2000])
        return
    rows = []
    _walk(root, 0, rows)
    # keep leaf-ish rows (depth>=2), sorted by time fraction
    leaves = sorted((r for r in rows if r[1] >= 2), reverse=True)[:top]
    print(f"{'time%':>7} {'flops%':>7} {'bw':>8}  op")
    for t, _, name, fl, bw in leaves:
        print(f"{t*100:7.2f} {fl*100:7.2f} {bw:8.2f}  {name[:110]}")


def _print_overview(data) -> None:
    try:
        ov = json.loads(data) if isinstance(data, (str, bytes)) else data
        print(json.dumps(ov)[:1500])
    except Exception:
        pass


if __name__ == "__main__":
    main()
