#!/usr/bin/env python
"""Root-cause the batch-512 remat cliff (VERDICT r3 weak #2 / next #2).

Measured facts (docs/BENCH.md): colclip-erf 793-805 img/s at batch 256 but
663 at 384 and 645 at 512 — per-image step time INCREASES with batch, i.e.
XLA re-enters rematerialization re-execution under HBM pressure. This script
compares the compiled train step across batch sizes on the real TPU target:
instructions, fusion/dot counts normalized per image, how many times the
[B,N,4D] c_fc hidden is (re)produced, remat clone markers, and the
buffer-assignment temp/peak sizes.

Usage (TPU):
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/cliff_analysis.py \
        [--batches 256,384,512] [--gelu erf] [--remat-policy '']
"""
from __future__ import annotations

import argparse
import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_step(args, batch_size: int):
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from colxlip_tpu.models import CLIPCfg, ColXLIP, get_model_config
    from colxlip_tpu.parallel.train_step import (
        TrainStepConfig,
        init_train_state,
        make_train_step,
    )
    from colxlip_tpu.training.optim import create_optimizer
    from colxlip_tpu.training.schedules import cosine_lr

    cfg = CLIPCfg.from_dict(get_model_config(args.model))
    cfg = dataclasses.replace(cfg, gelu_approximate=args.gelu == "tanh")
    model = ColXLIP(cfg, dtype=jnp.bfloat16, remat=args.remat or False)
    tx = create_optimizer(cosine_lr(1e-3, 100, 10000), weight_decay=0.2)
    b = batch_size
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.standard_normal((b, 224, 224, 3)).astype(np.float32))
    texts_np = np.zeros((b, cfg.text_cfg.context_length), np.int32)
    texts_np[:, 0] = 49406
    texts_np[:, 1:20] = rng.integers(1, 49000, (b, 19))
    texts_np[:, 20] = 49407
    texts = jnp.asarray(texts_np)
    state = init_train_state(
        model, tx, jax.random.PRNGKey(0), images[:2], texts[:2])
    step = make_train_step(
        model, tx,
        TrainStepConfig(loss_type=args.loss, accum_freq=args.accum_freq),
        donate=True)
    return step, state, images, texts


def analyze(args, b: int) -> None:
    step, state, images, texts = build_step(args, b)
    compiled = step.lower(state, images, texts).compile()
    txt = compiled.as_text()
    path = os.path.join(args.out, f"hlo_b{b}.txt")
    with open(path, "w") as f:
        f.write(txt)
    lines = txt.splitlines()
    n_vis = (224 // int(args.model.split("-")[2].split("/")[0]
                        if "/" in args.model else 16)) ** 2 + 1
    wide_shapes = [f"{b},197,3072", f"{b},77,2048"]
    fusions = sum(1 for l in lines if re.search(r"= \S*fusion\(", l))
    dots = sum(1 for l in lines if "convolution(" in l or " dot(" in l)
    clones = sum(1 for l in lines if ".clone" in l)
    remat = sum(1 for l in lines if "remat" in l)
    print(f"== batch {b} ==")
    print(f"  instructions {len(lines)}  fusions {fusions}  dots/convs {dots}"
          f"  .clone markers {clones}  'remat' mentions {remat}")
    for ws in wide_shapes:
        defs = [l for l in lines if ws in l and re.search(r"%\S+ = ", l)]
        producers = collections.Counter(
            m.group(1) for l in defs
            if (m := re.search(r"= (\S+?)\(", l)))
        print(f"  [{ws}] defs {len(defs)} producers {dict(producers)}")
    try:
        mem = compiled.memory_analysis()
        print(f"  memory: temp={mem.temp_size_in_bytes/1e9:.2f} GB "
              f"args={mem.argument_size_in_bytes/1e9:.2f} GB "
              f"output={mem.output_size_in_bytes/1e9:.2f} GB "
              f"alias={mem.alias_size_in_bytes/1e9:.2f} GB")
    except Exception as e:  # noqa: BLE001
        print(f"  memory_analysis unavailable: {e}")
    try:
        cost = compiled.cost_analysis()
        print(f"  flops/img: {cost['flops']/b/1e9:.1f} GF  "
              f"(total {cost['flops']/1e12:.2f} TF/step)")
    except Exception as e:  # noqa: BLE001
        print(f"  cost_analysis unavailable: {e}")
    print(f"  full HLO -> {path}")


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="ViT-B-16-colxlip")
    p.add_argument("--loss", default="colclip")
    p.add_argument("--gelu", default="erf")
    p.add_argument("--accum-freq", type=int, default=1)
    p.add_argument("--remat", default="",
                   help="model remat knob ('', 'full', 'mlp', 'mlp_scope', "
                        "'act')")
    p.add_argument("--batches", default="256,384,512")
    p.add_argument("--out", default="/tmp")
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    for b in [int(x) for x in args.batches.split(",")]:
        analyze(args, b)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
