"""Short-horizon loss-trajectory drift of the int8 forward paths vs bf16.

VERDICT r4 #5 asks for the e2e throughput A/B *and* a loss-trajectory drift
measurement for the int8 precision-headroom experiments. This drives a real
ViT-B/16 colclip train loop (synthetic correlated pairs, fixed seed) and
prints the loss trajectory as one JSON line; run once per config and diff:

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/int8_drift.py
    COLXLIP_MLP_INT8=fwd PYTHONPATH=... python scripts/int8_drift.py
    PYTHONPATH=... python scripts/int8_drift.py --maxsim-impl streaming_int8

The int8 knobs are forward-noise-only by construction (straight-through /
recompute backward, ops/quantization.py + ops/maxsim.py), so the drift here
measures how that forward noise steers optimization, not gradient bias.
"""
import argparse
import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="ViT-B-16-colxlip")
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--log-every", type=int, default=10)
    p.add_argument("--pool-batches", type=int, default=8,
                   help="number of distinct device-resident batches cycled "
                        "(data repeats, so the loss can actually fall)")
    p.add_argument("--maxsim-impl", default="auto",
                   choices=["auto", "xla", "streaming", "streaming_int8",
                            "chunked", "pallas"])
    p.add_argument("--image-size", type=int, default=224)
    args = p.parse_args()

    from colxlip_tpu.models import CLIPCfg, ColXLIP, get_model_config
    from colxlip_tpu.parallel.train_step import (
        TrainStepConfig, init_train_state, make_train_step,
    )
    from colxlip_tpu.training.optim import create_optimizer
    from colxlip_tpu.training.schedules import cosine_lr

    cfg = CLIPCfg.from_dict(get_model_config(args.model))
    model = ColXLIP(cfg, dtype=jnp.bfloat16)

    b, s = args.batch_size, args.image_size
    rng = np.random.default_rng(0)
    pools_img, pools_txt = [], []
    for k in range(args.pool_batches):
        imgs = rng.standard_normal((b, s, s, 3)).astype(np.float32) * 0.3
        # class-correlated structure so contrastive training has signal
        cls = (np.arange(b) + k * b)
        imgs += (cls % 97)[:, None, None, None].astype(np.float32) * 0.02
        txts = np.zeros((b, cfg.text_cfg.context_length), np.int32)
        txts[:, 0] = 49406
        txts[:, 1:9] = (100 + 13 * cls[:, None] + np.arange(8)) % 49000 + 1
        txts[:, 9] = 49407
        pools_img.append(jnp.asarray(imgs))
        pools_txt.append(jnp.asarray(txts))

    tx = create_optimizer(cosine_lr(1e-4, 20, args.steps), weight_decay=0.2)
    state = init_train_state(model, tx, jax.random.PRNGKey(0),
                             pools_img[0][:2], pools_txt[0][:2])
    step = make_train_step(
        model, tx,
        TrainStepConfig(loss_type="colclip", maxsim_impl=args.maxsim_impl),
        donate=True)

    traj = []
    t0 = time.perf_counter()
    for i in range(args.steps):
        k = i % args.pool_batches
        state, metrics = step(state, pools_img[k], pools_txt[k])
        if i % args.log_every == 0 or i == args.steps - 1:
            traj.append((i, float(jax.device_get(metrics["total_loss"]))))
    dt = time.perf_counter() - t0

    print(json.dumps({
        "config": {"mlp_int8": os.environ.get("COLXLIP_MLP_INT8", ""),
                   "maxsim_impl": args.maxsim_impl,
                   "model": args.model, "batch": b, "steps": args.steps},
        "trajectory": [[i, round(v, 4)] for i, v in traj],
        "final_loss": round(traj[-1][1], 4),
        "wall_s": round(dt, 1),
    }))


if __name__ == "__main__":
    main()
