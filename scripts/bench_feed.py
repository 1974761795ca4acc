#!/usr/bin/env python
"""Real-data feed benchmark: measure end-to-end training img/s fed by the
actual input pipeline (vs the synthetic device-resident bound in bench.py).

VERDICT r3 #1: the JPEG feed bound ViT-B/16 batch-256 training at ~644 img/s
of the 793 synthetic bound on this 1-core host. The committed levers are
exercised here as selectable modes:

  --mode jpeg    wds tar shards of 256px JPEGs, native fused decode
  --mode packed  pre-decoded raw-uint8 shards (data/pack.py) — zero JPEG
                 work on the hot path (raw_aug=crop: the per-sample cost is
                 a tar read + numpy crop)
  --mode grain   the grain pipeline over the same shards

Usage (generation is cached; delete --root to regenerate):
  python scripts/bench_feed.py --mode packed --epochs 2 --batch-size 256

Prints per-epoch steady-state windows and a final JSON line. Timing uses
host wall clock between log points with device sync only at window edges
(per-step device_get inflates 2-4x over the relay — CLAUDE.md traps).
"""
from __future__ import annotations

import argparse
import io
import json
import os
import sys
import tarfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def generate_jpeg_shards(root: str, n_shards: int, per_shard: int,
                         size: int = 256) -> str:
    """Synthetic 256px JPEG wds shards with caption jsons (cached)."""
    import numpy as np
    from PIL import Image

    out = os.path.join(root, "jpeg")
    marker = os.path.join(out, ".complete")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(0)
    sizes = {}
    for s in range(n_shards):
        path = os.path.join(out, f"shard-{s:04d}.tar")
        with tarfile.open(path, "w") as tf:
            for i in range(per_shard):
                # low-frequency content so JPEG decode cost is realistic
                base = rng.integers(0, 255, (8, 8, 3), np.uint8)
                img = np.asarray(Image.fromarray(base).resize(
                    (size, size), Image.BILINEAR), np.uint8)
                img = np.clip(
                    img.astype(np.int16) +
                    rng.integers(-20, 20, img.shape, np.int16),
                    0, 255).astype(np.uint8)
                buf = io.BytesIO()
                Image.fromarray(img).save(buf, format="JPEG", quality=90)
                key = f"{s:04d}{i:06d}"
                data = buf.getvalue()
                ti = tarfile.TarInfo(f"{key}.jpg")
                ti.size = len(data)
                tf.addfile(ti, io.BytesIO(data))
                cap = json.dumps(
                    {"raw_caption": [f"synthetic sample {key} with some "
                                     f"caption words {int(rng.integers(1e6))}"]}
                ).encode()
                ti = tarfile.TarInfo(f"{key}.json")
                ti.size = len(cap)
                tf.addfile(ti, io.BytesIO(cap))
        sizes[os.path.basename(path)] = per_shard
        print(f"generated {path}", flush=True)
    with open(os.path.join(out, "sizes.json"), "w") as f:
        json.dump(sizes, f)
    open(marker, "w").close()
    return out


def pack(root: str, jpeg_dir: str, n_shards: int, size: int = 256) -> str:
    from colxlip_tpu.data.pack import pack_shards

    out = os.path.join(root, "packed")
    marker = os.path.join(out, ".complete")
    if os.path.exists(marker):
        return out
    urls = os.path.join(jpeg_dir, "shard-{%04d..%04d}.tar" % (0, n_shards - 1))
    t0 = time.time()
    _, total = pack_shards(urls, out, size=size, workers=1)
    print(f"packed {total} samples in {time.time() - t0:.0f}s", flush=True)
    open(marker, "w").close()
    return out


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["jpeg", "packed", "grain",
                                      "grain-packed"], default="packed")
    p.add_argument("--root", default="/tmp/bench_feed")
    p.add_argument("--model", default="ViT-B-16-colxlip")
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--n-shards", type=int, default=8)
    p.add_argument("--per-shard", type=int, default=2048)
    p.add_argument("--workers", type=int, default=2)
    p.add_argument("--generate-only", action="store_true")
    p.add_argument("--host-only", action="store_true",
                   help="drain the pipeline with NO device: pure host-side "
                        "decode+augment+tokenize throughput (separates the "
                        "host feed from the H2D/relay and device terms)")
    p.add_argument("--host-batches", type=int, default=40,
                   help="batches to drain in --host-only mode")
    p.add_argument("--ship", choices=["uint8", "yuv420"], default="uint8",
                   help="wire format: uint8 RGB (3 B/px) or planar YUV420 "
                        "(1.5 B/px — halves the H2D bytes)")
    p.add_argument("--packed-feed", action="store_true",
                   help="fuse images+texts into one put per step")
    p.add_argument("--prefetch-depth", type=int, default=2)
    args = p.parse_args()

    jpeg_dir = generate_jpeg_shards(args.root, args.n_shards, args.per_shard)
    if "packed" in args.mode:
        data_dir = pack(args.root, jpeg_dir, args.n_shards)
    else:
        data_dir = jpeg_dir
    if args.generate_only:
        print("generation complete:", data_dir)
        return 0

    urls = os.path.join(
        data_dir, "shard-{%04d..%04d}.tar" % (0, args.n_shards - 1))
    if args.host_only:
        if args.mode.startswith("grain"):
            # --host-only drives the wds pipeline; labeling a wds drain as a
            # grain measurement would be silently wrong
            print("--host-only supports the wds pipeline only "
                  "(modes: jpeg, packed)", file=sys.stderr)
            return 2
        from colxlip_tpu.data.transforms import image_transform
        from colxlip_tpu.data.wds import WdsConfig, WdsTrainPipeline
        from colxlip_tpu.factory import get_tokenizer

        transform = image_transform(
            224, is_train=True, seed=0, normalize_on_device=True,
            raw_aug="crop" if "packed" in args.mode else "rrc",
            ship="yuv420" if args.ship == "yuv420" else "rgb")
        cfg = WdsConfig(
            urls=urls, batch_size=args.batch_size, seed=0,
            num_workers=args.workers, num_sampled_captions=1,
            native_decode=True)
        pipe = WdsTrainPipeline(cfg, transform, get_tokenizer(args.model))
        it = iter(pipe)
        next(it)  # warm the loader threads before the timing window
        t0 = time.time()
        n = 0
        for _ in range(args.host_batches):
            images, _texts = next(it)
            n += images.shape[0]
        dt = time.time() - t0
        print(json.dumps({
            "metric": f"host-only feed img/s ({args.mode}, "
                      f"batch {args.batch_size}, {args.workers} workers)",
            "img_s": round(n / dt, 1),
            "batches": args.host_batches, "wall_s": round(dt, 1),
        }))
        return 0

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

    from colxlip_tpu import main as driver

    name = f"feed_{args.mode}_{int(time.time())}"
    argv = [
        "--train-data", urls,
        "--dataset-type", "webdataset",
        "--pipeline", "grain" if args.mode.startswith("grain") else "wds",
        "--model", args.model,
        "--batch-size", str(args.batch_size),
        "--epochs", str(args.epochs),
        "--lr", "1e-4", "--warmup", "20",
        "--precision", "bf16",
        "--normalize-on-device",
        "--native-decode",
        "--workers", str(args.workers),
        "--logs", os.path.join(args.root, "logs"),
        "--name", name,
        "--log-every-n-steps", "8",
        "--seed", "0",
        # no epoch checkpoints: a ViT-scale orbax save costs minutes over
        # the ~3-14 MB/s device->host relay and is not what this measures
        "--save-frequency", "0",
    ]
    if "packed" in args.mode:
        argv += ["--raw-aug", "crop"]
    if args.ship == "yuv420":
        argv += ["--ship-format", "yuv420"]
    if args.packed_feed:
        argv += ["--packed-feed"]
    if args.prefetch_depth != 2:
        argv += ["--prefetch-depth", str(args.prefetch_depth)]
    print("driver argv:", " ".join(argv), flush=True)
    t0 = time.time()
    rc = driver.main(argv)
    wall = time.time() - t0

    # relay calibration: the H2D link's post-execution rate drifts by
    # session (probe4: 40 MB/s; probe7 same day: 11-21) — stamp the rate
    # this run actually saw so steady-state numbers are comparable
    import jax
    import numpy as np

    cal_bytes = int(np.prod([args.batch_size, 336 if args.ship == "yuv420"
                             else 224 * 3, 224]))
    cal = np.random.default_rng(0).integers(
        0, 255, (cal_bytes,), np.uint8)
    rates = []
    for _ in range(3):
        t1 = time.perf_counter()
        jax.device_put(cal).block_until_ready()
        rates.append(cal_bytes / 1e6 / (time.perf_counter() - t1))
    relay_mbs = round(max(rates), 1)

    # steady-state: parse the driver's own samples/s logs, take the median of
    # the second epoch's windows (epoch 0 carries compile + warmup)
    log = os.path.join(args.root, "logs", name, "out.log")
    rates, epoch1 = [], []
    for line in open(log):
        if "samples/s:" in line and "Train Epoch" in line:
            rate = float(line.split("samples/s:")[1].split()[0])
            rates.append(rate)
            if "Train Epoch: 1" in line or (args.epochs > 2 and
                                            "Train Epoch: 0" not in line):
                epoch1.append(rate)
    steady = sorted(epoch1 or rates)[len(epoch1 or rates) // 2]
    best = max(epoch1 or rates)
    print(json.dumps({
        "metric": f"real-data img/s ({args.mode}, {args.model}, "
                  f"batch {args.batch_size})",
        "steady_median": steady, "best_window": best,
        "wall_s": round(wall, 1), "relay_h2d_mbs": relay_mbs, "rc": rc,
    }))
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
