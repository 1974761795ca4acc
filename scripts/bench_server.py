#!/usr/bin/env python
"""Serving-layer throughput: dynamic-batching service + HTTP round-trip.

Measures the text-embedding path at two levels against the raw jitted
encode bound (scripts/bench_inference.py):

  service  concurrent threads submitting straight to the DynamicBatcher
           (tokenize + batch + device + split; no HTTP/JSON)
  http     the same load through POST /v1/embed/text on the live server
           (adds JSON parse/serialize + socket — host-CPU-bound on this
           1-core container; production hosts have 100+ cores)

Usage (TPU):
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_server.py \
        [--model ViT-B-16-colxlip] [--requests 64] [--batch 64] [--threads 8]
"""
from __future__ import annotations

import argparse
import json
import os
import threading
import time
import urllib.request


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="ViT-B-16-colxlip")
    p.add_argument("--requests", type=int, default=64)
    p.add_argument("--batch", type=int, default=64,
                   help="texts per request")
    p.add_argument("--threads", type=int, default=8)
    p.add_argument("--max-batch", type=int, default=256)
    p.add_argument("--max-wait-ms", type=float, default=2.0,
                   help="batcher coalescing window; on the dev relay "
                        "(~55 ms per dispatch) longer windows -> fewer, "
                        "fuller waves")
    args = p.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import numpy as np
    from colxlip_tpu.serving.server import ColXLIPService, make_server

    svc = ColXLIPService(args.model, None, max_batch=args.max_batch,
                         max_wait_ms=args.max_wait_ms)
    texts = [f"a photo of object number {i} on a table" for i in
             range(args.batch)]
    tokens = svc.tokenize(texts)
    # compile every bucket the wave coalescing can produce before timing
    svc.engine.warmup({"text": tokens.shape[1:]})

    def run_load(fn, drain=None):
        """fn(i) -> per-request result; drain(results) forces completion
        INSIDE the timing window (per-request syncs would serialize on the
        dev relay's ~55 ms round trip and measure latency, not throughput)."""
        r0 = fn(0)
        if drain:
            drain([r0])
        errs = []
        results = []
        t0 = time.perf_counter()
        work = list(range(args.requests))
        lock = threading.Lock()

        def worker():
            while True:
                with lock:
                    if not work:
                        return
                    i = work.pop()
                try:
                    r = fn(i)
                    with lock:
                        results.append(r)
                except Exception as e:  # noqa: BLE001
                    errs.append(e)
        threads = [threading.Thread(target=worker)
                   for _ in range(args.threads)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        if errs:
            raise errs[0]
        if drain:
            drain(results)
        dt = time.perf_counter() - t0
        return args.requests * args.batch / dt

    # --- service level (no HTTP) ---
    def service_req(_):
        out = svc.embed("text", tokens)
        assert out[0].shape[0] == args.batch
        return out[0]

    def drain(outs):
        # one scalar per request, AFTER all waves are enqueued: the device
        # stream is FIFO, so this forces every wave's execution while
        # keeping the relay round trips overlapped, not serialized
        for o in outs:
            np.asarray(o[0, :1])

    svc_tps = run_load(service_req, drain)

    # --- HTTP level ---
    httpd = make_server(svc, host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    body = json.dumps({"texts": texts}).encode()

    def http_req(_):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/embed/text", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=600) as r:
            n = json.loads(r.read())["count"]
            assert n == args.batch

    http_tps = run_load(http_req)
    httpd.shutdown()
    svc.stop()

    print(json.dumps({
        "metric": f"serving text embed txt/s ({args.model}, "
                  f"{args.threads} threads x batch {args.batch})",
        "service_level": round(svc_tps, 1),
        "http_level": round(http_tps, 1),
        "unit": "texts/sec/chip",
    }))


if __name__ == "__main__":
    main()
