"""Batched HTTP inference server for the ColXLIP/CLIP towers.

The reference ships no serving layer — its closest surface is the
``--torchscript`` trace hook (reference main.py:233, model.py:339-352) and
the eval-only driver mode. A late-interaction retrieval model is a *serving*
artifact, so this framework provides the missing piece natively, designed
TPU-first:

  - **Static shapes.** Every request batch is padded to a power-of-two
    bucket (1, 2, 4, ... max_batch), so each bucket's XLA program compiles
    exactly once and the chip never sees a dynamic shape. Padding rows are
    sliced off before the response (and cost ~nothing: the towers are
    per-sample, so pad rows never contaminate real ones).
  - **Dynamic batching.** Concurrent requests are coalesced by one batcher
    thread per request kind (text / image) up to ``max_batch`` items or
    ``max_wait_ms``, whichever comes first — one device program per wave,
    per-request futures resolve when the wave completes. HTTP threads only
    tokenize / decode / wait; a single thread owns the chip.
  - **stdlib only.** ``http.server.ThreadingHTTPServer`` + ``json`` +
    ``base64`` — no web framework to vendor.

Endpoints (all JSON):

  GET  /healthz            -> {"status": "ok", "model": ..., "embed_dim": ...}
  POST /v1/embed/text      {"texts": [...]}
                           -> {"embeddings": [[...]], "count": N}
  POST /v1/embed/image     {"images_b64": ["<jpeg/png base64>", ...]}
                           -> {"embeddings": [[...]], "count": N}
  POST /v1/score           {"texts": [...], "images_b64": [...],
                            "scoring": "global"|"maxsim"|"mixed",
                            "alpha": 0.5}
                           -> {"similarity": [[img x text]], "scoring": ...}
  POST /v1/search          {"texts": [...], "k": 10, "shortlist": 100,
                            "scoring": "maxsim"}   (needs --index <dir>)
                           -> {"indices": [[...]], "scores": [[...]],
                               "ids": [[...]]?}  — two-stage late-interaction
                           corpus search (serving/index.py)
  POST /v1/caption         {"images_b64": [...], "method": "greedy"|"top_k"
                            |"top_p", ...}          (CoCa models only)
                           -> {"captions": [...]}
  GET  /metrics            request/error counts, latency sums, batcher wave
                           stats (JSON)

Scoring semantics are identical to the eval harness
(``training/evaluate.score_similarity`` — reference train.py:588-614 global
path plus the working MaxSim late-interaction path the reference never
wired up).
"""
from __future__ import annotations

import argparse
import base64
import io
import json
import logging
import queue
import threading
from concurrent.futures import Future
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)


def next_bucket(n: int, max_batch: int) -> int:
    """Smallest power-of-two >= n, capped at max_batch (static-shape ladder:
    at most log2(max_batch)+1 compiled programs per tower)."""
    if n >= max_batch:
        return max_batch
    b = 1
    while b < n:
        b *= 2
    return b


@dataclass
class _Work:
    payload: np.ndarray          # [n, ...] request batch
    future: Future = field(default_factory=Future)


class DynamicBatcher:
    """Coalesces concurrent same-kind requests into one device wave.

    ``fn`` maps a [B, ...] padded batch -> tuple of [B, ...] arrays. Each
    submitted item's future resolves with the tuple sliced to its own rows.
    """

    def __init__(self, fn, max_batch: int = 64, max_wait_ms: float = 3.0,
                 name: str = "batcher"):
        self._fn = fn
        self.max_batch = max_batch
        self.max_wait_s = max_wait_ms / 1e3
        self._q: "queue.Queue[Optional[_Work]]" = queue.Queue()
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name=name)
        self._stopping = False
        self._stats_lock = threading.Lock()
        self.stats = {"waves": 0, "items": 0, "max_wave": 0, "failures": 0}
        self._thread.start()

    def submit(self, payload: np.ndarray) -> Future:
        if self._stopping:
            raise RuntimeError("batcher is shut down")
        w = _Work(np.asarray(payload))
        self._q.put(w)
        return w.future

    def stop(self) -> None:
        self._stopping = True
        self._q.put(None)
        self._thread.join(timeout=10)

    def _collect(self) -> Optional[List[_Work]]:
        """Block for the first item, then drain up to max_batch rows or
        max_wait_s, whichever first."""
        first = self._q.get()
        if first is None:
            return None
        wave = [first]
        rows = first.payload.shape[0]
        deadline = _monotonic() + self.max_wait_s
        while rows < self.max_batch:
            timeout = deadline - _monotonic()
            if timeout <= 0:
                break
            try:
                w = self._q.get(timeout=timeout)
            except queue.Empty:
                break
            if w is None:
                self._q.put(None)  # propagate shutdown after this wave
                break
            wave.append(w)
            rows += w.payload.shape[0]
        return wave

    def _loop(self) -> None:
        while True:
            wave = self._collect()
            if wave is None:
                return
            try:
                batch = (wave[0].payload if len(wave) == 1
                         else np.concatenate([w.payload for w in wave]))
                outs = self._fn(batch)
                i = 0
                for w in wave:
                    n = w.payload.shape[0]
                    w.future.set_result(tuple(o[i:i + n] for o in outs))
                    i += n
                with self._stats_lock:
                    self.stats["waves"] += 1
                    self.stats["items"] += batch.shape[0]
                    self.stats["max_wave"] = max(self.stats["max_wave"],
                                                 batch.shape[0])
            except Exception as e:  # noqa: BLE001 — fail the wave, keep serving
                logger.exception("batch wave failed")
                with self._stats_lock:
                    self.stats["failures"] += 1
                for w in wave:
                    if not w.future.done():
                        w.future.set_exception(e)


def _monotonic() -> float:
    import time
    return time.monotonic()


class InferenceEngine:
    """Jitted bucketed encode for one model/params pair.

    Returns (pooled_l2_normalized, token_features) per tower (a 1-tuple for
    plain CLIP models, which have no token heads). Batches shard over ALL
    local devices via the same ``local_shard_scheme`` the eval encoder uses
    (the towers are per-sample: batch-parallel, zero collectives); on a
    single chip the scheme is a no-op.
    """

    def __init__(self, model, params, max_batch: int = 64,
                 text_ctx_buckets: Tuple[int, ...] = ()):
        import jax

        from ..training.evaluate import local_shard_scheme

        self.model = model
        self.max_batch = max_batch
        # ascending short text-context buckets (e.g. (32,)): a wave whose
        # longest caption fits a bucket encodes [n, bucket] instead of the
        # full context — the text tower slices its pos-embed to the input
        # length, and token features past EOT are zeroed by the model, so
        # zero-padding the token output back to full width is EXACTLY the
        # full-context result (tests/test_text_ctx.py proves prefix
        # stability). One extra compiled shape per (bucket, batch-bucket).
        self.text_ctx_buckets = tuple(sorted(text_ctx_buckets))
        self.last_text_ctx: Optional[int] = None  # introspection/tests
        self._ship, self.params, self.n_devices = local_shard_scheme(params)

        @jax.jit
        def encode_text(p, texts):
            out = model.apply(
                p, text=texts,
                method=lambda m, text: m.encode_text(text, normalize=True),
            )
            return out if isinstance(out, tuple) else (out,)

        @jax.jit
        def encode_image(p, images):
            out = model.apply(
                p, images,
                method=lambda m, image: m.encode_image(image, normalize=True),
            )
            return out if isinstance(out, tuple) else (out,)

        self._encode = {"text": encode_text, "image": encode_image}

    def run(self, kind: str, batch: np.ndarray) -> Tuple:
        """Returns a tuple of DEVICE arrays sliced to the true row count.

        Outputs deliberately stay on device: a wave's token-feature tensor
        is tens of MB, and most requests only serialize the pooled rows —
        callers ``np.asarray`` exactly what they return, so host transfer
        is per-field, not per-wave (on the dev relay at 14 MB/s an eager
        full-tuple fetch measured 154 txt/s vs the raw 9.7k bound).
        """
        import jax.numpy as jnp

        n = batch.shape[0]
        if n > self.max_batch:
            # split oversize requests into full device waves
            parts = [self.run(kind, batch[i:i + self.max_batch])
                     for i in range(0, n, self.max_batch)]
            return tuple(jnp.concatenate(cols) for cols in zip(*parts))
        full_ctx = None
        if kind == "text" and self.text_ctx_buckets:
            full_ctx = batch.shape[1]
            # EOT is the max token id, so argmax finds it per row; the wave
            # fits a bucket iff every row's EOT lands inside it
            needed = int(batch.argmax(axis=1).max()) + 1
            for c in self.text_ctx_buckets:
                if needed <= c < full_ctx:
                    batch = batch[:, :c]
                    break
            self.last_text_ctx = batch.shape[1]
        b = next_bucket(n, self.max_batch)
        if b != n:
            pad = np.zeros((b - n,) + batch.shape[1:], batch.dtype)
            if kind == "text":
                pad[:, 0] = 49406  # SOT: keep the argmax-EOT pool well-defined
                pad[:, 1] = 49407
            batch = np.concatenate([batch, pad])
        # ship() may pad further to a device-count multiple — still one
        # static shape per bucket, so each bucket compiles exactly once
        out = self._encode[kind](self.params, self._ship(batch))
        if full_ctx is not None and batch.shape[1] < full_ctx:
            # restore full-width token features: the tail is EOT-zeroed by
            # the model, so zeros make this bit-equal to a full-ctx encode
            out = tuple(
                jnp.pad(o, ((0, 0), (0, full_ctx - o.shape[1]), (0, 0)))
                if o.ndim == 3 else o
                for o in out)
        return tuple(o[:n] for o in out)

    def warmup(self, shapes: Dict[str, Tuple[int, ...]]) -> None:
        """Compile every bucket of the ladder for the given per-kind item
        shapes (e.g. {'text': (77,), 'image': (224, 224, 3)}) so no request
        wave ever hits a cold compile."""
        for kind, shape in shapes.items():
            # text: warm every ctx bucket too (EOT placement routes run()
            # into each bucket's compiled shape)
            eot_slots = [None]
            if kind == "text":
                full = shape[0]
                eot_slots = [c - 1 for c in self.text_ctx_buckets
                             if c < full] + [full - 1]
            b = 1
            while True:
                dtype = np.int32 if kind == "text" else np.float32
                for eot in eot_slots:
                    batch = np.zeros((min(b, self.max_batch),) + tuple(shape),
                                     dtype)
                    if kind == "text":
                        batch[:, 0] = 49406
                        batch[:, eot] = 49407
                    np.asarray(self.run(kind, batch)[0])
                if b >= self.max_batch:
                    break
                b *= 2


class ColXLIPService:
    """Model + tokenizer + transform + batchers behind the HTTP handler."""

    def __init__(self, model_name: str, checkpoint: Optional[str] = None,
                 *, max_batch: int = 64, max_wait_ms: float = 3.0,
                 scoring: str = "global", alpha: float = 0.5,
                 mask_mode: str = "nonzero", quick_gelu: Optional[bool] = None,
                 index_dir: Optional[str] = None,
                 text_ctx_buckets: Tuple[int, ...] = (),
                 model=None, params=None, cfg=None):
        from ..factory import create_model, init_params, load_weights
        from ..data.tokenizer import get_tokenizer_cached
        from ..data.transforms import image_transform

        if model is None:
            model, cfg = create_model(model_name, quick_gelu=quick_gelu)
            if checkpoint:
                params = load_weights(model, cfg, checkpoint,
                                      model_name=model_name)
            else:
                logger.warning("serving RANDOM-INIT weights (no --checkpoint)")
                params = init_params(model, cfg)
        self.model_name = model_name
        self.cfg = cfg
        self._model = model
        self._params = params
        self.is_coca = type(model).__name__ == "CoCa"
        self._metrics_lock = threading.Lock()
        self.request_counts: Dict[str, int] = {}
        self.request_seconds: Dict[str, float] = {}
        self.scoring = scoring
        self.alpha = alpha
        self.mask_mode = mask_mode
        self.tokenizer = get_tokenizer_cached(cfg.text_cfg.context_length)
        self.transform = image_transform(cfg.vision_cfg.image_size,
                                         is_train=False)
        bad = [c for c in text_ctx_buckets
               if not 3 <= c <= cfg.text_cfg.context_length]
        if bad:
            raise ValueError(
                f"text_ctx_buckets {bad} outside [3, "
                f"{cfg.text_cfg.context_length}] (the model's context)")
        self.engine = InferenceEngine(model, params, max_batch=max_batch,
                                      text_ctx_buckets=text_ctx_buckets)
        self._batchers = {
            kind: DynamicBatcher(
                lambda b, k=kind: self.engine.run(k, b),
                max_batch=max_batch, max_wait_ms=max_wait_ms,
                name=f"batcher-{kind}")
            for kind in ("text", "image")
        }
        ls = params["params"]["logit_scale"]
        self.logit_scale = float(np.exp(np.asarray(ls)))
        self.index = None
        if index_dir:
            from .index import RetrievalIndex

            self.index = RetrievalIndex(index_dir)
            logger.info("retrieval index: %d items from %s",
                        len(self.index), index_dir)

    # ---- request paths (called from HTTP threads) ----

    def tokenize(self, texts: List[str]) -> np.ndarray:
        return np.asarray(self.tokenizer(texts), np.int32)

    def decode_images(self, images_b64: List[str]) -> np.ndarray:
        from PIL import Image

        arrs = []
        for b64 in images_b64:
            img = Image.open(io.BytesIO(base64.b64decode(b64)))
            arrs.append(self.transform(img))
        return np.stack(arrs).astype(np.float32)

    def embed(self, kind: str, batch: np.ndarray, timeout: float = 120.0):
        return self._batchers[kind].submit(batch).result(timeout=timeout)

    def score(self, texts: List[str], images_b64: List[str],
              scoring: Optional[str] = None,
              alpha: Optional[float] = None) -> np.ndarray:
        tokens = self.tokenize(texts)
        imgs = self.decode_images(images_b64)
        f_txt = self._batchers["text"].submit(tokens)
        f_img = self._batchers["image"].submit(imgs)
        txt_out, img_out = f_txt.result(timeout=120), f_img.result(timeout=120)
        txt_feats = np.asarray(txt_out[0], np.float32)
        img_feats = np.asarray(img_out[0], np.float32)
        txt_tokens = (np.asarray(txt_out[1], np.float32)
                      if len(txt_out) > 1 else None)
        img_tokens = (np.asarray(img_out[1], np.float32)
                      if len(img_out) > 1 else None)
        from ..training.evaluate import score_similarity

        scoring = scoring or self.scoring
        text_mask = None
        if self.mask_mode == "valid" and scoring in ("maxsim", "mixed"):
            eot = tokens.argmax(axis=-1)
            text_mask = (np.arange(tokens.shape[1])[None, :]
                         < eot[:, None]).astype(np.float32)
        return score_similarity(
            img_feats, txt_feats, img_tokens, txt_tokens, self.logit_scale,
            scoring=scoring, alpha=self.alpha if alpha is None else alpha,
            mask_mode=self.mask_mode, text_mask=text_mask,
        )

    def search(self, texts: List[str], *, k: int = 10, shortlist: int = 100,
               scoring: Optional[str] = None, alpha: Optional[float] = None):
        """Text -> corpus-image search against the loaded retrieval index."""
        if self.index is None:
            raise ValueError("no retrieval index loaded (start the server "
                             "with --index <dir>)")
        tokens = self.tokenize(texts)
        out = self._batchers["text"].submit(tokens).result(timeout=120)
        pooled = np.asarray(out[0], np.float32)
        q_tokens = (np.asarray(out[1], np.float32) if len(out) > 1 else None)
        scoring = scoring or ("maxsim" if q_tokens is not None else "global")
        text_mask = None
        if self.mask_mode == "valid" and scoring in ("maxsim", "mixed"):
            eot = tokens.argmax(axis=-1)
            text_mask = (np.arange(tokens.shape[1])[None, :]
                         < eot[:, None]).astype(np.float32)
        return self.index.search(
            pooled, q_tokens, k=k, shortlist=shortlist, scoring=scoring,
            alpha=self.alpha if alpha is None else alpha,
            mask_mode=self.mask_mode, text_mask=text_mask,
        )

    def caption(self, images_b64: List[str], *, method: str = "greedy",
                max_len: Optional[int] = None, top_k: int = 50,
                top_p: float = 0.9, temperature: float = 1.0,
                seed: int = 0) -> List[str]:
        """CoCa models only: decode captions for the given images."""
        if not self.is_coca:
            raise ValueError(f"{self.model_name!r} has no caption decoder — "
                             "captioning needs a CoCa model")
        import jax

        from .generate import generate_captions, tokens_to_text

        imgs = self.decode_images(images_b64)
        tokens = generate_captions(
            self._model, self._params, imgs, method=method, max_len=max_len,
            top_k=top_k, top_p=top_p, temperature=temperature,
            rng=jax.random.PRNGKey(seed))
        return tokens_to_text(tokens, self.tokenizer)

    def record(self, path: str, seconds: float) -> None:
        with self._metrics_lock:
            self.request_counts[path] = self.request_counts.get(path, 0) + 1
            self.request_seconds[path] = (
                self.request_seconds.get(path, 0.0) + seconds)

    def metrics(self) -> dict:
        with self._metrics_lock:
            counts = dict(self.request_counts)
            seconds = {k: round(v, 4) for k, v in self.request_seconds.items()}
        return {
            "requests": counts,
            "request_seconds_total": seconds,
            "batcher": {k: dict(b.stats) for k, b in self._batchers.items()},
            "index_items": len(self.index) if self.index is not None else None,
        }

    def stop(self) -> None:
        for b in self._batchers.values():
            b.stop()


class _Handler(BaseHTTPRequestHandler):
    service: ColXLIPService  # set by make_server

    # ---- plumbing ----
    def log_message(self, fmt, *args):  # route to logging, not stderr
        logger.debug("%s " + fmt, self.address_string(), *args)

    def _send(self, code: int, obj: dict) -> None:
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _read_json(self) -> dict:
        length = int(self.headers.get("Content-Length", 0))
        if length <= 0:
            raise ValueError("empty request body")
        return json.loads(self.rfile.read(length))

    # ---- routes ----
    def do_GET(self):  # noqa: N802 — http.server API
        if self.path == "/metrics":
            return self._send(200, self.service.metrics())
        if self.path != "/healthz":
            return self._send(404, {"error": f"unknown path {self.path}"})
        svc = self.service
        self._send(200, {
            "status": "ok",
            "model": svc.model_name,
            "embed_dim": svc.cfg.embed_dim,
            "image_size": svc.cfg.vision_cfg.image_size,
            "context_length": svc.cfg.text_cfg.context_length,
            "scoring": svc.scoring,
            "index_items": len(svc.index) if svc.index is not None else None,
        })

    def do_POST(self):  # noqa: N802 — http.server API
        t0 = _monotonic()
        try:
            self._route_post()
        finally:
            self.service.record(self.path, _monotonic() - t0)

    def _route_post(self):
        try:
            req = self._read_json()
            if self.path == "/v1/embed/text":
                texts = req["texts"]
                if not isinstance(texts, list) or not texts:
                    raise ValueError("'texts' must be a non-empty list")
                out = self.service.embed("text", self.service.tokenize(texts))
                resp = {"embeddings": np.asarray(out[0], np.float32).tolist(),
                        "count": len(texts)}
                if req.get("return_tokens") and len(out) > 1:
                    resp["token_embeddings"] = np.asarray(
                        out[1], np.float32).tolist()
                return self._send(200, resp)
            if self.path == "/v1/embed/image":
                imgs = req["images_b64"]
                if not isinstance(imgs, list) or not imgs:
                    raise ValueError("'images_b64' must be a non-empty list")
                out = self.service.embed(
                    "image", self.service.decode_images(imgs))
                resp = {"embeddings": np.asarray(out[0], np.float32).tolist(),
                        "count": len(imgs)}
                if req.get("return_tokens") and len(out) > 1:
                    resp["token_embeddings"] = np.asarray(
                        out[1], np.float32).tolist()
                return self._send(200, resp)
            if self.path == "/v1/score":
                sim = self.service.score(
                    req["texts"], req["images_b64"],
                    scoring=req.get("scoring"), alpha=req.get("alpha"),
                )
                return self._send(200, {
                    "similarity": np.asarray(sim).tolist(),
                    "scoring": req.get("scoring") or self.service.scoring,
                })
            if self.path == "/v1/search":
                idx, scores, ids = self.service.search(
                    req["texts"], k=int(req.get("k", 10)),
                    shortlist=int(req.get("shortlist", 100)),
                    scoring=req.get("scoring"), alpha=req.get("alpha"),
                )
                resp = {"indices": idx.tolist(), "scores": scores.tolist()}
                if ids is not None:
                    resp["ids"] = ids
                return self._send(200, resp)
            if self.path == "/v1/caption":
                caps = self.service.caption(
                    req["images_b64"],
                    method=req.get("method", "greedy"),
                    max_len=req.get("max_len"),
                    top_k=int(req.get("top_k", 50)),
                    top_p=float(req.get("top_p", 0.9)),
                    temperature=float(req.get("temperature", 1.0)),
                    seed=int(req.get("seed", 0)),
                )
                return self._send(200, {"captions": caps})
            return self._send(404, {"error": f"unknown path {self.path}"})
        except (KeyError, ValueError, TypeError) as e:
            return self._send(400, {"error": str(e)})
        except Exception as e:  # noqa: BLE001 — surface, don't kill the thread
            logger.exception("request failed")
            return self._send(500, {"error": str(e)})


def make_server(service: ColXLIPService, host: str = "0.0.0.0",
                port: int = 8080) -> ThreadingHTTPServer:
    """Build (but don't start) the HTTP server; port 0 picks an ephemeral
    port (read it back from ``server.server_address``)."""
    handler = type("BoundHandler", (_Handler,), {"service": service})
    return ThreadingHTTPServer((host, port), handler)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--model", default="ViT-B-16-colxlip")
    p.add_argument("--checkpoint", default=None,
                   help=".pt or orbax checkpoint (default: random init)")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--max-batch", type=int, default=64)
    p.add_argument("--max-wait-ms", type=float, default=3.0)
    p.add_argument("--scoring", default="global",
                   choices=["global", "maxsim", "mixed"])
    p.add_argument("--alpha", type=float, default=0.5)
    p.add_argument("--mask-mode", default="nonzero",
                   choices=["nonzero", "plain", "valid"])
    p.add_argument("--force-quick-gelu", action="store_true")
    p.add_argument("--index", default=None,
                   help="retrieval-index dir (serving/index.py) to enable "
                        "POST /v1/search")
    p.add_argument("--warmup", action="store_true",
                   help="pre-compile the whole power-of-two bucket ladder "
                        "for both towers before accepting traffic (first "
                        "requests otherwise pay the XLA compile)")
    p.add_argument("--text-buckets", type=int, nargs="*", default=[],
                   help="short text-context buckets (e.g. 32): a wave whose "
                        "longest caption fits encodes [n, bucket] instead "
                        "of the full context — exact same features (token "
                        "tail is EOT-zeroed), ~2x text-tower FLOPs saved "
                        "for short queries; size with "
                        "scripts/caption_length_stats.py")
    args = p.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      __import__("os").environ.get("JAX_CACHE_DIR",
                                                   "/root/.jax_cache"))
    svc = ColXLIPService(
        args.model, args.checkpoint, max_batch=args.max_batch,
        max_wait_ms=args.max_wait_ms, scoring=args.scoring, alpha=args.alpha,
        mask_mode=args.mask_mode,
        quick_gelu=True if args.force_quick_gelu else None,
        index_dir=args.index,
        text_ctx_buckets=tuple(args.text_buckets),
    )
    if args.warmup:
        s = svc.cfg.vision_cfg.image_size
        s = s if isinstance(s, int) else s[0]
        logger.info("warming the bucket ladder (text + image towers)...")
        svc.engine.warmup({
            "text": (svc.cfg.text_cfg.context_length,),
            "image": (s, s, 3),
        })
    server = make_server(svc, args.host, args.port)
    logger.info("serving %s on %s:%d", args.model, *server.server_address)
    try:
        server.serve_forever()
    finally:
        svc.stop()


if __name__ == "__main__":
    main()
