"""Serving HTTP server: bucketing, dynamic batching, endpoint semantics.

Runs the real ThreadingHTTPServer on an ephemeral port against the tiny
ViT-S-16-test colxlip model (random init) on the CPU backend; requests go
through urllib like a real client's would.
"""
from __future__ import annotations

import base64
import io
import json
import threading
import urllib.request

import numpy as np
import pytest

from colxlip_tpu.serving.server import (
    ColXLIPService, DynamicBatcher, make_server, next_bucket,
)

pytestmark = pytest.mark.slow


def _post(port: int, path: str, obj: dict, expect: int = 200) -> dict:
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            assert r.status == expect
            return json.loads(r.read())
    except urllib.error.HTTPError as e:
        assert e.code == expect, f"{e.code}: {e.read()!r}"
        return json.loads(e.read())


def _jpeg_b64(rng: np.random.Generator, size: int = 80) -> str:
    from PIL import Image

    arr = rng.integers(0, 255, (size, size, 3), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG")
    return base64.b64encode(buf.getvalue()).decode()


@pytest.fixture(scope="module")
def server():
    # the colxlip flavor of the tiny config: token heads + maxsim scoring live
    svc = ColXLIPService("ViT-S-16-test-colxlip", None, max_batch=8,
                         max_wait_ms=2.0, scoring="global")
    httpd = make_server(svc, host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield svc, port
    httpd.shutdown()
    svc.stop()


def test_next_bucket():
    assert [next_bucket(n, 8) for n in (1, 2, 3, 5, 8, 9, 100)] == \
        [1, 2, 4, 8, 8, 8, 8]


def test_healthz(server):
    _, port = server
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz",
                                timeout=60) as r:
        body = json.loads(r.read())
    assert body["status"] == "ok"
    assert body["embed_dim"] == 128
    assert body["context_length"] == 32


def test_embed_text_normalized_and_bucket_invariant(server):
    svc, port = server
    texts = ["a photo of a cat", "two dogs on grass", "blue car"]
    resp = _post(port, "/v1/embed/text", {"texts": texts})
    emb = np.asarray(resp["embeddings"], np.float32)
    assert emb.shape == (3, 128)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=-1), 1.0, atol=1e-3)
    # bucket padding must not change results: single-item request == row 0
    solo = np.asarray(
        _post(port, "/v1/embed/text", {"texts": texts[:1]})["embeddings"],
        np.float32)
    np.testing.assert_allclose(solo[0], emb[0], atol=2e-5)


def test_embed_image_and_tokens(server):
    svc, port = server
    rng = np.random.default_rng(0)
    imgs = [_jpeg_b64(rng), _jpeg_b64(rng)]
    resp = _post(port, "/v1/embed/image",
                 {"images_b64": imgs, "return_tokens": True})
    emb = np.asarray(resp["embeddings"], np.float32)
    assert emb.shape == (2, 128)
    toks = np.asarray(resp["token_embeddings"], np.float32)
    assert toks.shape == (2, (64 // 16) ** 2, 128)  # [N, grid^2, D]


def test_score_matches_direct_computation(server):
    svc, port = server
    rng = np.random.default_rng(1)
    texts = ["a red square", "the night sky"]
    imgs = [_jpeg_b64(rng) for _ in range(3)]
    resp = _post(port, "/v1/score",
                 {"texts": texts, "images_b64": imgs, "scoring": "maxsim"})
    sim = np.asarray(resp["similarity"], np.float32)
    assert sim.shape == (3, 2)  # [images, texts]
    # recompute through the same service primitives
    t_out = svc.embed("text", svc.tokenize(texts))
    i_out = svc.embed("image", svc.decode_images(imgs))
    from colxlip_tpu.training.evaluate import score_similarity

    expected = score_similarity(
        i_out[0], t_out[0], i_out[1], t_out[1], svc.logit_scale,
        scoring="maxsim")
    np.testing.assert_allclose(sim, expected, rtol=2e-4, atol=2e-4)


def test_concurrent_requests_coalesce_and_match(server):
    svc, port = server
    texts = [f"caption number {i}" for i in range(8)]
    solo = np.asarray(
        _post(port, "/v1/embed/text", {"texts": texts})["embeddings"],
        np.float32)

    results = [None] * 8
    def worker(i):
        r = _post(port, "/v1/embed/text", {"texts": [texts[i]]})
        results[i] = np.asarray(r["embeddings"], np.float32)[0]

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    for i in range(8):
        assert results[i] is not None
        np.testing.assert_allclose(results[i], solo[i], atol=2e-5)


def test_oversize_request_splits_into_waves(server):
    svc, port = server
    texts = [f"text {i}" for i in range(19)]  # > max_batch=8
    resp = _post(port, "/v1/embed/text", {"texts": texts})
    assert np.asarray(resp["embeddings"]).shape == (19, 128)


def test_errors(server):
    _, port = server
    assert "error" in _post(port, "/v1/embed/text", {"texts": []}, expect=400)
    assert "error" in _post(port, "/v1/embed/text", {"nope": 1}, expect=400)
    assert "error" in _post(port, "/v1/nope", {"x": 1}, expect=404)


def test_search_endpoint(server, tmp_path):
    """Index the service's own image embeddings, then /v1/search must rank
    each image's own embedding first (self-retrieval)."""
    svc, port = server
    rng = np.random.default_rng(3)
    imgs_b64 = [_jpeg_b64(rng) for _ in range(6)]
    pooled, tokens = svc.embed("image", svc.decode_images(imgs_b64))[:2]

    from colxlip_tpu.serving.index import IndexWriter, RetrievalIndex

    w = IndexWriter(str(tmp_path / "idx"), logit_scale=svc.logit_scale)
    w.add(pooled, tokens, ids=[f"im{i}" for i in range(6)])
    svc.index = RetrievalIndex(w.finalize())
    try:
        # no index on the wire yet -> healthz advertises it now
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz",
                                    timeout=60) as r:
            assert json.loads(r.read())["index_items"] == 6
        resp = _post(port, "/v1/search",
                     {"texts": ["anything", "else"], "k": 3,
                      "scoring": "maxsim"})
        assert np.asarray(resp["indices"]).shape == (2, 3)
        assert np.asarray(resp["scores"]).shape == (2, 3)
        assert resp["ids"][0][0].startswith("im")
    finally:
        svc.index = None
    # with the index cleared the endpoint is a clear client error again
    assert "error" in _post(port, "/v1/search", {"texts": ["x"]}, expect=400)


def test_metrics_endpoint(server):
    _, port = server
    _post(port, "/v1/embed/text", {"texts": ["warm the counters"]})
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/metrics",
                                timeout=60) as r:
        m = json.loads(r.read())
    assert m["requests"]["/v1/embed/text"] >= 1
    assert m["request_seconds_total"]["/v1/embed/text"] > 0
    assert m["batcher"]["text"]["waves"] >= 1
    assert m["batcher"]["text"]["items"] >= m["batcher"]["text"]["waves"]


def test_caption_requires_coca(server):
    _, port = server
    rng = np.random.default_rng(5)
    resp = _post(port, "/v1/caption", {"images_b64": [_jpeg_b64(rng)]},
                 expect=400)
    assert "CoCa" in resp["error"]


@pytest.fixture(scope="module")
def coca_server():
    svc = ColXLIPService("coca-S-test", None, max_batch=4, max_wait_ms=2.0)
    httpd = make_server(svc, host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    yield svc, port
    httpd.shutdown()
    svc.stop()


def test_caption_endpoint(coca_server):
    svc, port = coca_server
    rng = np.random.default_rng(6)
    imgs = [_jpeg_b64(rng, size=svc.cfg.vision_cfg.image_size),
            _jpeg_b64(rng, size=svc.cfg.vision_cfg.image_size)]
    resp = _post(port, "/v1/caption",
                 {"images_b64": imgs, "method": "greedy", "max_len": 8})
    caps = resp["captions"]
    assert len(caps) == 2
    assert all(isinstance(c, str) for c in caps)
    # deterministic: same request, same captions
    resp2 = _post(port, "/v1/caption",
                  {"images_b64": imgs, "method": "greedy", "max_len": 8})
    assert resp2["captions"] == caps


def test_batcher_failure_isolated():
    calls = []

    def fn(batch):
        calls.append(batch.shape[0])
        if batch[0, 0] < 0:
            raise RuntimeError("boom")
        return (batch * 2,)

    b = DynamicBatcher(fn, max_batch=4, max_wait_ms=1.0)
    try:
        bad = b.submit(np.full((1, 2), -1.0))
        with pytest.raises(RuntimeError):
            bad.result(timeout=10)
        good = b.submit(np.ones((2, 2)))
        (out,) = good.result(timeout=10)
        np.testing.assert_allclose(out, 2.0)
    finally:
        b.stop()


def test_text_ctx_buckets_exact_and_routed():
    """Serving ctx bucketing: a wave whose captions fit a short bucket
    encodes [n, bucket]; outputs (incl. zero-padded token features) are
    EXACTLY the full-context encode (the token tail is EOT-zeroed)."""
    from colxlip_tpu.factory import create_model, init_params
    from colxlip_tpu.serving.server import InferenceEngine

    model, cfg = create_model("ViT-S-16-test-colxlip")
    params = init_params(model, cfg)
    full = cfg.text_cfg.context_length
    eng_b = InferenceEngine(model, params, max_batch=8,
                            text_ctx_buckets=(16,))
    eng_f = InferenceEngine(model, params, max_batch=8)

    rng = np.random.default_rng(0)
    short = np.zeros((3, full), np.int32)
    short[:, 0] = 49406
    short[:, 1:6] = rng.integers(1, 49000, (3, 5))
    short[:, 6] = 49407

    out_b = [np.asarray(o) for o in eng_b.run("text", short)]
    assert eng_b.last_text_ctx == 16
    out_f = [np.asarray(o) for o in eng_f.run("text", short)]
    assert len(out_b) == len(out_f)
    for ob, of in zip(out_b, out_f):
        assert ob.shape == of.shape  # token features padded back to full
        np.testing.assert_allclose(ob, of, atol=2e-5)

    # a caption past the bucket routes to the full context
    long = short.copy()
    long[:, 6] = 1
    long[:, full - 1] = 49407
    eng_b.run("text", long)
    assert eng_b.last_text_ctx == full

    # warmup compiles the bucket ladder without error
    eng_b.warmup({"text": (full,)})
