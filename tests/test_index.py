"""Retrieval index: build/reload round-trip, two-stage search exactness.

The two-stage search (global shortlist -> MaxSim rerank) must return
EXACTLY the brute-force late-interaction ranking whenever the shortlist
covers the corpus, and the shortlist must behave as a recall filter (top-1
preserved at sane shortlist sizes on correlated data).
"""
from __future__ import annotations

import numpy as np
import pytest

from colxlip_tpu.ops.maxsim import maxsim_xla
from colxlip_tpu.serving.index import IndexWriter, RetrievalIndex


def _l2(x, axis=-1):
    return x / np.linalg.norm(x, axis=axis, keepdims=True)


@pytest.fixture(scope="module")
def corpus():
    """Correlated pooled/token features: pooled = mean of tokens, so the
    global shortlist is genuinely predictive of the MaxSim order (as the
    jointly-trained towers make it in practice)."""
    rng = np.random.default_rng(7)
    n, li, lt, d = 40, 12, 6, 32
    tokens = _l2(rng.standard_normal((n, li, d)).astype(np.float32))
    pooled = _l2(tokens.mean(axis=1))
    q_tokens = _l2(rng.standard_normal((5, lt, d)).astype(np.float32))
    # bias two queries toward specific corpus items so top-1 is unambiguous
    q_tokens[0] = _l2(0.9 * tokens[17, :lt] + 0.1 * q_tokens[0])
    q_tokens[1] = _l2(0.9 * tokens[3, :lt] + 0.1 * q_tokens[1])
    q_pooled = _l2(q_tokens.mean(axis=1))
    return pooled, tokens, q_pooled, q_tokens


@pytest.fixture(scope="module")
def index_dir(tmp_path_factory, corpus):
    pooled, tokens, _, _ = corpus
    w = IndexWriter(str(tmp_path_factory.mktemp("idx")), model="test",
                    logit_scale=10.0)
    # two chunks + string ids: exercises concatenation and id mapping
    w.add(pooled[:25], tokens[:25], ids=[f"img{i:03d}" for i in range(25)])
    w.add(pooled[25:], tokens[25:], ids=[f"img{i:03d}" for i in range(25, 40)])
    return w.finalize()


def test_roundtrip_meta(index_dir, corpus):
    pooled, tokens, _, _ = corpus
    idx = RetrievalIndex(index_dir)
    assert len(idx) == 40
    assert idx.meta["embed_dim"] == 32
    assert idx.meta["token_len"] == 12
    assert idx.logit_scale == 10.0
    np.testing.assert_allclose(np.asarray(idx.pooled, np.float32), pooled,
                               atol=1e-3)  # fp16 storage


def test_full_shortlist_matches_bruteforce(index_dir, corpus):
    pooled, tokens, q_pooled, q_tokens = corpus
    idx = RetrievalIndex(index_dir)
    top, scores, ids = idx.search(q_pooled, q_tokens, k=5, shortlist=40,
                                  scoring="maxsim")
    # brute force on the SAME fp16-stored features the index searches
    stored = np.asarray(idx.tokens, np.float32)
    brute = 10.0 * np.asarray(maxsim_xla(q_tokens, stored))  # [M, N]
    expect = np.argsort(-brute, axis=1)[:, :5]
    np.testing.assert_array_equal(top, expect)
    np.testing.assert_allclose(
        scores, np.take_along_axis(brute, expect, axis=1), rtol=1e-5)
    assert ids[0][0] == f"img{expect[0, 0]:03d}"


def test_biased_queries_hit_their_targets(index_dir, corpus):
    _, _, q_pooled, q_tokens = corpus
    idx = RetrievalIndex(index_dir)
    top, _, _ = idx.search(q_pooled, q_tokens, k=1, shortlist=10,
                           scoring="maxsim")
    assert top[0, 0] == 17
    assert top[1, 0] == 3


def test_global_scoring_ranks_by_pooled(index_dir, corpus):
    pooled, _, q_pooled, _ = corpus
    idx = RetrievalIndex(index_dir)
    top, scores, _ = idx.search(q_pooled, None, k=3, scoring="global")
    g = 10.0 * (q_pooled @ np.asarray(idx.pooled, np.float32).T)
    np.testing.assert_array_equal(top, np.argsort(-g, axis=1)[:, :3])
    assert np.all(np.diff(scores, axis=1) <= 1e-6)  # sorted descending


def test_mixed_scoring_interpolates(index_dir, corpus):
    _, _, q_pooled, q_tokens = corpus
    idx = RetrievalIndex(index_dir)
    _, s_mixed, _ = idx.search(q_pooled, q_tokens, k=40, shortlist=40,
                               scoring="mixed", alpha=1.0)
    # alpha=1.0 mixed == pure global scores on the same candidates
    top_g, s_g, _ = idx.search(q_pooled, None, k=40, scoring="global")
    np.testing.assert_allclose(np.sort(s_mixed, axis=1),
                               np.sort(s_g, axis=1), rtol=1e-4)


def test_errors(index_dir, corpus):
    _, _, q_pooled, _ = corpus
    idx = RetrievalIndex(index_dir)
    with pytest.raises(ValueError, match="needs query_tokens"):
        idx.search(q_pooled, None, scoring="maxsim")
    with pytest.raises(ValueError, match="unknown scoring"):
        idx.search(q_pooled, None, scoring="nope")
    w = IndexWriter("/tmp/_unused_idx")
    with pytest.raises(ValueError, match="empty"):
        w.finalize()
    with pytest.raises(ValueError, match="expected pooled"):
        w.add(np.zeros((2, 8)), np.zeros((3, 4, 8)))
