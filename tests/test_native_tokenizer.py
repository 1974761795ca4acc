"""Native C++ BPE tokenizer core: byte-identical to the Python tokenizer.

The C core (native/bpe_tokenizer.cc) implements the published CLIP BPE
algorithm for printable-ASCII inputs; everything else routes through the
Python path. Parity is pinned here both with zero merges (the offline
fallback layout) and with a real-format merges table (synthetic rules, so
the greedy merge loop itself is exercised despite the unfetchable asset).
"""
import os

import numpy as np
import pytest

from colxlip_tpu import native
from colxlip_tpu.data.tokenizer import SimpleTokenizer

pytestmark = pytest.mark.skipif(
    not native.tokenizer_available(), reason="no C++ toolchain")

CORPUS = [
    "a photo of a dog",
    "Hello, World!  multiple   spaces\tand tabs",
    "it's don't we're you've i'm we'll she'd",
    "'stop 'llama '''s",
    "numbers 1234567890 and mixed a1b2c3",
    "!!!'s punctuation-runs... ???!!",
    "",
    "   leading and trailing   ",
    "x" * 400 + " truncation forces the EOT into the last slot " + "y" * 200,
    "UPPER lower MiXeD",
    "hyphen-ated co-op e.g. i.e. etc.",
    "quotes \"double\" and 'single' (parens) [brackets] {braces}",
]
NON_ASCII = [
    "café au lait",
    "<|startoftext|> literal specials <|endoftext|>",
    "html &amp; entities",
    "emoji \U0001f600 test",
]


def _python_rows(tok: SimpleTokenizer, texts, ctx):
    """The reference Python path, bypassing the native dispatch."""
    out = np.zeros((len(texts), ctx), np.int32)
    for i, t in enumerate(texts):
        ids = [tok.sot_token] + tok.encode(t) + [tok.eot_token]
        if len(ids) > ctx:
            ids = ids[:ctx]
            ids[-1] = tok.eot_token
        out[i, : len(ids)] = ids
    return out


@pytest.fixture
def merges_file(tmp_path):
    """Real-format merges table with synthetic rules over ASCII symbols."""
    rules = [
        "t h", "i n", "a n", "r e", "o n", "e r", "th e</w>", "in g</w>",
        "an d</w>", "s </w>", "e </w>", "d </w>", "o f</w>", "t o</w>",
        "re d</w>", "on e</w>", "er s</w>", "p h", "ph o", "pho t",
        "phot o</w>", "d o", "do g</w>", "1 2", "12 3", "' s</w>",
    ]
    p = tmp_path / "merges.txt"
    p.write_text("#version: synthetic\n" + "\n".join(rules) + "\n")
    return str(p)


def test_parity_zero_merges():
    tok = SimpleTokenizer(context_length=77)
    got = tok(CORPUS)
    want = _python_rows(tok, CORPUS, 77)
    np.testing.assert_array_equal(got, want)
    assert tok._get_native() is not None  # the fast path actually engaged


def test_parity_with_merges(merges_file):
    tok = SimpleTokenizer(bpe_path=merges_file, context_length=77)
    assert tok.has_merges
    got = tok(CORPUS)
    want = _python_rows(tok, CORPUS, 77)
    np.testing.assert_array_equal(got, want)
    # merges actually fire: "the" must encode to ONE token under the table
    the_ids = [i for i in tok("the")[0] if i not in (0, tok.sot_token, tok.eot_token)]
    assert len(the_ids) == 1


def test_mixed_batch_routing(merges_file):
    """Eligible rows take the native core, the rest the Python path, and
    rows stay aligned."""
    tok = SimpleTokenizer(bpe_path=merges_file, context_length=64)
    batch = [CORPUS[0], NON_ASCII[0], CORPUS[2], NON_ASCII[1], NON_ASCII[2]]
    got = tok(batch)
    want = _python_rows(tok, batch, 64)
    np.testing.assert_array_equal(got, want)


def test_kill_switch(monkeypatch, merges_file):
    monkeypatch.setenv("COLXLIP_NATIVE_TOKENIZER", "0")
    tok = SimpleTokenizer(bpe_path=merges_file, context_length=32)
    assert tok._get_native() is None
    np.testing.assert_array_equal(tok(CORPUS[:3]),
                                  _python_rows(tok, CORPUS[:3], 32))


def test_short_context_truncation():
    tok = SimpleTokenizer(context_length=8)
    got = tok(["a very long caption that cannot possibly fit in eight"])
    assert got.shape == (1, 8)
    assert got[0, 0] == tok.sot_token
    assert got[0, -1] == tok.eot_token


def test_concurrent_encode_thread_safe(merges_file):
    """The wds pipeline tokenizes from several worker threads on ONE handle
    (ctypes releases the GIL), so the C++ word cache must be lock-guarded:
    hammer the same tokenizer from many threads and pin byte-identical rows."""
    import threading

    tok = SimpleTokenizer(bpe_path=merges_file, context_length=32)
    # diverse word set so the cache keeps inserting (not just hitting)
    texts = [f"the photo {i} of dog {i * 7919 % 97} and thing{i}"
             for i in range(256)]
    want = tok(texts)  # serial reference (also warms the handle)
    results = [None] * 8
    errs = []

    def worker(slot):
        try:
            for _ in range(20):
                results[slot] = tok(texts)
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    for r in results:
        np.testing.assert_array_equal(r, want)


def test_freed_handle_errors_and_del_is_safe(merges_file):
    tok = SimpleTokenizer(bpe_path=merges_file, context_length=16)
    handle = tok._get_native()
    assert handle is not None
    assert native.bpe_encode_batch(handle, [b"a dog"], 16).shape == (1, 16)
    native.bpe_free(handle)
    native.bpe_free(handle)  # double-free is a no-op
    with pytest.raises(RuntimeError):
        native.bpe_encode_batch(handle, [b"a dog"], 16)
    tok._native_handle = None  # freed manually; keep __del__ from re-freeing
    del tok  # __del__ must not raise


def test_fuzz_random_ascii_parity(merges_file):
    """Property test: the C++ core is byte-identical to the Python path on
    arbitrary printable-ASCII strings (random lengths, runs of punctuation,
    digits, contractions, whitespace mixes)."""
    import random as _r

    rng = _r.Random(7)
    alphabet = ("abcdefghijklmnopqrstuvwxyz"
                "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
                " \t\n.,!?'-:;()[]{}\"/@#$%^*_+=~`|\\")
    texts = ["".join(rng.choice(alphabet)
                     for _ in range(rng.randrange(0, 120)))
             for _ in range(300)]
    tok = SimpleTokenizer(bpe_path=merges_file, context_length=32)
    got = tok(texts)
    want = _python_rows(tok, texts, 32)
    np.testing.assert_array_equal(got, want)
