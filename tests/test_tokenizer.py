"""Tokenizer tests (offline byte-fallback mode; exact-BPE path gated on asset)."""
import numpy as np
import pytest

from colxlip_tpu.data.tokenizer import (
    CONTEXT_LENGTH,
    EOT_TOKEN,
    SOT_TOKEN,
    VOCAB_SIZE,
    SimpleTokenizer,
    bytes_to_unicode,
)


@pytest.fixture(scope="module")
def tok():
    return SimpleTokenizer()


def test_bytes_to_unicode_reversible():
    m = bytes_to_unicode()
    assert len(m) == 256
    assert len(set(m.values())) == 256


def test_shapes_and_specials(tok):
    out = tok(["a photo of a cat", "hello world"])
    assert out.shape == (2, CONTEXT_LENGTH)
    assert out.dtype == np.int32
    assert (out[:, 0] == SOT_TOKEN).all()
    for row in out:
        assert EOT_TOKEN in row
        eot_pos = int(np.argmax(row))
        assert row[eot_pos] == EOT_TOKEN  # argmax pooling contract
        assert (row[eot_pos + 1:] == 0).all()


def test_eot_is_argmax(tok):
    """The text tower pools at argmax(ids); EOT must be the max id."""
    out = tok("some words here")
    assert out.max() == EOT_TOKEN


def test_truncation_keeps_eot(tok):
    long_text = "word " * 500
    out = tok(long_text)
    assert out.shape == (1, CONTEXT_LENGTH)
    assert out[0, -1] == EOT_TOKEN


def test_roundtrip_decode(tok):
    text = "a photo of a cat"
    ids = tok.encode(text)
    assert tok.decode(ids).strip() == text


def test_unicode_safe(tok):
    out = tok(["café ☕ 猫"])
    assert out.shape == (1, CONTEXT_LENGTH)
    assert (out >= 0).all() and (out < VOCAB_SIZE).all()


def test_empty_and_whitespace(tok):
    out = tok(["", "   "])
    assert (out[:, 0] == SOT_TOKEN).all()
    assert (out[:, 1] == EOT_TOKEN).all()


def test_deterministic(tok):
    a = tok(["the same sentence twice"])
    b = tok(["the same sentence twice"])
    np.testing.assert_array_equal(a, b)


def test_ids_stay_within_vocab(tok):
    out = tok(["Lots-of-punct!!! éèê, numbers 123 456"])
    assert (out < VOCAB_SIZE).all()


def test_bpe_merge_algorithm_with_synthetic_merges(tmp_path):
    """Exact BPE behavior with a controlled merges file: merge priority,
    </w> handling, and id layout must follow the CLIP algorithm."""
    import gzip

    # merges: prefer 'lo' then 'low</w>'... build a tiny ranked table
    merges = "#version: 0.2\nl o\nlo w</w>\nh e\nhe l\nhel lo</w>\n"
    p = tmp_path / "merges.txt.gz"
    with gzip.open(p, "wt") as f:
        # pad to the expected line count window (loader slices [1:48895])
        f.write(merges)
    tok = SimpleTokenizer(bpe_path=str(p))
    assert tok.has_merges
    # 'low' -> l+o merge first (rank 0), then 'lo'+'w</w>' (rank 1) => one token
    ids = tok.encode("low")
    assert len(ids) == 1
    assert tok.decoder[ids[0]] == "low</w>"
    # 'hello' -> h+e, he+l, hel+lo</w>?? 'hello' = h e l l o</w>;
    # merges: l+o is rank 0 but needs adjacent 'l','o' -> 'hel' 'lo</w>'? trace:
    # [h e l l o</w>]: 'l o' pair absent ('o</w>' differs); 'h e'(r2) -> [he l l o</w>]
    # 'he l'(r3) -> [hel l o</w>]; no further merges match => 3 tokens
    ids = tok.encode("hello")
    toks = [tok.decoder[i] for i in ids]
    assert toks == ["hel", "l", "o</w>"], toks
    # specials still pinned
    assert tok.encoder["<|endoftext|>"] == EOT_TOKEN
    out = tok(["hello low"])
    assert out[0, 0] == SOT_TOKEN and EOT_TOKEN in out[0]


def test_strict_mode_requires_merges(tmp_path, monkeypatch):
    """strict=True must refuse the zero-merges fallback (pretrained parity
    gate, VERDICT r1 item 5); with a merges file present it constructs."""
    import gzip

    monkeypatch.delenv("COLXLIP_BPE_PATH", raising=False)
    import colxlip_tpu.data.tokenizer as tokmod
    if tokmod._find_default_bpe() is None:
        with pytest.raises(RuntimeError, match="bpe_simple_vocab_16e6"):
            SimpleTokenizer(strict=True)
    p = tmp_path / "merges.txt.gz"
    with gzip.open(p, "wt") as f:
        f.write("#version: 0.2\nl o\n")
    tok = SimpleTokenizer(bpe_path=str(p), strict=True)
    assert tok.has_merges


def test_factory_get_tokenizer_require_merges(monkeypatch):
    monkeypatch.delenv("COLXLIP_BPE_PATH", raising=False)
    from colxlip_tpu.factory import get_tokenizer
    import colxlip_tpu.data.tokenizer as tokmod

    if tokmod._find_default_bpe() is None:
        with pytest.raises(RuntimeError):
            get_tokenizer("ViT-B-32-colxlip", require_merges=True)
    # non-strict always constructs
    assert get_tokenizer("ViT-B-32-colxlip").context_length == 77


# Golden CLIP token ids (OpenAI CLIP published examples). These require the
# real merge table — they run only when the asset has been fetched
# (scripts/fetch_assets.py), and are the bit-compatibility proof.
GOLDEN = [
    ("a photo of a cat", [49406, 320, 1125, 539, 320, 2368, 49407]),
    ("a photo of a dog", [49406, 320, 1125, 539, 320, 1929, 49407]),
    ("a diagram", [49406, 320, 22697, 49407]),
]


@pytest.mark.skipif(
    __import__("colxlip_tpu.data.tokenizer", fromlist=["x"])._find_default_bpe()
    is None,
    reason="real BPE merges asset not fetched (scripts/fetch_assets.py)",
)
@pytest.mark.parametrize("text,expected", GOLDEN)
def test_golden_clip_token_ids(text, expected):
    tok = SimpleTokenizer(strict=True)
    ids = [tok.sot_token] + tok.encode(text) + [tok.eot_token]
    assert ids == expected
