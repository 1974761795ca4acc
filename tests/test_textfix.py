"""ftfy-equivalent text repair (colxlip_tpu/data/textfix.py).

The reference's basic_clean chains ftfy.fix_text (open_clip tokenizer via
reference factory.py:31); ftfy is unavailable offline, so expected outputs
below are hand-derived from ftfy 6.x's documented default behavior (its own
doc examples where available). The property tests synthesize mojibake by
construction (encode UTF-8, decode as cp1252/latin-1) and require exact
recovery.
"""
import numpy as np
import pytest

from colxlip_tpu.data.textfix import (
    _CP1252_DECODE,
    fix_encoding,
    fix_surrogates,
    fix_text,
)
from colxlip_tpu.data.tokenizer import SimpleTokenizer, basic_clean


def _mojibake(text: str, codec: str = "cp1252", rounds: int = 1) -> str:
    """Synthesize mojibake: what `text` looks like after its UTF-8 bytes are
    wrongly decoded `rounds` times with `codec` (sloppy-cp1252 or latin-1)."""
    for _ in range(rounds):
        data = text.encode("utf-8")
        if codec == "cp1252":
            text = "".join(_CP1252_DECODE[b] for b in data)
        else:
            text = data.decode("latin-1")
    return text


# (input, expected) pairs matching ftfy.fix_text defaults (+ its uncurl)
FTFY_CORPUS = [
    # ftfy's own doc examples
    ("âœ” No problems", "✔ No problems"),
    ("The Mona Lisa doesnÃƒÂ¢Ã¢â€šÂ¬Ã¢â€žÂ¢t have eyebrows.",
     "The Mona Lisa doesn't have eyebrows."),        # triple-encoded + uncurl
    ("l’humanitÃ©", "l'humanité"),                    # mixed-level mojibake
    ("Ã©", "é"),
    ("Ã¼ber", "über"),
    ("â€œquotedâ€\x9d", '"quoted"'),                  # curly quotes + uncurl
    ("Ã¢â‚¬Ëœsingleâ€™", "'single'"),                  # mixed rounds
    ("IKEAâ„¢ desk", "IKEA™ desk"),
    ("naÃ¯ve rÃ©sumÃ©", "naïve résumé"),
    # character-level defaults
    ("ﬁnancial ﬂow", "financial flow"),               # latin ligatures
    ("Ｆｕｌｌｗｉｄｔｈ １２３", "Fullwidth 123"),       # character width
    ("don’t “stop”", "don't \"stop\""),               # uncurl quotes
    ("line break\r\nhere", "line\nbreak\nhere"),  # line breaks
    ("ansi \x1b[31mred\x1b[0m text", "ansi red text"),  # terminal escapes
    ("zero​width﻿", "zerowidth"),           # ignorable controls
    # things that must NOT change
    ("plain ascii, with punctuation!", "plain ascii, with punctuation!"),
    ("正しい日本語のテキスト", "正しい日本語のテキスト"),
    ("ελληνικά κείμενο", "ελληνικά κείμενο"),
    ("emoji 😀 stays", "emoji 😀 stays"),
    ("Ö is a real letter", "Ö is a real letter"),     # lone Ö: no valid repair
    ("A±B", "A±B"),                                   # ± alone is legitimate
]


@pytest.mark.parametrize("raw,expected", FTFY_CORPUS,
                         ids=[repr(r)[:30] for r, _ in FTFY_CORPUS])
def test_ftfy_corpus(raw, expected):
    assert fix_text(raw) == expected


@pytest.mark.parametrize("codec", ["cp1252", "latin-1"])
@pytest.mark.parametrize("rounds", [1, 2])
def test_mojibake_recovery_by_construction(codec, rounds):
    originals = [
        "déjà vu — sœur naïve",
        "Привет мир",
        "日本語のキャプション",
        "smörgåsbord with ål",
        "çok güzel ışık",
        "niño español",
    ]
    for text in originals:
        broken = _mojibake(text, codec, rounds)
        if broken == text:
            continue
        assert fix_text(broken) == fix_text(text), (
            f"{text!r} not recovered from {broken!r}")


def test_mixed_clean_and_mojibake_segments():
    # clean non-ASCII + mojibake in one string: whole-string decode fails,
    # per-segment repair must still fix the broken part only
    assert fix_encoding("café avec Ã©clat") == "café avec éclat"


def test_surrogate_pairs_combine():
    assert fix_surrogates("😀") == "😀"
    assert fix_surrogates("a\ud800b") == "a�b"   # lone surrogate -> U+FFFD
    assert fix_text("pair 😀 ok") == "pair 😀 ok"


def test_nfc_normalization():
    # decomposed e + combining acute -> composed é
    assert fix_text("café") == "café"


def test_basic_clean_entities_and_mojibake():
    # open_clip: ftfy + double html.unescape + strip
    assert basic_clean("  &amp;amp; that  ") == "& that"
    assert basic_clean("donÃ¢â‚¬â„¢t &quot;quote&quot;") == "don't \"quote\""


def test_tokenizer_ids_match_clean_text():
    tok = SimpleTokenizer()
    clean = tok(["don't stop the music"])
    broken = tok(["donÃ¢â‚¬â„¢t stop the music"])
    np.testing.assert_array_equal(clean, broken)


def test_fix_text_idempotent_on_corpus():
    for raw, expected in FTFY_CORPUS:
        assert fix_text(expected) == expected
