"""CLIP byte-BPE tokenizer, implemented from the published algorithm.

Native replacement for the imported ``open_clip.tokenizer.SimpleTokenizer``
the reference depends on (SURVEY.md §2.2; call sites factory.py:31,123-126):
byte-pair encoding over a 49,408-entry vocab, context length 77, with
``<|startoftext|>``/``<|endoftext|>`` specials. The EOT id (49407) is the
highest id in any sequence, which the text tower's argmax pooling relies on
(reference transformer.py:849-851).

Offline-safe design: the merge table (``bpe_simple_vocab_16e6.txt.gz``) is an
external asset. When a merges file is available (env var
``COLXLIP_BPE_PATH`` or explicit argument) tokenization is bit-compatible
with CLIP's. Without it, the tokenizer degrades to ZERO merges — pure
byte-level BPE using the same id layout (ids 0-255 byte chars, 256-511
byte+'</w>', specials at 49406/49407, vocab padded to 49408) — everything
trains and evaluates identically except that pretrained-checkpoint text-side
parity requires the real merge table.
"""
from __future__ import annotations

import functools
import gzip
import html
import logging
import os
from typing import Iterable, List, Optional, Sequence, Union

import numpy as np

logger = logging.getLogger(__name__)
_warned_no_merges = False

try:
    import regex as re  # supports \p{L}/\p{N} classes like the original

    _PAT = re.compile(
        r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
        re.IGNORECASE,
    )
except ImportError:  # pragma: no cover - regex is available in this image
    import re

    _PAT = re.compile(
        r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[a-z]+|[0-9]|[^\sa-z0-9]+""",
        re.IGNORECASE,
    )

VOCAB_SIZE = 49408
CONTEXT_LENGTH = 77
SOT_TOKEN = 49406
EOT_TOKEN = 49407
DEFAULT_BPE_ENV = "COLXLIP_BPE_PATH"


@functools.lru_cache()
def bytes_to_unicode():
    """Reversible byte <-> printable-unicode map (GPT-2/CLIP standard)."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def get_pairs(word):
    pairs = set()
    prev = word[0]
    for ch in word[1:]:
        pairs.add((prev, ch))
        prev = ch
    return pairs


def basic_clean(text: str) -> str:
    # open_clip's basic_clean chains ftfy.fix_text then a double
    # html.unescape; textfix.fix_text is the native ftfy equivalent
    # (mojibake repair, surrogates, ligatures, width, quotes, controls, NFC)
    # so web-scraped caption tokenization matches the reference's.
    from .textfix import fix_text

    text = fix_text(text)
    text = html.unescape(html.unescape(text))
    return text.strip()


def whitespace_clean(text: str) -> str:
    import re as _re

    return _re.sub(r"\s+", " ", text).strip()


def _find_default_bpe() -> Optional[str]:
    p = os.environ.get(DEFAULT_BPE_ENV)
    if p and os.path.exists(p):
        return p
    here = os.path.join(os.path.dirname(__file__), "bpe_simple_vocab_16e6.txt.gz")
    if os.path.exists(here):
        return here
    return None


class SimpleTokenizer:
    """CLIP BPE tokenizer (+ zero-merge byte fallback)."""

    def __init__(
        self,
        bpe_path: Optional[str] = None,
        context_length: int = CONTEXT_LENGTH,
        strict: bool = False,
    ):
        """``strict=True`` refuses to construct without the real merge table
        (required whenever pretrained-checkpoint text parity matters)."""
        self.context_length = context_length
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}

        bpe_path = bpe_path or _find_default_bpe()
        if bpe_path is not None:
            opener = gzip.open if bpe_path.endswith(".gz") else open
            with opener(bpe_path, "rt", encoding="utf-8") as f:
                merges = f.read().split("\n")
            merges = merges[1 : 49152 - 256 - 2 + 1]
            merges = [tuple(m.split()) for m in merges]
        else:
            merges = []
        self.has_merges = bool(merges)
        if not self.has_merges:
            msg = (
                "CLIP BPE merge table (bpe_simple_vocab_16e6.txt.gz) not "
                "found — tokenization will use the ZERO-MERGES byte fallback, "
                "which is NOT bit-compatible with CLIP. Self-consistent for "
                "training from scratch; WRONG for pretrained checkpoints. "
                "Fetch the asset with scripts/fetch_assets.py or set "
                f"${DEFAULT_BPE_ENV}."
            )
            if strict:
                raise RuntimeError(msg)
            global _warned_no_merges
            if not _warned_no_merges:
                logger.warning(msg)
                _warned_no_merges = True

        self._merges = merges  # kept for the native core's table
        vocab = list(self.byte_encoder.values())
        vocab = vocab + [v + "</w>" for v in vocab]
        for merge in merges:
            vocab.append("".join(merge))
        self.encoder = {tok: i for i, tok in enumerate(vocab)}
        # specials pinned to the canonical CLIP ids regardless of merge count,
        # so argmax(EOT) pooling and the 49408-wide embedding stay valid.
        self.encoder["<|startoftext|>"] = SOT_TOKEN
        self.encoder["<|endoftext|>"] = EOT_TOKEN
        self.decoder = {i: tok for tok, i in self.encoder.items()}
        self.bpe_ranks = dict(zip(merges, range(len(merges))))
        self.cache = {
            "<|startoftext|>": "<|startoftext|>",
            "<|endoftext|>": "<|endoftext|>",
        }
        self.vocab_size = VOCAB_SIZE
        self.sot_token = SOT_TOKEN
        self.eot_token = EOT_TOKEN
        self.all_special_ids = [SOT_TOKEN, EOT_TOKEN]
        self._native_handle = None
        self._native_tried = False

    def bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        if not self.bpe_ranks:
            out = " ".join(word)
            self.cache[token] = out
            return out
        pairs = get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if word[i] == first and i < len(word) - 1 and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = get_pairs(word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        bpe_tokens: List[int] = []
        text = whitespace_clean(basic_clean(text)).lower()
        for token in _PAT.findall(text):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            bpe_tokens.extend(self.encoder[t] for t in self.bpe(token).split(" "))
        return bpe_tokens

    def decode(self, tokens: Iterable[int]) -> str:
        text = "".join(self.decoder.get(int(t), "") for t in tokens)
        text = (
            bytearray(self.byte_decoder.get(c, 32) for c in text)
            .decode("utf-8", errors="replace")
            .replace("</w>", " ")
        )
        return text

    # The native core handles only clean printable ASCII: '<' could form a
    # special-token literal, '&' an HTML entity (basic_clean unescapes), and
    # \x1c-\x1f are Python-regex whitespace the C scanner doesn't model.
    _NATIVE_ELIGIBLE = __import__("re").compile(r"^[\t\n\r\x20-\x7e]*$")

    def _get_native(self):
        """Lazy handle to the C++ BPE core (same merge table); None if the
        native build is unavailable or disabled via COLXLIP_NATIVE_TOKENIZER=0."""
        if self._native_tried:
            return self._native_handle
        self._native_tried = True
        if os.environ.get("COLXLIP_NATIVE_TOKENIZER", "1") == "0":
            return None
        try:
            from .. import native

            blob = "\n".join(" ".join(m) for m in self._merges).encode("utf-8")
            self._native_handle = native.bpe_init(blob)
        except Exception as e:  # noqa: BLE001 — fall back to the Python path
            logger.warning("native tokenizer unavailable: %s", e)
            self._native_handle = None
        return self._native_handle

    def __del__(self):
        # each handle holds the full 49k-entry encoder + ranks maps natively;
        # release it so repeated tokenizer construction doesn't leak
        if getattr(self, "_native_handle", None) is not None:
            try:
                from .. import native

                native.bpe_free(self._native_handle)
            except Exception:  # noqa: BLE001 — interpreter teardown
                pass
            self._native_handle = None

    def __call__(
        self,
        texts: Union[str, Sequence[str]],
        context_length: Optional[int] = None,
    ) -> np.ndarray:
        """Tokenize into a zero-padded [n, context_length] int32 array.

        Over-long inputs are truncated with EOT forced into the last slot,
        matching open_clip's tokenize() behavior. Printable-ASCII strings
        take the C++ BPE core (byte-identical, tests/test_native_tokenizer.py);
        anything else goes through the reference Python path.
        """
        if isinstance(texts, str):
            texts = [texts]
        context_length = context_length or self.context_length
        result = np.zeros((len(texts), context_length), dtype=np.int32)

        native_handle = self._get_native()
        native_idx: list = []
        for i, text in enumerate(texts):
            if native_handle is not None and self._NATIVE_ELIGIBLE.match(text) \
                    and "<" not in text and "&" not in text:
                native_idx.append(i)
                continue
            tokens = [self.sot_token] + self.encode(text) + [self.eot_token]
            if len(tokens) > context_length:
                tokens = tokens[:context_length]
                tokens[-1] = self.eot_token
            result[i, : len(tokens)] = tokens
        if native_idx:
            from .. import native

            encoded = native.bpe_encode_batch(
                native_handle,
                [texts[i].encode("ascii") for i in native_idx],
                context_length,
            )
            result[np.asarray(native_idx)] = encoded
        return result


@functools.lru_cache()
def get_tokenizer_cached(context_length: int = CONTEXT_LENGTH) -> SimpleTokenizer:
    return SimpleTokenizer(context_length=context_length)
