#!/usr/bin/env python
"""Fetch external assets the framework cannot vendor: the CLIP BPE merges.

Tokenization that is bit-compatible with CLIP (and therefore text-side R@1
parity against reference ``.pt`` checkpoints — SURVEY.md §7.3) requires the
``bpe_simple_vocab_16e6.txt.gz`` merge table published with OpenAI CLIP. The
file is ~1.3 MB and cannot be synthesized offline; this script downloads it
with a pinned sha256 and installs it where ``colxlip_tpu.data.tokenizer``
looks for it (next to tokenizer.py, or $COLXLIP_BPE_PATH).

Usage:
    python scripts/fetch_assets.py [--dest PATH] [--sha256 HEX | --no-verify]

Until the asset is present the tokenizer runs a zero-merges byte-level
fallback: self-consistent for training from scratch, but NOT bit-compatible
with CLIP — the factory refuses to combine it with ``--pretrained``.
"""
from __future__ import annotations

import argparse
import hashlib
import os
import sys
import tempfile
import urllib.request

# sha256 of the canonical bpe_simple_vocab_16e6.txt.gz as published by
# OpenAI CLIP (same bytes redistributed by open_clip). Override with
# --sha256 if the mirror you trust serves a re-compressed copy.
PINNED_SHA256 = "924691ac288e54409236115652ad4aa250f48203de50a9e4722a6ecd48d6804a"

URLS = [
    "https://github.com/openai/CLIP/raw/main/clip/bpe_simple_vocab_16e6.txt.gz",
    "https://raw.githubusercontent.com/openai/CLIP/main/clip/bpe_simple_vocab_16e6.txt.gz",
    "https://github.com/mlfoundations/open_clip/raw/main/src/open_clip/bpe_simple_vocab_16e6.txt.gz",
]

DEFAULT_DEST = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "colxlip_tpu", "data", "bpe_simple_vocab_16e6.txt.gz",
)


def sha256_of(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


# merge count the tokenizer consumes: lines[1 : 49152-256-2+1]
# (data/tokenizer.py:130 — same slice CLIP's tokenizer uses)
EXPECTED_MERGES = 49152 - 256 - 2


def validate_merges(path: str) -> int:
    """Sanity-check the merge table independent of the hash pin: the full
    merge count must be present (a truncated download must not install) and
    every consumed line must be a 2-token pair."""
    import gzip

    with gzip.open(path, "rt", encoding="utf-8") as f:
        lines = f.read().split("\n")
    merges = lines[1 : EXPECTED_MERGES + 1]
    if len(merges) < EXPECTED_MERGES:
        raise ValueError(
            f"truncated merge table: {len(merges)} merges, expected "
            f"{EXPECTED_MERGES}")
    bad = [m for m in merges if len(m.split()) != 2]
    if bad:
        raise ValueError(f"{len(bad)} malformed merge lines, e.g. {bad[:3]}")
    return len(merges)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dest", default=DEFAULT_DEST)
    p.add_argument("--sha256", default=PINNED_SHA256,
                   help="expected sha256 (hex) of the downloaded file")
    p.add_argument("--no-verify", action="store_true",
                   help="skip the hash pin (structural validation still runs)")
    p.add_argument("--url", action="append", default=None,
                   help="override the mirror list (repeatable; file:// works "
                        "— also how the tests exercise this script)")
    args = p.parse_args(argv)
    urls = args.url or URLS

    if os.path.exists(args.dest):
        n = validate_merges(args.dest)
        print(f"already present: {args.dest} ({n} merges, "
              f"sha256={sha256_of(args.dest)})")
        return 0

    last_err = None
    for url in urls:
        print(f"fetching {url} ...")
        try:
            fd, tmp = tempfile.mkstemp(suffix=".txt.gz")
            os.close(fd)
            urllib.request.urlretrieve(url, tmp)
            digest = sha256_of(tmp)
            if not args.no_verify and digest != args.sha256.lower():
                raise ValueError(
                    f"sha256 mismatch: expected {args.sha256}, got {digest} "
                    f"(pass --sha256 {digest} ONLY if you trust this mirror)"
                )
            n = validate_merges(tmp)
            os.makedirs(os.path.dirname(args.dest), exist_ok=True)
            os.replace(tmp, args.dest)
            print(f"installed {args.dest} ({n} merges, sha256={digest})")
            return 0
        except Exception as e:  # noqa: BLE001 — try the next mirror
            last_err = e
            print(f"  failed: {e}", file=sys.stderr)
            if os.path.exists(tmp):
                os.unlink(tmp)
    print(f"all mirrors failed; last error: {last_err}", file=sys.stderr)
    return 1


if __name__ == "__main__":
    sys.exit(main())
