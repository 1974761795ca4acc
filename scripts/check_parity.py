#!/usr/bin/env python
"""Golden-parity check: compare a results.jsonl eval run against expected R@K.

This is the one-command reference-checkpoint parity procedure (BASELINE.md:
run the PyTorch reference's released checkpoint through the 7 retrieval
suites, record the golden numbers, then verify this framework reproduces
them).

Procedure:
  1. Fetch assets: ``python scripts/fetch_assets.py`` (BPE merges — required
     for text-side parity) and the suite images per datasets/EVAL_DATASETS.md
     (annotation JSONs are vendored in datasets/).
  2. Produce goldens ONCE with the reference (or trust its published numbers)
     and store them in an expected-results JSON (schema below).
  3. Run ``CKPT=<ref.pt> scripts/inference.sh`` here, then
     ``python scripts/check_parity.py logs/<run>/checkpoints/results.jsonl \
           datasets/golden/<name>.expected.json``

Expected-results schema (live instance: datasets/golden/
torch_oracle.expected.json — the offline torch-oracle golden produced and
verified by tests/test_golden_parity.py):
    {
      "checkpoint": "<id/url of the reference checkpoint>",
      "source": "how the goldens were produced",
      "tolerance": 0.005,                      # absolute R@K tolerance
      "metrics": {"coco_image_to_text_R@1": 0.xxxx, ...}
    }
Metric keys follow results.jsonl: <suite>_<direction>_<R@K|mean_rank|...>.

Exit code 0 = all metrics within tolerance; 1 = any miss (each printed).
"""
from __future__ import annotations

import argparse
import json
import os
import sys


def _check_tokenizer_asset(required: bool) -> bool:
    """Text-side parity against a REAL reference checkpoint additionally
    requires the CLIP BPE merges asset; without it tokenization falls back to
    zero merges and recall numbers are NOT comparable to the reference's.
    Goldens with ``requires_clip_bpe: true`` make this a hard failure (the
    offline torch-oracle golden is self-consistent either way). Returns
    True when the check may proceed."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    try:
        from colxlip_tpu.data.tokenizer import SimpleTokenizer

        if not SimpleTokenizer().has_merges:
            print("=" * 72, file=sys.stderr)
            print(("ERROR" if required else "WARNING") +
                  ": CLIP BPE merges asset NOT found — tokenizer is in "
                  "the\nzero-merges fallback. Parity vs a real reference "
                  "checkpoint is NOT\nmeaningful until you fetch it: "
                  "python scripts/fetch_assets.py", file=sys.stderr)
            print("=" * 72, file=sys.stderr)
            return not required
    except Exception as e:  # noqa: BLE001 — the warning must never mask the check
        print(f"(tokenizer asset check skipped: {e})", file=sys.stderr)
    return True


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("results_jsonl", help="results.jsonl produced by evaluate()")
    p.add_argument("expected_json", help="expected-results file (schema above)")
    p.add_argument("--line", type=int, default=-1,
                   help="which results.jsonl line to check (default: last)")
    p.add_argument("--tolerance", type=float, default=None,
                   help="override the file's tolerance")
    p.add_argument("--allow-degraded-tokenizer", action="store_true",
                   help="check anyway when the golden requires the CLIP BPE "
                        "asset but it is absent (numbers will NOT match)")
    args = p.parse_args()

    with open(args.expected_json) as f:
        expected = json.load(f)
    if expected.get("metrics") is None:
        print(f"{args.expected_json}: goldens are UNRECORDED — run step 2 of "
              "docs/PARITY_RUNBOOK.md to produce them from the reference, "
              "then fill 'metrics'.", file=sys.stderr)
        return 2
    required = bool(expected.get("requires_clip_bpe")) \
        and not args.allow_degraded_tokenizer
    if not _check_tokenizer_asset(required):
        return 2

    with open(args.results_jsonl) as f:
        lines = [json.loads(l) for l in f if l.strip()]
    if not lines:
        print("results.jsonl is empty", file=sys.stderr)
        return 1
    got = lines[args.line]

    tol = args.tolerance if args.tolerance is not None else expected.get(
        "tolerance", 0.005)

    misses, hits = [], 0
    for key, want in expected["metrics"].items():
        if key not in got:
            misses.append(f"MISSING  {key} (expected {want})")
            continue
        have = got[key]
        if abs(have - want) > tol:
            misses.append(f"MISMATCH {key}: got {have:.4f}, "
                          f"expected {want:.4f} (tol {tol})")
        else:
            hits += 1

    print(f"parity: {hits}/{len(expected['metrics'])} metrics within "
          f"±{tol} of '{expected.get('checkpoint', '?')}'")
    for m in misses:
        print("  " + m)
    return 1 if misses else 0


if __name__ == "__main__":
    sys.exit(main())
