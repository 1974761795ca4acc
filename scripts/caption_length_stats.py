#!/usr/bin/env python
"""Tokenized caption-length distribution — grounds the 2-bucket text-context
choice (VERDICT r4 #7).

The text tower always computes the full fixed context (77 tokens; reference
transformer.py:863) regardless of caption length. If the feed's captions are
mostly much shorter, a 2-bucket context (e.g. 32/77 — one extra compiled
shape) cuts the text tower's FLOPs for the short bucket. This script
measures the distribution:

  - from the vendored eval annotation JSONs (COCO-style short web captions
    and Urban1k/DCI-style long captions), and/or
  - from a webdataset shard spec via the real train caption sampler
    (--train-data), i.e. the distribution the train step actually sees
    after sentence-split + random merge (reference data.py:146-182).

Lengths INCLUDE the SOT/EOT specials, i.e. they are the context a bucket
must cover (the EOT-argmax pooling needs EOT inside the window).
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from colxlip_tpu.data.tokenizer import SimpleTokenizer  # noqa: E402


def token_lengths(tokenizer, captions):
    toks = tokenizer(list(captions), context_length=77)
    # length = EOT position + 1 (EOT id is the max id, argmax finds it)
    return np.argmax(toks, axis=1) + 1


def estimated_bpe_lengths(captions):
    """CLIP-BPE length estimate from word counts (~1.3 BPE tokens/word for
    English web text, + SOT/EOT). Needed because the container lacks the
    merges asset: the zero-merges byte fallback inflates counts ~3x and
    would mis-size the buckets."""
    return np.array(
        [min(77, int(round(len(c.split()) * 1.3)) + 2) for c in captions])


def report(name, lengths, buckets):
    lengths = np.asarray(lengths)
    pct = {p: int(np.percentile(lengths, p)) for p in (50, 75, 90, 95, 99)}
    full = float((lengths >= 77).mean())
    row = {
        "source": name,
        "n": int(lengths.size),
        "mean": round(float(lengths.mean()), 1),
        "percentiles": pct,
        "at_cap_77": round(full, 4),
    }
    for b in buckets:
        row[f"fits_{b}"] = round(float((lengths <= b).mean()), 4)
    print(json.dumps(row))
    return row


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--train-data", default=None,
                    help="wds shard spec: measure the REAL train feed's "
                         "post-merge caption lengths")
    ap.add_argument("--num-samples", type=int, default=2000)
    ap.add_argument("--buckets", type=int, nargs="*", default=[24, 32, 48, 64])
    ap.add_argument("--max-merged-num", type=int, default=3)
    args = ap.parse_args()

    tok = SimpleTokenizer()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def _anns(d):
        return [a["caption"] for a in d["annotations"]]

    def _flickr(d):
        return [c for row in d for c in row["caption"]]

    suites = {
        "coco_val2017": (
            os.path.join(repo, "datasets/coco/annotations/captions_val2017.json"),
            _anns),
        "urban1k": (
            os.path.join(repo, "datasets/Urban1k/annotations/annotations.json"),
            _anns),
        "flickr30k_val": (
            os.path.join(repo, "datasets/flickr30k-images/flickr30k_val.json"),
            _flickr),
    }
    for name, (path, extract) in suites.items():
        if not os.path.exists(path):
            continue
        with open(path) as f:
            data = json.load(f)
        caps = extract(data)[: args.num_samples * 5]
        if tok.has_merges:
            report(name, token_lengths(tok, caps), args.buckets)
        else:
            report(f"{name} (BPE-estimated: no merges asset)",
                   estimated_bpe_lengths(caps), args.buckets)

    # The MERGED distribution the recipes actually train on: run the real
    # diverse-sampling/merge augmentation (data/captions.py, reference
    # data.py:146-182) over per-image caption pools. This is what sizes the
    # --text-ctx bucket for the merged recipes (round-5 measurement: p95=49,
    # fits_48=.945, fits_64=.999 at max_merged_num=3 -> --text-ctx 64 is
    # semantically lossless there).
    coco_path = suites["coco_val2017"][0]
    if os.path.exists(coco_path):
        import collections
        import random as _random

        from colxlip_tpu.data.captions import sample_diverse_captions as _sdc

        with open(coco_path) as f:
            ann = json.load(f)
        per_img = collections.defaultdict(list)
        for a in ann["annotations"]:
            per_img[a["image_id"]].append(a["caption"])
        pools = [v for v in per_img.values() if len(v) >= 3]
        pools = pools[: args.num_samples * 2]
        mrng = _random.Random(0)
        merged = [c for pool in pools
                  for c in _sdc(pool, k=2,
                                max_merged_num=args.max_merged_num, rng=mrng)]
        if tok.has_merges:
            report(f"coco merged sampler (max_merged={args.max_merged_num})",
                   token_lengths(tok, merged), args.buckets)
        else:
            report(f"coco merged sampler (max_merged={args.max_merged_num}, "
                   "BPE-estimated: no merges asset)",
                   estimated_bpe_lengths(merged), args.buckets)

    if args.train_data:
        import random
        import tarfile

        from colxlip_tpu.data.captions import (
            collect_captions, sample_diverse_captions)
        from colxlip_tpu.data.wds import expand_urls

        rng = random.Random(0)
        caps = []
        urls, _ = expand_urls(args.train_data)
        for url in urls:
            with tarfile.open(url) as tf:
                for m in tf:
                    if not m.name.endswith(".json"):
                        continue
                    meta = json.loads(tf.extractfile(m).read())
                    # caption 0 of the k sampled is what the step consumes
                    caps.append(sample_diverse_captions(
                        collect_captions(meta), k=1,
                        max_merged_num=args.max_merged_num, rng=rng)[0])
                    if len(caps) >= args.num_samples:
                        break
            if len(caps) >= args.num_samples:
                break
        if tok.has_merges:
            report("train_feed", token_lengths(tok, caps), args.buckets)
        else:
            report("train_feed (BPE-estimated: no merges asset)",
                   estimated_bpe_lengths(caps), args.buckets)


if __name__ == "__main__":
    main()
