#!/usr/bin/env python
"""Pack wds tar shards into pre-decoded raw-uint8 shards.

Removes JPEG decode from the training hot path (SURVEY.md §7.3's
"ahead-of-time resized shards" prescription for the 192k decodes/s pod
feed). See colxlip_tpu/data/pack.py for the format and the measured
host-decode bound it eliminates.

Usage:
  python scripts/pack_shards.py --urls '/data/shard-{0000..0099}.tar' \
      --out-dir /data/packed --size 256 --workers 8
Then train with --train-data '/data/packed/shard-{0000..0099}.tar'
(optionally --raw-aug crop for the zero-PIL host path).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from colxlip_tpu.data.pack import main

if __name__ == "__main__":
    raise SystemExit(main())
