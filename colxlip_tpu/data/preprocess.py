"""Dataset preparation tooling.

Counterpart of reference preprocess/ (SURVEY.md §2.1 C10):
  - ``convert_csv_to_parquet``: csv -> parquet (convert_to_parquet.py:1-18)
  - ``presplit_captions_in_tar`` + ``presplit_captions``: rewrite tar shards
    splitting the 7 recaption fields into sentence lists, in parallel across
    shards (presplit_captions.py:1-67)
  - ``scrape_config``: the img2dataset invocation the reference drives from
    scraping_cc3m.sh:1-9, emitted as a config dict / CLI string (img2dataset
    itself is not bundled; zero-egress environments only get the plan)
"""
from __future__ import annotations

import io
import json
import logging
import os
import tarfile
from concurrent.futures import ProcessPoolExecutor
from typing import Dict, List, Optional, Sequence

from .captions import CAPTION_KEYS, split_caption

logger = logging.getLogger(__name__)


def convert_csv_to_parquet(csv_path: str, parquet_path: Optional[str] = None) -> str:
    """csv -> parquet (reference preprocess/convert_to_parquet.py)."""
    import pandas as pd

    if parquet_path is None:
        parquet_path = os.path.splitext(csv_path)[0] + ".parquet"
    df = pd.read_csv(csv_path)
    df.to_parquet(parquet_path, index=False)
    return parquet_path


def presplit_captions_in_tar(
    tar_path: str,
    out_path: Optional[str] = None,
    caption_keys: Sequence[str] = CAPTION_KEYS,
) -> str:
    """Rewrite one shard with caption fields sentence-split into lists.

    Reference preprocess/presplit_captions.py:17-49: for each sample's json,
    every caption key's string value becomes a list of sentences; already-list
    values are left as-is. Writes ``out_path`` (default: in-place via .tmp).
    """
    inplace = out_path is None
    dst = tar_path + ".tmp" if inplace else out_path
    with tarfile.open(tar_path, "r") as src, tarfile.open(dst, "w") as out:
        for member in src:
            if not member.isfile():
                continue
            data = src.extractfile(member).read()
            if member.name.endswith(".json"):
                try:
                    meta = json.loads(data)
                    for key in caption_keys:
                        v = meta.get(key)
                        if isinstance(v, str):
                            meta[key] = split_caption(v)
                        elif isinstance(v, list):
                            meta[key] = [s for c in v for s in (
                                split_caption(c) if isinstance(c, str) else [c])]
                    data = json.dumps(meta).encode()
                except (ValueError, KeyError) as e:
                    logger.warning("presplit: bad json in %s/%s: %s",
                                   tar_path, member.name, e)
            info = tarfile.TarInfo(member.name)
            info.size = len(data)
            out.addfile(info, io.BytesIO(data))
    if inplace:
        os.replace(dst, tar_path)
        return tar_path
    return dst


def presplit_captions(
    tar_paths: Sequence[str],
    out_dir: Optional[str] = None,
    num_workers: int = 8,
) -> List[str]:
    """Parallel shard rewrite (reference presplit_captions.py:52-67)."""
    jobs = []
    for p in tar_paths:
        out = os.path.join(out_dir, os.path.basename(p)) if out_dir else None
        jobs.append((p, out))
    if num_workers <= 1:
        return [presplit_captions_in_tar(p, o) for p, o in jobs]
    with ProcessPoolExecutor(max_workers=num_workers) as ex:
        futures = [ex.submit(presplit_captions_in_tar, p, o) for p, o in jobs]
        return [f.result() for f in futures]


def scrape_config(
    parquet_path: str,
    output_dir: str,
    *,
    processes: int = 16,
    thread_count: int = 64,
    image_size: int = 512,
    caption_cols: Sequence[str] = CAPTION_KEYS[1:],
) -> Dict:
    """The img2dataset scrape plan (reference preprocess/scraping_cc3m.sh:1-9):
    parquet in, WebDataset tar shards out, preserving the recaption columns."""
    cfg = {
        "url_list": parquet_path,
        "input_format": "parquet",
        "url_col": "url",
        "caption_col": "raw_caption",
        "save_additional_columns": list(caption_cols),
        "output_format": "webdataset",
        "output_folder": output_dir,
        "processes_count": processes,
        "thread_count": thread_count,
        "image_size": image_size,
        "resize_mode": "keep_ratio",
    }
    def fmt(v):
        # list args (save_additional_columns — the recaption columns the
        # diverse-sampling pipeline depends on) must not be dropped: emit
        # them as a quoted JSON literal, which img2dataset parses
        if isinstance(v, list):
            return "'" + json.dumps(v) + "'"
        return str(v)

    cfg["cli"] = "img2dataset " + " ".join(
        f"--{k.replace('_', '-')}={fmt(v)}" for k, v in cfg.items()
        if k != "cli"
    )
    return cfg


def run_scrape(cfg: Dict, dry_run: bool = False) -> int:
    """Execute the img2dataset scrape described by ``scrape_config``.

    Parity with reference preprocess/scraping_cc3m.sh:1-9, which *runs* the
    scrape rather than printing it. Prefers the Python API (img2dataset's CLI
    is a thin fire wrapper over ``img2dataset.download``); errors clearly if
    the package is not installed (it is not bundled — zero-egress dev
    environments only get the plan via ``dry_run``/``scrape_config``).
    """
    print(cfg["cli"])
    if dry_run:
        return 0
    try:
        from img2dataset import download
    except ImportError as e:
        raise RuntimeError(
            "img2dataset is not installed; install it (`pip install "
            "img2dataset`) or run the printed CLI on a machine that has it"
        ) from e
    download(**{k: v for k, v in cfg.items() if k != "cli"})
    return 0


def main(argv: Optional[Sequence[str]] = None) -> int:
    """CLI: `python -m colxlip_tpu.data.preprocess scrape|presplit|parquet`."""
    import argparse

    p = argparse.ArgumentParser(description="dataset preparation tooling")
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("scrape", help="img2dataset parquet -> wds shards "
                                       "(reference scraping_cc3m.sh)")
    sp.add_argument("--parquet", required=True)
    sp.add_argument("--output-dir", required=True)
    sp.add_argument("--processes", type=int, default=16)
    sp.add_argument("--thread-count", type=int, default=64)
    sp.add_argument("--image-size", type=int, default=512)
    sp.add_argument("--dry-run", action="store_true",
                    help="print the img2dataset CLI without executing")

    pp = sub.add_parser("presplit", help="sentence-split caption fields in "
                                         "tar shards (presplit_captions.py)")
    pp.add_argument("shards", nargs="+")
    pp.add_argument("--out-dir", default=None)
    pp.add_argument("--workers", type=int, default=8)

    cp = sub.add_parser("parquet", help="csv -> parquet")
    cp.add_argument("csv")
    cp.add_argument("--out", default=None)

    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    if args.cmd == "scrape":
        cfg = scrape_config(
            args.parquet, args.output_dir, processes=args.processes,
            thread_count=args.thread_count, image_size=args.image_size)
        return run_scrape(cfg, dry_run=args.dry_run)
    if args.cmd == "presplit":
        out = presplit_captions(args.shards, out_dir=args.out_dir,
                                num_workers=args.workers)
        print("\n".join(out))
        return 0
    print(convert_csv_to_parquet(args.csv, args.out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
