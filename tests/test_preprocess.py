"""Preprocess tooling tests: presplit captions, csv->parquet, scrape plan."""
import io
import json
import os
import tarfile

import pytest

from colxlip_tpu.data.preprocess import (
    convert_csv_to_parquet,
    presplit_captions,
    presplit_captions_in_tar,
    scrape_config,
)


def _make_shard(path, n=3):
    with tarfile.open(path, "w") as tf:
        for i in range(n):
            key = f"{i:05d}"
            img = b"\xff\xd8\xff\xe0fakejpeg"
            info = tarfile.TarInfo(f"{key}.jpg")
            info.size = len(img)
            tf.addfile(info, io.BytesIO(img))
            meta = json.dumps({
                "raw_caption": "First sentence. Second sentence",
                "shortIB_captions": "Only one here",
                "longSV_captions": ["Already. split", "ok"],
            }).encode()
            info = tarfile.TarInfo(f"{key}.json")
            info.size = len(meta)
            tf.addfile(info, io.BytesIO(meta))


def test_presplit_captions_in_tar(tmp_path):
    shard = str(tmp_path / "s.tar")
    _make_shard(shard)
    out = presplit_captions_in_tar(shard, str(tmp_path / "out.tar"))
    with tarfile.open(out) as tf:
        metas = [json.load(tf.extractfile(m)) for m in tf
                 if m.name.endswith(".json")]
    assert len(metas) == 3
    m = metas[0]
    assert m["raw_caption"] == ["First sentence", "Second sentence"]
    assert m["shortIB_captions"] == ["Only one here"]
    assert m["longSV_captions"] == ["Already", "split", "ok"]


def test_presplit_inplace_and_parallel(tmp_path):
    shards = []
    for i in range(3):
        p = str(tmp_path / f"s{i}.tar")
        _make_shard(p)
        shards.append(p)
    out = presplit_captions(shards, num_workers=2)
    assert out == shards
    with tarfile.open(shards[0]) as tf:
        meta = json.load(tf.extractfile(
            [m for m in tf if m.name.endswith(".json")][0]))
    assert isinstance(meta["raw_caption"], list)


def test_csv_to_parquet(tmp_path):
    import pandas as pd

    csv = tmp_path / "x.csv"
    pd.DataFrame({"url": ["a", "b"], "raw_caption": ["c1", "c2"]}).to_csv(csv, index=False)
    out = convert_csv_to_parquet(str(csv))
    assert out.endswith(".parquet")
    df = pd.read_parquet(out)
    assert list(df.columns) == ["url", "raw_caption"]
    assert len(df) == 2


def test_scrape_config():
    cfg = scrape_config("/x/data.parquet", "/x/out")
    assert cfg["output_format"] == "webdataset"
    assert "img2dataset" in cfg["cli"]
    assert "shortIB_captions" in cfg["save_additional_columns"]


def test_run_scrape_executes_img2dataset(monkeypatch, capsys):
    """run_scrape calls img2dataset.download with the plan's kwargs
    (reference scraping_cc3m.sh executes, not prints)."""
    import sys
    import types

    from colxlip_tpu.data.preprocess import run_scrape

    calls = {}
    fake = types.ModuleType("img2dataset")
    fake.download = lambda **kw: calls.update(kw)
    monkeypatch.setitem(sys.modules, "img2dataset", fake)
    cfg = scrape_config("/x/data.parquet", "/x/out", processes=4)
    assert run_scrape(cfg) == 0
    assert calls["url_list"] == "/x/data.parquet"
    assert calls["processes_count"] == 4
    assert "cli" not in calls
    assert "img2dataset" in capsys.readouterr().out


def test_run_scrape_errors_without_img2dataset(monkeypatch):
    import builtins
    import pytest as _pytest

    from colxlip_tpu.data.preprocess import run_scrape

    real_import = builtins.__import__

    def block(name, *a, **kw):
        if name == "img2dataset":
            raise ImportError(name)
        return real_import(name, *a, **kw)

    monkeypatch.setattr(builtins, "__import__", block)
    with _pytest.raises(RuntimeError, match="img2dataset is not installed"):
        run_scrape(scrape_config("/x/a.parquet", "/x/out"))


def test_preprocess_cli_scrape_dry_run(capsys):
    from colxlip_tpu.data.preprocess import main

    rc = main(["scrape", "--parquet", "/x/a.parquet", "--output-dir", "/x/o",
               "--dry-run"])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.startswith("img2dataset ") and "--url-list=/x/a.parquet" in out


def test_preprocess_cli_parquet(tmp_path, capsys):
    import pandas as pd

    from colxlip_tpu.data.preprocess import main

    csv = tmp_path / "x.csv"
    pd.DataFrame({"url": ["a"], "raw_caption": ["c"]}).to_csv(csv, index=False)
    rc = main(["parquet", str(csv)])
    assert rc == 0
    assert capsys.readouterr().out.strip().endswith(".parquet")
