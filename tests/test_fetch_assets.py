"""scripts/fetch_assets.py against local file:// fixtures.

The script is the single entry point for the one external asset text-parity
depends on (the CLIP BPE merges table, SURVEY.md §7.3); these tests pin its
install/refuse behavior without network: sha256 match installs, mismatch
refuses, truncated or malformed tables are rejected structurally.
"""
import gzip
import hashlib
import importlib.util
from pathlib import Path

import pytest

_SPEC = importlib.util.spec_from_file_location(
    "fetch_assets",
    Path(__file__).resolve().parents[1] / "scripts" / "fetch_assets.py")
fetch_assets = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(fetch_assets)


def _write_merges_gz(path: Path, n_merges: int, malformed_at: int = -1):
    lines = ["#version: 0.2 fixture header"]
    for i in range(n_merges):
        lines.append("bad" if i == malformed_at else f"tok{i} en{i}")
    lines.append("")  # canonical file ends with a newline
    path.write_bytes(gzip.compress("\n".join(lines).encode("utf-8")))
    return hashlib.sha256(path.read_bytes()).hexdigest()


@pytest.fixture()
def full_fixture(tmp_path):
    src = tmp_path / "merges_full.txt.gz"
    digest = _write_merges_gz(src, fetch_assets.EXPECTED_MERGES)
    return src, digest


def test_sha_match_installs(tmp_path, full_fixture, capsys):
    src, digest = full_fixture
    dest = tmp_path / "out" / "bpe.txt.gz"
    rc = fetch_assets.main(["--url", src.as_uri(), "--dest", str(dest),
                            "--sha256", digest])
    assert rc == 0
    assert dest.exists()
    assert hashlib.sha256(dest.read_bytes()).hexdigest() == digest
    assert "installed" in capsys.readouterr().out


def test_sha_mismatch_refuses(tmp_path, full_fixture, capsys):
    src, _ = full_fixture
    dest = tmp_path / "out" / "bpe.txt.gz"
    rc = fetch_assets.main(["--url", src.as_uri(), "--dest", str(dest),
                            "--sha256", "0" * 64])
    assert rc == 1
    assert not dest.exists()
    assert "sha256 mismatch" in capsys.readouterr().err


def test_truncated_table_rejected_even_unverified(tmp_path, capsys):
    src = tmp_path / "merges_short.txt.gz"
    _write_merges_gz(src, 1000)
    dest = tmp_path / "out" / "bpe.txt.gz"
    rc = fetch_assets.main(["--url", src.as_uri(), "--dest", str(dest),
                            "--no-verify"])
    assert rc == 1
    assert not dest.exists()
    assert "truncated" in capsys.readouterr().err


def test_malformed_line_rejected(tmp_path, capsys):
    src = tmp_path / "merges_bad.txt.gz"
    _write_merges_gz(src, fetch_assets.EXPECTED_MERGES, malformed_at=7)
    dest = tmp_path / "out" / "bpe.txt.gz"
    rc = fetch_assets.main(["--url", src.as_uri(), "--dest", str(dest),
                            "--no-verify"])
    assert rc == 1
    assert not dest.exists()
    assert "malformed" in capsys.readouterr().err


def test_validate_merges_direct(tmp_path):
    good = tmp_path / "m.txt.gz"
    _write_merges_gz(good, fetch_assets.EXPECTED_MERGES)
    assert fetch_assets.validate_merges(str(good)) == fetch_assets.EXPECTED_MERGES
    short = tmp_path / "s.txt.gz"
    _write_merges_gz(short, 10)
    with pytest.raises(ValueError, match="truncated"):
        fetch_assets.validate_merges(str(short))


def test_already_present_validates(tmp_path, capsys):
    dest = tmp_path / "bpe.txt.gz"
    _write_merges_gz(dest, fetch_assets.EXPECTED_MERGES)
    rc = fetch_assets.main(["--dest", str(dest)])
    assert rc == 0
    assert "already present" in capsys.readouterr().out


def test_mirror_fallback_tries_next_url(tmp_path, full_fixture):
    src, digest = full_fixture
    dest = tmp_path / "out" / "bpe.txt.gz"
    missing = (tmp_path / "nope.txt.gz").as_uri()
    rc = fetch_assets.main(["--url", missing, "--url", src.as_uri(),
                            "--dest", str(dest), "--sha256", digest])
    assert rc == 0
    assert dest.exists()
