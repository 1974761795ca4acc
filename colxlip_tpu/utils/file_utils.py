"""Remote checkpoint sync utilities.

Counterpart of the imported ``open_clip_train.file_utils`` surface the
reference uses (SURVEY.md §2.2; call sites main.py:176-196,306,447-458):
  - ``remote_sync``: one-shot local->remote directory sync (s3 via awscli
    subprocess, or fsspec when available)
  - ``start_sync_process``: background thread re-syncing every N seconds
  - ``check_exists``/``pt_load`` equivalents live in training/checkpoint.py
"""
from __future__ import annotations

import logging
import os
import subprocess
import threading

logger = logging.getLogger(__name__)


def _s3_sync(src: str, dst: str, what: str) -> bool:
    """One awscli sync in either direction (push and pull share one body so
    fixes — e.g. raising the timeout for the ~14 MB/s relay — apply once)."""
    try:
        result = subprocess.run(
            ["aws", "s3", "sync", src, dst, "--exact-timestamps"],
            capture_output=True, timeout=3600,
        )
    except (FileNotFoundError, subprocess.TimeoutExpired) as e:
        logger.error("error %s s3: %s", what, e)
        return False
    if result.returncode != 0:
        logger.error("error: %s", result.stderr.decode()[:500])
        return False
    return True


def remote_sync_s3(local_dir: str, remote_dir: str) -> bool:
    return _s3_sync(local_dir, remote_dir, "syncing to")


def remote_sync_pull(remote_dir: str, local_dir: str) -> bool:
    """Fetch one remote checkpoint dir to local (resume-latest with
    --remote-sync: orbax restores from local paths only)."""
    return _s3_sync(remote_dir, local_dir, "fetching from")


def remote_sync_fsspec(local_dir: str, remote_dir: str) -> bool:
    try:
        import fsspec
    except ImportError:
        logger.error("fsspec not available")
        return False
    try:
        fs, remote_root = fsspec.core.url_to_fs(remote_dir)
        for root, _, files in os.walk(local_dir):
            for fname in files:
                src = os.path.join(root, fname)
                rel = os.path.relpath(src, local_dir)
                dst = os.path.join(remote_root, rel)
                fs.makedirs(os.path.dirname(dst), exist_ok=True)
                fs.put(src, dst)
        return True
    except Exception as e:
        logger.error("error syncing via fsspec: %s", e)
        return False


def remote_sync(local_dir: str, remote_dir: str, protocol: str = "s3") -> bool:
    """One-shot sync (reference main.py:176-189 usage)."""
    logger.info("Starting remote sync: %s -> %s", local_dir, remote_dir)
    if protocol == "s3":
        return remote_sync_s3(local_dir, remote_dir)
    return remote_sync_fsspec(local_dir, remote_dir)


def start_sync_process(
    sync_every: int, local_dir: str, remote_dir: str, protocol: str = "s3"
) -> threading.Thread:
    """Periodic background sync (reference main.py:190-196). Returns a daemon
    thread with a ``.stop()``-style Event attached as ``.stop_event``."""
    stop_event = threading.Event()

    def loop():
        while not stop_event.wait(sync_every):
            remote_sync(local_dir, remote_dir, protocol)

    t = threading.Thread(target=loop, daemon=True, name="remote-sync")
    t.stop_event = stop_event  # type: ignore[attr-defined]
    t.start()
    return t
