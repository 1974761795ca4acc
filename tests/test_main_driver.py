"""End-to-end driver test: synthetic training -> checkpoint -> resume -> eval."""
import json
import os

import numpy as np
import pytest

from colxlip_tpu.main import main


@pytest.mark.slow
def test_main_synthetic_train_checkpoint_resume(tmp_path):
    logs = str(tmp_path / "logs")
    argv = [
        "--model", "ViT-S-16-test",
        "--dataset-type", "synthetic",
        "--train-num-samples", "64",
        "--batch-size", "2",       # per device; 8 CPU devices -> global 16
        "--epochs", "2",
        "--lr", "1e-3",
        "--warmup", "2",
        "--precision", "fp32",
        "--logs", logs,
        "--name", "synthtest",
        "--workers", "0",
        "--log-every-n-steps", "1",
        "--save-frequency", "1",
        "--maxsim-impl", "xla",
        "--seed", "0",
    ]
    assert main(argv) == 0
    ckpt_dir = os.path.join(logs, "synthtest", "checkpoints")
    assert os.path.isdir(os.path.join(ckpt_dir, "epoch_1"))
    assert os.path.isdir(os.path.join(ckpt_dir, "epoch_2"))
    assert os.path.exists(os.path.join(logs, "synthtest", "params.txt"))
    assert os.path.exists(os.path.join(logs, "synthtest", "out.log"))
    metrics_path = os.path.join(logs, "synthtest", "metrics.jsonl")
    assert os.path.exists(metrics_path)
    records = [json.loads(l) for l in open(metrics_path)]
    assert all(np.isfinite(r["total_loss"]) for r in records)

    # resume latest: runs remaining epochs without error (epochs=3 -> 1 more)
    argv_resume = argv.copy()
    argv_resume[argv.index("--epochs") + 1] = "3"
    argv_resume += ["--resume", "latest"]
    assert main(argv_resume) == 0
    assert os.path.isdir(os.path.join(ckpt_dir, "epoch_3"))


@pytest.mark.slow
def test_main_coca_synthetic_train(tmp_path):
    """CoCa is trainable from the CLI: 'coca' in the model name selects the
    CoCa model + contrastive/caption loss (reference factory.py:424-435)."""
    logs = str(tmp_path / "logs")
    argv = [
        "--model", "coca-S-test",
        "--dataset-type", "synthetic",
        "--train-num-samples", "32",
        "--batch-size", "2",
        "--epochs", "1",
        "--lr", "1e-3",
        "--warmup", "2",
        "--precision", "fp32",
        "--logs", logs,
        "--name", "cocatest",
        "--workers", "0",
        "--log-every-n-steps", "1",
        "--save-frequency", "1",
        "--coca-caption-loss-weight", "1.5",
        "--seed", "0",
    ]
    assert main(argv) == 0
    metrics_path = os.path.join(logs, "cocatest", "metrics.jsonl")
    records = [json.loads(l) for l in open(metrics_path)]
    assert records, "no metrics logged"
    assert all(np.isfinite(r["total_loss"]) for r in records)
    assert all(np.isfinite(r["caption_loss"]) for r in records)
    assert all(np.isfinite(r["contrastive_loss"]) for r in records)


@pytest.mark.slow
def test_main_model_parallel(tmp_path):
    """--model-parallel is wired to the GSPMD step (VERDICT r2 #1): a tp=2 x
    dp=4 run must (a) train the SAME global batch as the dp-only run (the old
    wiring inflated per-device batch by mp), and (b) produce the same loss
    trajectory as the dp run with full-gather grad semantics."""
    def run(name, batch_size, extra):
        logs = str(tmp_path / name)
        argv = [
            "--model", "ViT-S-16-test",
            "--dataset-type", "synthetic",
            "--train-num-samples", "64",
            "--batch-size", str(batch_size),
            "--epochs", "1",
            "--lr", "1e-3",
            "--warmup", "2",
            "--precision", "fp32",
            "--logs", logs,
            "--name", name,
            "--workers", "0",
            "--log-every-n-steps", "1",
            "--save-frequency", "0",
            "--maxsim-impl", "xla",
            "--seed", "0",
            "--report-to", "jsonl",
        ] + extra
        assert main(argv) == 0
        metrics = [json.loads(l) for l in
                   open(os.path.join(logs, name, "metrics.jsonl"))]
        return [m["total_loss"] for m in metrics]

    # dp-only: 8 devices x batch 2 = global 16, full-gather grad semantics
    dp = run("dp", 2, ["--gather-with-grad"])
    # tp=2 x dp=4: batch 4 x 4 data shards = the SAME global 16
    mp = run("mp", 4, ["--model-parallel", "2", "--gather-with-grad"])
    assert len(dp) == len(mp) == 4  # 64 samples / 16 global batch
    np.testing.assert_allclose(dp[0], mp[0], rtol=1e-4)
    np.testing.assert_allclose(dp, mp, rtol=5e-3)
    assert np.isfinite(mp).all()


def test_main_model_parallel_rejects_unshardable(tmp_path):
    """Configs the GSPMD step can't express hard-error instead of silently
    running different semantics."""
    argv = [
        "--model", "ViT-S-16-test",
        "--dataset-type", "synthetic",
        "--train-num-samples", "16",
        "--batch-size", "2",
        "--epochs", "1",
        "--precision", "fp32",
        "--logs", str(tmp_path),
        "--name", "mpbad",
        "--workers", "0",
        "--model-parallel", "2",
        "--local-loss",
    ]
    assert main(argv) == 1
    # default stop-grad gather is inexpressible under GSPMD: must refuse
    assert main(argv[:-1]) == 1
    argv[argv.index("--model-parallel") + 1] = "3"  # does not divide 8
    assert main(argv[:-1]) == 1


@pytest.mark.slow
def test_main_fsdp(tmp_path):
    """--fsdp trains through the GSPMD step with ZeRO-3 state sharding; a
    pure memory-layout change, so the loss trajectory must match dp."""
    def run(name, extra):
        logs = str(tmp_path / name)
        argv = [
            "--model", "ViT-S-16-test",
            "--dataset-type", "synthetic",
            "--train-num-samples", "64",
            "--batch-size", "2",
            "--epochs", "1",
            "--lr", "1e-3",
            "--warmup", "2",
            "--precision", "fp32",
            "--logs", logs,
            "--name", name,
            "--workers", "0",
            "--log-every-n-steps", "1",
            "--save-frequency", "0",
            "--maxsim-impl", "xla",
            "--seed", "0",
            "--report-to", "jsonl",
            "--gather-with-grad",
        ] + extra
        assert main(argv) == 0
        return [json.loads(l)["total_loss"] for l in
                open(os.path.join(logs, name, "metrics.jsonl"))]

    dp = run("dp", [])
    fs = run("fs", ["--fsdp"])
    assert len(dp) == len(fs) == 4
    np.testing.assert_allclose(dp, fs, rtol=5e-3)
    assert np.isfinite(fs).all()


def test_main_fsdp_rejects_single_device(tmp_path, monkeypatch):
    """--fsdp on a 1-wide data axis has nothing to shard: refuse loudly."""
    import colxlip_tpu.main as main_mod
    monkeypatch.setattr(main_mod.jax, "device_count", lambda: 1)
    monkeypatch.setattr(main_mod.jax, "local_device_count", lambda: 1)
    argv = [
        "--model", "ViT-S-16-test",
        "--dataset-type", "synthetic",
        "--train-num-samples", "16",
        "--batch-size", "2",
        "--epochs", "1",
        "--precision", "fp32",
        "--logs", str(tmp_path),
        "--name", "fsdpbad",
        "--workers", "0",
        "--fsdp",
    ]
    assert main(argv) == 1


def test_get_latest_checkpoint_resolution(tmp_path):
    """Crash-mid-epoch resolution (VERDICT weak #8): a stale epoch_latest
    (older mtime than the newest numbered save) must NOT win resume-latest;
    a current epoch_latest (rewritten after the numbered save) must."""
    import time
    from colxlip_tpu.training.checkpoint import get_latest_checkpoint

    d = tmp_path / "ckpts"
    d.mkdir()
    assert get_latest_checkpoint(str(d)) is None

    (d / "epoch_1").mkdir()
    (d / "epoch_2").mkdir()
    (d / "epoch_10").mkdir()
    # natural sort: epoch_10 beats epoch_2
    assert get_latest_checkpoint(str(d)).endswith("epoch_10")

    # stale latest: epoch_latest written during epoch 9, crash before the
    # epoch-10 replace -> its mtime predates epoch_10's save
    latest = d / "epoch_latest"
    latest.mkdir()
    old = time.time() - 3600
    os.utime(latest, (old, old))
    assert get_latest_checkpoint(str(d)).endswith("epoch_10")

    # current latest: rewritten after the numbered save (normal epoch end)
    now = time.time() + 60
    os.utime(latest, (now, now))
    assert get_latest_checkpoint(str(d)).endswith("epoch_latest")

    # in-flight tmp/old dirs from a crashed atomic replace are ignored
    (d / "epoch_latest.tmp").mkdir()
    (d / "epoch_latest.old").mkdir()
    assert get_latest_checkpoint(str(d)).endswith("epoch_latest")


def test_get_latest_checkpoint_skips_orbax_tmp(tmp_path):
    """A crash mid-orbax-save leaves an in-progress dir; resume must never
    select it. Orbax 0.11 names these epoch_N.orbax-checkpoint-tmp-<timestamp>
    (TMP_DIR_SUFFIX + timestamp) — a suffix blacklist on '-tmp' missed the
    timestamped form, so selection is positive-match only."""
    from colxlip_tpu.training.checkpoint import get_latest_checkpoint

    d = tmp_path / "ckpts"
    d.mkdir()
    (d / "epoch_1").mkdir()
    (d / "epoch_2.orbax-checkpoint-tmp").mkdir()
    (d / "epoch_3.orbax-checkpoint-tmp-1234567890").mkdir()
    (d / "epoch_4suffix").mkdir()
    assert get_latest_checkpoint(str(d)).endswith("epoch_1")


def test_async_checkpoint_save_roundtrip(tmp_path):
    """save_checkpoint_async: snapshot-copy semantics + background write;
    the restored state equals the state AT SNAPSHOT TIME even if the live
    arrays are mutated (donated) immediately after the call returns."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from colxlip_tpu.training.checkpoint import (
        load_native_checkpoint,
        save_checkpoint_async,
        wait_for_saves,
    )

    state = {"params": {"w": jnp.arange(8, dtype=jnp.float32)},
             "step": jnp.asarray(3)}
    save_checkpoint_async(str(tmp_path / "ck"), state, epoch=1, name="t")
    # mutate the live reference right away (stand-in for donation)
    state["params"]["w"] = state["params"]["w"] * 0 - 1.0
    wait_for_saves()
    payload = load_native_checkpoint(str(tmp_path / "ck" / "epoch_1"))
    np.testing.assert_array_equal(
        np.asarray(payload["state"]["params"]["w"]),
        np.arange(8, dtype=np.float32))
    assert payload["epoch"] == 1

    # second async save waits for the first and honors rotation
    state2 = {"params": {"w": jnp.ones(8)}, "step": jnp.asarray(4)}
    save_checkpoint_async(str(tmp_path / "ck"), state2, epoch=2, name="t",
                          rotate_keep_epoch=2)
    wait_for_saves()
    assert not (tmp_path / "ck" / "epoch_1").exists()
    assert (tmp_path / "ck" / "epoch_2").exists()


def test_async_checkpoint_failure_surfaces(tmp_path, monkeypatch):
    """A failed background save (disk full, serialization error) must raise
    from wait_for_saves(), not let the run exit 0 with no checkpoint."""
    import jax.numpy as jnp
    from colxlip_tpu.training import checkpoint as ck

    def boom(*a, **k):
        raise OSError("disk full")

    monkeypatch.setattr(ck, "save_checkpoint", boom)
    ck.save_checkpoint_async(str(tmp_path / "ck"),
                             {"params": {"w": jnp.zeros(2)}}, epoch=1)
    with pytest.raises(RuntimeError, match="async checkpoint save failed"):
        ck.wait_for_saves()
    # the error is consumed: a later wait is clean
    ck.wait_for_saves()


@pytest.mark.slow
def test_main_async_checkpoint_e2e(tmp_path):
    """Driver run with --async-checkpoint: saves land (after the implicit
    wait at exit), rotation respects the in-flight save, resume works."""
    logs = str(tmp_path / "logs")
    argv = [
        "--model", "ViT-S-16-test",
        "--dataset-type", "synthetic",
        "--train-num-samples", "32",
        "--batch-size", "2",
        "--epochs", "2",
        "--lr", "1e-3",
        "--warmup", "2",
        "--precision", "fp32",
        "--logs", logs,
        "--name", "asyncsave",
        "--workers", "0",
        "--log-every-n-steps", "1",
        "--save-frequency", "1",
        "--delete-previous-checkpoint",
        "--async-checkpoint",
        "--maxsim-impl", "xla",
        "--seed", "0",
    ]
    assert main(argv) == 0
    ckpt_dir = os.path.join(logs, "asyncsave", "checkpoints")
    assert not os.path.isdir(os.path.join(ckpt_dir, "epoch_1"))  # rotated
    assert os.path.isdir(os.path.join(ckpt_dir, "epoch_2"))
    argv_resume = argv.copy()
    argv_resume[argv.index("--epochs") + 1] = "3"
    argv_resume += ["--resume", "latest"]
    assert main(argv_resume) == 0
    assert os.path.isdir(os.path.join(ckpt_dir, "epoch_3"))


def test_rotate_checkpoints_save_frequency_gt_1(tmp_path):
    """Rotation removes ALL older numbered checkpoints — with
    --save-frequency 2 the reference's epoch-minus-1 deletion never fires
    (main.py:431-434); ours must still rotate."""
    from colxlip_tpu.training.checkpoint import rotate_checkpoints

    d = tmp_path / "ck"
    d.mkdir()
    for e in (2, 4, 6):
        (d / f"epoch_{e}").mkdir()
    (d / "epoch_latest").mkdir()
    rotate_checkpoints(str(d), 6)
    left = sorted(p.name for p in d.iterdir())
    assert left == ["epoch_6", "epoch_latest"]


def test_get_latest_checkpoint_remote_parses_s3_ls(tmp_path, monkeypatch):
    """Remote resume-latest discovery parses `aws s3 ls` dir entries and
    natural-sorts (reference main.py:142-162 remote branch)."""
    import subprocess
    from colxlip_tpu.training import checkpoint as ck

    listing = (
        "                           PRE epoch_2/\n"
        "                           PRE epoch_10/\n"
        "                           PRE epoch_10.orbax-checkpoint-tmp/\n"
        "2026-01-01 00:00:00        123 stray_file\n"
    )

    def fake_run(cmd, **kw):
        assert cmd[:3] == ["aws", "s3", "ls"]
        return subprocess.CompletedProcess(cmd, 0, stdout=listing, stderr="")

    monkeypatch.setattr(subprocess, "run", fake_run)
    got = ck.get_latest_checkpoint_remote("s3://bucket/run/checkpoints")
    assert got == "s3://bucket/run/checkpoints/epoch_10"

    def failing_run(cmd, **kw):
        raise FileNotFoundError("aws not installed")

    monkeypatch.setattr(subprocess, "run", failing_run)
    assert ck.get_latest_checkpoint_remote("s3://bucket/x") is None
