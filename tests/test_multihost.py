"""True multi-PROCESS training: 2 jax processes x 4 virtual CPU devices.

Everything else in the suite simulates multi-host on ONE process with 8
virtual devices; these tests run the actual multi-host machinery — the
``jax.distributed.initialize`` rendezvous (reference main.py:90 torchrun
analog, SURVEY §2.3 distributed-backend row), gloo collectives BETWEEN
processes, rank-0 checkpoint-discovery broadcast (reference main.py:150-170),
per-host data sharding via ``make_array_from_process_local_data``, and
master-only checkpoint/metrics writes — end to end through ``main()``.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from colxlip_tpu.data.synthetic import SyntheticConfig, SyntheticDataset

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_synthetic_rank_sharding():
    """Hosts must see disjoint slices of one seed-deterministic global
    stream (the wds split_by_node analog) — not identical copies — and the
    epoch length must count GLOBAL samples."""
    single = SyntheticDataset(SyntheticConfig(
        batch_size=8, image_size=(16, 16), context_length=16,
        num_samples=32, seed=3))
    r0 = SyntheticDataset(SyntheticConfig(
        batch_size=4, image_size=(16, 16), context_length=16,
        num_samples=32, seed=3, rank=0, world_size=2))
    r1 = SyntheticDataset(SyntheticConfig(
        batch_size=4, image_size=(16, 16), context_length=16,
        num_samples=32, seed=3, rank=1, world_size=2))
    assert len(single) == len(r0) == len(r1) == 4
    for (i_s, t_s), (i_0, t_0), (i_1, t_1) in zip(single, r0, r1):
        np.testing.assert_array_equal(np.concatenate([i_0, i_1]), i_s)
        np.testing.assert_array_equal(np.concatenate([t_0, t_1]), t_s)

    with pytest.raises(ValueError):
        SyntheticDataset(SyntheticConfig(rank=2, world_size=2))


@pytest.mark.slow
def test_two_process_driver_matches_single_process(tmp_path):
    """2 processes x 4 devices trains the same trajectory as 1 process x 8
    devices (same global batch, same synthetic global stream), with
    master-only writes and a working cross-process rendezvous."""
    port = _free_port()
    logs = str(tmp_path / "mh")
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in [REPO, env.get("PYTHONPATH", "")] if p)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), "2", str(port), logs],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    assert all(p.returncode == 0 for p in procs), (
        f"rc={[p.returncode for p in procs]}\n--- proc0 ---\n{outs[0][-4000:]}"
        f"\n--- proc1 ---\n{outs[1][-4000:] if len(outs) > 1 else ''}")

    run_dir = os.path.join(logs, "mh")
    mh = [json.loads(l)["total_loss"]
          for l in open(os.path.join(run_dir, "metrics.jsonl"))]
    # 64 samples / 16 global batch = 4 steps/epoch x 2 epochs — the old
    # per-host epoch sizing would have logged 16
    assert len(mh) == 8, mh
    assert np.isfinite(mh).all()
    # master-only checkpointing: both epochs saved exactly once
    ckpts = sorted(os.listdir(os.path.join(run_dir, "checkpoints")))
    assert "epoch_1" in ckpts and "epoch_2" in ckpts, ckpts

    # single-process 8-device reference run (in-process: the suite's own
    # virtual mesh), identical flags minus the dist rendezvous
    from colxlip_tpu.main import main

    sp_logs = str(tmp_path / "sp")
    assert main([
        "--model", "ViT-S-16-test", "--dataset-type", "synthetic",
        "--train-num-samples", "64", "--batch-size", "2",
        "--epochs", "2", "--lr", "1e-3", "--warmup", "2",
        "--precision", "fp32", "--logs", sp_logs, "--name", "sp",
        "--workers", "0", "--log-every-n-steps", "1",
        "--save-frequency", "0", "--maxsim-impl", "xla",
        "--seed", "0", "--report-to", "jsonl",
    ]) == 0
    sp = [json.loads(l)["total_loss"]
          for l in open(os.path.join(sp_logs, "sp", "metrics.jsonl"))]
    assert len(sp) == 8
    # same data, same mesh size; only the collective transport differs
    np.testing.assert_allclose(mh, sp, rtol=5e-4)


def _launch_pair(logs, env, epochs, extra):
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), "2", str(port), logs,
             str(epochs)] + extra,
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    assert all(p.returncode == 0 for p in procs), (
        f"rc={[p.returncode for p in procs]}\n--- proc0 ---\n{outs[0][-4000:]}"
        f"\n--- proc1 ---\n{outs[1][-4000:] if len(outs) > 1 else ''}")
    return outs


def _fake_coco(root_dir: str) -> str:
    """Tiny on-disk COCO-layout suite (4 images x 2 captions)."""
    import json as _json

    from PIL import Image

    root = os.path.join(root_dir, "coco")
    os.makedirs(os.path.join(root, "annotations"), exist_ok=True)
    os.makedirs(os.path.join(root, "images", "val2017"), exist_ok=True)
    rng = np.random.default_rng(0)
    images, annotations = [], []
    for i in range(4):
        fname = f"{i:012d}.jpg"
        arr = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(
            os.path.join(root, "images", "val2017", fname))
        images.append({"id": 100 + i, "file_name": fname})
        for j in range(2):
            annotations.append({"image_id": 100 + i,
                                "caption": f"photo number {i} variant {j}"})
    with open(os.path.join(root, "annotations",
                           "captions_val2017.json"), "w") as f:
        _json.dump({"images": images, "annotations": annotations}, f)
    return root


@pytest.mark.slow
def test_two_process_fsdp_sharded_checkpoint_resume(tmp_path):
    """ZeRO-3 state sharded ACROSS processes: param/moment shards live on
    different hosts, so saves go through the distributed orbax path (every
    process writes only its own shard bytes — no host ever holds the full
    state, which the torch reference cannot express at all) and resume
    restores straight into the sharded layout. Trajectory must match the
    single-process FSDP run. A retrieval suite is configured so the
    epoch-end eval exercises the process_allgather gather of the sharded
    params (a collective all processes must enter; the master evaluates)."""
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in [REPO, env.get("PYTHONPATH", "")] if p)
    logs = str(tmp_path / "mh")
    coco = _fake_coco(str(tmp_path))
    # const schedule: round 1 trains --epochs 2, the resume round --epochs 3
    # — under the default cosine schedule total_steps would differ between
    # rounds (a property of cosine resume the reference shares, not a bug),
    # so trajectory parity needs a total-steps-independent LR
    extra = ["--fsdp", "--gather-with-grad", "--lr-scheduler", "const",
             "--retrieval-coco", "--coco-data-root-dir", coco,
             "--val-frequency", "1"]

    # round 1: 2 epochs, distributed sharded saves
    _launch_pair(logs, env, 2, extra)
    run_dir = os.path.join(logs, "mh")
    ckpts = sorted(os.listdir(os.path.join(run_dir, "checkpoints")))
    assert "epoch_1" in ckpts and "epoch_2" in ckpts, ckpts

    # round 2: +1 epoch, resumes from the SHARDED epoch_2 checkpoint
    outs = _launch_pair(logs, env, 3, extra)
    assert any("resumed sharded checkpoint" in o for o in outs), outs[0][-2000:]
    mh = [json.loads(l)["total_loss"]
          for l in open(os.path.join(run_dir, "metrics.jsonl"))]
    assert len(mh) == 12  # 8 appended by round 1 + 4 by the resumed epoch
    assert np.isfinite(mh).all()
    # the sharded-params eval ran each epoch: master-only results.jsonl with
    # retrieval metrics computed from the process_allgathered params
    results = [json.loads(l) for l in
               open(os.path.join(run_dir, "checkpoints", "results.jsonl"))]
    assert [r["epoch"] for r in results] == [1, 2, 3]
    assert all("coco_text_to_image_R@1" in r for r in results)

    # single-process FSDP reference: same flags, one uninterrupted run
    from colxlip_tpu.main import main

    sp_logs = str(tmp_path / "sp")
    assert main([
        "--model", "ViT-S-16-test", "--dataset-type", "synthetic",
        "--train-num-samples", "64", "--batch-size", "2",
        "--epochs", "3", "--lr", "1e-3", "--warmup", "2",
        "--precision", "fp32", "--logs", sp_logs, "--name", "sp",
        "--workers", "0", "--log-every-n-steps", "1",
        "--save-frequency", "0", "--maxsim-impl", "xla",
        "--seed", "0", "--report-to", "jsonl",
        "--fsdp", "--gather-with-grad", "--lr-scheduler", "const",
    ]) == 0
    sp = [json.loads(l)["total_loss"]
          for l in open(os.path.join(sp_logs, "sp", "metrics.jsonl"))]
    assert len(sp) == 12
    np.testing.assert_allclose(mh, sp, rtol=5e-4)


def _tiny_wds_shards(root_dir: str, n_shards: int = 2, per: int = 16) -> str:
    """Tar shards of 64x64-croppable JPEGs with the reference caption
    layout, for multi-process wds-feed runs."""
    import io
    import tarfile

    from PIL import Image

    root = os.path.join(root_dir, "wds")
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(0)
    sizes = {}
    for shard in range(n_shards):
        path = os.path.join(root, f"shard-{shard:04d}.tar")
        with tarfile.open(path, "w") as tf:
            for i in range(per):
                key = f"{shard:04d}{i:05d}"
                img = Image.fromarray(
                    (rng.random((72, 80, 3)) * 255).astype(np.uint8))
                buf = io.BytesIO()
                img.save(buf, format="JPEG")
                data = buf.getvalue()
                info = tarfile.TarInfo(f"{key}.jpg")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
                meta = json.dumps(
                    {"raw_caption": [f"caption {key}"]}).encode()
                info = tarfile.TarInfo(f"{key}.json")
                info.size = len(meta)
                tf.addfile(info, io.BytesIO(meta))
        sizes[f"shard-{shard:04d}.tar"] = per
    with open(os.path.join(root, "sizes.json"), "w") as f:
        json.dump(sizes, f)
    return root


@pytest.mark.slow
def test_two_process_token_ring_neighborhood(tmp_path):
    """The pod recipes' token loss (--local-loss --token-dist ring
    --token-neighborhood) with the ppermute ring crossing a REAL process
    boundary — the exact collective pattern scripts/train_*_v5e64.sh run on
    64 chips (reference ring analog: src/colxlip/loss.py:382-467). The
    2-process x 4-device trajectory must match the 1-process x 8-device run
    (same global mesh, same data; only the collective transport differs)."""
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in [REPO, env.get("PYTHONPATH", "")] if p)
    logs = str(tmp_path / "mh")
    extra = ["--local-loss", "--token-dist", "ring",
             "--token-neighborhood", "2", "--gather-with-grad"]
    _launch_pair(logs, env, 1, extra)
    run_dir = os.path.join(logs, "mh")
    mh = [json.loads(l)["total_loss"]
          for l in open(os.path.join(run_dir, "metrics.jsonl"))]
    assert len(mh) == 4, mh
    assert np.isfinite(mh).all()

    from colxlip_tpu.main import main

    sp_logs = str(tmp_path / "sp")
    assert main([
        "--model", "ViT-S-16-test", "--dataset-type", "synthetic",
        "--train-num-samples", "64", "--batch-size", "2",
        "--epochs", "1", "--lr", "1e-3", "--warmup", "2",
        "--precision", "fp32", "--logs", sp_logs, "--name", "sp",
        "--workers", "0", "--log-every-n-steps", "1",
        "--save-frequency", "0", "--maxsim-impl", "xla",
        "--seed", "0", "--report-to", "jsonl",
    ] + extra) == 0
    sp = [json.loads(l)["total_loss"]
          for l in open(os.path.join(sp_logs, "sp", "metrics.jsonl"))]
    assert len(sp) == 4
    np.testing.assert_allclose(mh, sp, rtol=5e-4)


@pytest.mark.slow
def test_two_process_siglip_bidir(tmp_path):
    """SigLIP's bidirectional neighbor exchange (reference loss.py:524-560)
    over ppermute ACROSS a process boundary, with trajectory parity vs the
    1-process 8-device mesh."""
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in [REPO, env.get("PYTHONPATH", "")] if p)
    logs = str(tmp_path / "mh")
    extra = ["--siglip", "--dist-impl", "bidir"]
    _launch_pair(logs, env, 1, extra)
    run_dir = os.path.join(logs, "mh")
    mh = [json.loads(l)["total_loss"]
          for l in open(os.path.join(run_dir, "metrics.jsonl"))]
    assert len(mh) == 4, mh
    assert np.isfinite(mh).all()

    from colxlip_tpu.main import main

    sp_logs = str(tmp_path / "sp")
    assert main([
        "--model", "ViT-S-16-test", "--dataset-type", "synthetic",
        "--train-num-samples", "64", "--batch-size", "2",
        "--epochs", "1", "--lr", "1e-3", "--warmup", "2",
        "--precision", "fp32", "--logs", sp_logs, "--name", "sp",
        "--workers", "0", "--log-every-n-steps", "1",
        "--save-frequency", "0", "--maxsim-impl", "xla",
        "--seed", "0", "--report-to", "jsonl",
    ] + extra) == 0
    sp = [json.loads(l)["total_loss"]
          for l in open(os.path.join(sp_logs, "sp", "metrics.jsonl"))]
    assert len(sp) == 4
    np.testing.assert_allclose(mh, sp, rtol=5e-4)


@pytest.mark.slow
def test_two_process_yuv420_packed_feed(tmp_path):
    """The pod recipes' default feed (--ship-format yuv420 --packed-feed)
    through the REAL multi-process path: each host's wds pipeline emits a
    planar-YUV packed [B_local, bytes] buffer and
    make_array_from_process_local_data assembles the global batch. Guards
    the exact configuration scripts/train_*_v5e64.sh ship."""
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in [REPO, env.get("PYTHONPATH", "")] if p)
    logs = str(tmp_path / "mh")
    shards = _tiny_wds_shards(str(tmp_path))
    urls = os.path.join(shards, "shard-{0000..0001}.tar")
    extra = [
        "--dataset-type", "webdataset",
        "--train-data", urls,
        "--train-num-samples", "32",
        "--ship-format", "yuv420",
        "--packed-feed",
        "--workers", "1",
    ]
    _launch_pair(logs, env, 1, extra)
    run_dir = os.path.join(logs, "mh")
    mh = [json.loads(l)["total_loss"]
          for l in open(os.path.join(run_dir, "metrics.jsonl"))]
    # 32 samples / 16 global batch = 2 steps
    assert len(mh) == 2, mh
    assert np.isfinite(mh).all()
    assert "epoch_1" in os.listdir(os.path.join(run_dir, "checkpoints"))
