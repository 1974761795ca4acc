"""Checkpointing: orbax-native save/rotate/resume + PyTorch ``.pt`` import.

Counterparts:
  - save/rotate/resume-latest: reference src/main.py:54-67,138-170,413-441
    (epoch-granularity saves, ``--delete-previous-checkpoint`` rotation,
    natural-sort latest discovery, atomic most-recent replace).
  - ``.pt`` import: reference factory.py:144-201 ``load_checkpoint`` — maps
    OpenCLIP/ColXLIP torch state dicts (incl. ``module.`` prefixes, packed
    QKV ``in_proj_weight``, bare-``Parameter`` projections, Sequential token
    heads) onto this framework's flax param tree, with position-embedding
    interpolation on image-size mismatch (reference model.py:355-418).
"""
from __future__ import annotations

import logging
import os
import re
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# native orbax checkpoints
# ---------------------------------------------------------------------------

def _checkpointer():
    import orbax.checkpoint as ocp

    if jax.process_count() > 1:
        # The payload is pure host-local numpy (`_to_pure_dict` device_gets
        # the replicated state), so save/restore is local IO — but orbax
        # barriers over ALL jax processes by default, and the driver saves
        # on the master only (reference main.py:413-441 semantics): the
        # master would block in sync_global_processes forever while the
        # workers sit in the next train step's collective (deadlock caught
        # by tests/test_multihost.py). Scope every barrier to this process.
        me = jax.process_index()
        return ocp.Checkpointer(
            ocp.PyTreeCheckpointHandler(),
            multiprocessing_options=ocp.options.MultiprocessingOptions(
                primary_host=me,
                active_processes={me},
                barrier_sync_key_prefix=f"host{me}",
            ),
        )
    return ocp.PyTreeCheckpointer()


_SAVE_THREAD = None
_SAVE_ERROR: Optional[BaseException] = None
_ASYNC_SHARDED = None  # lazily-built orbax AsyncCheckpointer (sharded saves)
_PENDING_ROTATE: Optional[Tuple[str, int]] = None


def _async_sharded_checkpointer():
    global _ASYNC_SHARDED
    if _ASYNC_SHARDED is None:
        import orbax.checkpoint as ocp

        _ASYNC_SHARDED = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _ASYNC_SHARDED


def wait_for_saves() -> None:
    """Block until any in-flight async checkpoint save has finished.

    Re-raises a failure from the background writer: a swallowed save error
    (disk full, serialization bug) would otherwise let training exit 0 with
    no checkpoint on disk — the synchronous path crashes loudly, so must we.
    Also finalizes background SHARDED saves and runs the rotation that was
    deferred until the save superseding the old checkpoints is durable.
    """
    global _SAVE_THREAD, _SAVE_ERROR, _PENDING_ROTATE
    if _SAVE_THREAD is not None:
        _SAVE_THREAD.join()
        _SAVE_THREAD = None
    if _SAVE_ERROR is not None:
        err, _SAVE_ERROR = _SAVE_ERROR, None
        raise RuntimeError("async checkpoint save failed") from err
    if _ASYNC_SHARDED is not None:
        _ASYNC_SHARDED.wait_until_finished()  # raises on a failed write
        if _PENDING_ROTATE is not None:
            d, keep = _PENDING_ROTATE
            _PENDING_ROTATE = None
            rotate_checkpoints(d, keep)


def save_checkpoint_async(
    checkpoint_dir: str,
    state,
    *,
    epoch: int,
    name: str = "",
    most_recent: bool = False,
    also_most_recent: bool = False,
    rotate_keep_epoch: Optional[int] = None,
) -> None:
    """Checkpoint without stalling training (reference saves synchronously
    with torch.save, train stops for the whole write).

    Snapshot strategy (the live state's buffers are donated to the next
    step, so a background read of them would race with donation): default
    is a BLOCKING ``device_get`` snapshot, then the orbax serialize + write
    + rotation run in a daemon thread — on production storage (GCS/NFS) the
    write is the dominant cost and is fully hidden. Setting
    $COLXLIP_ASYNC_SNAPSHOT_HBM to a byte budget enables an ON-DEVICE copy
    snapshot for states under the budget, which also hides the
    device->host transfer — measured on a v5e 16 GB chip this OOMs both
    ViT-B batch-256 (1.8 GB state) and ViT-L (5 GB): the training step
    already sits at the XLA memory-plan cliff, so it is opt-in for setups
    with real HBM headroom only.

    One save in flight at a time; ``wait_for_saves()`` joins it (called
    before the next save, remote sync, and process exit).

    also_most_recent: additionally write ``epoch_latest`` from the SAME
    snapshot (one device->host transfer serves both saves — calling twice
    would snapshot and transfer twice).

    rotate_keep_epoch: run ``rotate_checkpoints`` after the save completes
    (rotation must not delete dirs while the save that supersedes them is
    still in flight).
    """
    import threading

    global _SAVE_THREAD
    wait_for_saves()
    budget = int(os.environ.get("COLXLIP_ASYNC_SNAPSHOT_HBM", 0))
    state_bytes = sum(
        x.size * x.dtype.itemsize for x in jax.tree.leaves(state)
        if isinstance(x, jax.Array))
    if state_bytes <= budget:
        snap = jax.tree.map(
            lambda x: jnp.copy(x) if isinstance(x, jax.Array) else x, state)
    else:
        snap = jax.device_get(state)

    def _run():
        global _SAVE_ERROR
        try:
            save_checkpoint(checkpoint_dir, snap, epoch=epoch, name=name,
                            most_recent=most_recent)
            if also_most_recent and not most_recent:
                save_checkpoint(checkpoint_dir, snap, epoch=epoch, name=name,
                                most_recent=True)
            if rotate_keep_epoch is not None:
                rotate_checkpoints(checkpoint_dir, rotate_keep_epoch)
        except Exception as e:  # noqa: BLE001 — recorded, re-raised in wait_for_saves
            logger.exception("async checkpoint save failed (epoch %d)", epoch)
            _SAVE_ERROR = e

    t = threading.Thread(target=_run, daemon=True)
    t.start()
    _SAVE_THREAD = t


def save_checkpoint(
    checkpoint_dir: str,
    state,
    *,
    epoch: int,
    name: str = "",
    most_recent: bool = False,
    step_in_epoch: int = 0,
) -> str:
    """Write epoch_<N> (or epoch_latest) under checkpoint_dir.

    step_in_epoch > 0 marks a MID-epoch (preemption) checkpoint: ``epoch`` is
    then the *incomplete* epoch index and a ``preempt.json`` sidecar records
    how many optimizer steps of it already ran, so resume fast-forwards the
    data stream instead of replaying (or losing) the partial epoch. The
    sidecar — not a payload field — keeps old and new checkpoints mutually
    restorable (orbax restores against a fixed item template)."""
    import json

    os.makedirs(checkpoint_dir, exist_ok=True)
    tag = "epoch_latest" if most_recent else f"epoch_{epoch}"
    path = os.path.join(os.path.abspath(checkpoint_dir), tag)
    payload = {
        "epoch": epoch,
        "name": name,
        "state": _to_pure_dict(state),
    }
    ckptr = _checkpointer()
    if most_recent and os.path.exists(path):
        # atomic replace semantics (reference main.py:436-441): orbax writes
        # to tmp then renames, but target must not exist
        tmp = path + ".tmp"
        ckptr.save(tmp, payload, force=True)
        backup = path + ".old"
        import shutil

        # a crash between the two renames leaves a stale .old dir; clear it
        # or the next save's rename onto it raises ENOTEMPTY forever after
        shutil.rmtree(backup, ignore_errors=True)
        os.rename(path, backup)
        os.rename(tmp, path)
        shutil.rmtree(backup, ignore_errors=True)
    else:
        ckptr.save(path, payload, force=True)
    if step_in_epoch > 0:
        with open(os.path.join(path, "preempt.json"), "w") as f:
            json.dump({"epoch": epoch, "step_in_epoch": int(step_in_epoch)}, f)
    return path


def state_fully_addressable(state) -> bool:
    """True when every array shard lives on THIS process's devices (single
    process, or multi-process with replicated/dp state) — the host-numpy
    save/restore path handles it. False when GSPMD sharding (FSDP/ZeRO-3 or
    tensor parallelism on a multi-host mesh) spreads a param's shards across
    processes: then saves must be the distributed kind below."""
    return all(getattr(x, "is_fully_addressable", True)
               for x in jax.tree.leaves(state))


def save_checkpoint_sharded(
    checkpoint_dir: str,
    state,
    *,
    epoch: int,
    name: str = "",
    most_recent: bool = False,
    step_in_epoch: int = 0,
    background: bool = False,
    rotate_keep_epoch: Optional[int] = None,
) -> str:
    """Distributed save of CROSS-PROCESS-sharded state (FSDP/TP on a
    multi-host mesh). Every process calls this; each writes only its own
    addressable shards (orbax/TensorStore), so no host ever materializes —
    or ships over DCN — the full ZeRO-sharded state. Requires
    ``checkpoint_dir`` on a filesystem all hosts share (GCS/NFS), the same
    assumption the reference makes for resume (main.py:151-153).

    The torch reference cannot express this at all: its DDP state is
    replicated and rank 0 torch.saves the whole dict (main.py:413-422).

    background=True enqueues the write on orbax's AsyncCheckpointer: the
    call returns once the device->host shard copies are done (donation-safe
    — the next step may reuse the buffers) and the TensorStore write runs
    in the background; ``wait_for_saves()`` finalizes and surfaces errors.
    rotate_keep_epoch defers rotation until that finalize (deleting the old
    checkpoints before the superseding save is durable could lose all of
    them to a failed write). Mid-epoch (sidecar) saves are always
    synchronous: the process is about to exit.
    """
    global _PENDING_ROTATE
    import orbax.checkpoint as ocp

    os.makedirs(checkpoint_dir, exist_ok=True)
    tag = "epoch_latest" if most_recent else f"epoch_{epoch}"
    path = os.path.join(os.path.abspath(checkpoint_dir), tag)
    payload = {"epoch": epoch, "name": name, "state": state}
    # UNscoped checkpointer: all processes participate in the barriers and
    # the primary host finalizes the atomic tmp->rename (orbax handles the
    # existing-dir replace under force=True with its own coordination).
    rotate = rotate_keep_epoch is not None and jax.process_index() == 0
    if background and step_in_epoch == 0:
        ckptr = _async_sharded_checkpointer()
        ckptr.wait_until_finished()  # one save in flight at a time
        ckptr.save(path, payload, force=True)
        if rotate:
            _PENDING_ROTATE = (checkpoint_dir, rotate_keep_epoch)
        return path
    ocp.PyTreeCheckpointer().save(path, payload, force=True)
    if rotate:
        rotate_checkpoints(checkpoint_dir, rotate_keep_epoch)
    if step_in_epoch > 0 and jax.process_index() == 0:
        import json

        with open(os.path.join(path, "preempt.json"), "w") as f:
            json.dump({"epoch": epoch, "step_in_epoch": int(step_in_epoch)}, f)
    return path


def restore_sharded_checkpoint(path: str, template: Dict):
    """Restore INTO the template's sharded layout: each leaf of
    ``template["state"]`` is a (sharded) jax.Array whose sharding tells
    orbax which shard bytes this process reads — the restored state lands
    already ZeRO/TP-partitioned, without any host ever holding the full
    tree. Inverse of ``save_checkpoint_sharded``."""
    import orbax.checkpoint as ocp
    from orbax.checkpoint import checkpoint_utils

    payload = {"epoch": 0, "name": "", "state": template}
    restore_args = checkpoint_utils.construct_restore_args(payload)
    return ocp.PyTreeCheckpointer().restore(
        os.path.abspath(path), item=payload, restore_args=restore_args)


def read_step_in_epoch(checkpoint_path: str) -> int:
    """Steps of the checkpoint's epoch already run (0 for whole-epoch saves).

    A fresh save into the same dir replaces the whole directory (orbax tmp →
    rename), so a stale sidecar can never outlive its checkpoint."""
    import json

    sidecar = os.path.join(checkpoint_path, "preempt.json")
    try:
        with open(sidecar) as f:
            return int(json.load(f)["step_in_epoch"])
    except (OSError, ValueError, KeyError):
        return 0


def _to_pure_dict(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def load_native_checkpoint(path: str, template=None):
    """Restore a checkpoint; with ``template`` the restored tree keeps the
    template's container types (optax NamedTuple states etc.) instead of
    degrading to plain dicts."""
    ckptr = _checkpointer()
    if template is None:
        return ckptr.restore(os.path.abspath(path))
    item = {"epoch": 0, "name": "", "state": _to_pure_dict(template)}
    return ckptr.restore(os.path.abspath(path), item)


def _natural_key(s: str):
    return [int(t) if t.isdigit() else t for t in re.split(r"(\d+)", s.lower())]


def get_latest_checkpoint(checkpoint_dir: str) -> Optional[str]:
    """Newest epoch_* dir by natural sort (reference main.py:54-67)."""
    if not os.path.isdir(checkpoint_dir):
        return None
    # POSITIVE selection: only complete checkpoints are named exactly
    # epoch_<N> or epoch_latest. A suffix blacklist missed orbax 0.11's
    # timestamped in-progress names (epoch_N.orbax-checkpoint-tmp-<ts>),
    # which a crash mid-save leaves behind — resume must never pick those,
    # nor our own .tmp/.old atomic-replace leftovers.
    entries = [
        e for e in os.listdir(checkpoint_dir)
        if re.fullmatch(r"epoch_(\d+|latest)", e)
    ]
    if not entries:
        return None
    numbered = sorted(
        (e for e in entries if e != "epoch_latest"), key=_natural_key
    )
    has_latest = "epoch_latest" in entries
    if not has_latest:
        return os.path.join(checkpoint_dir, numbered[-1]) if numbered else None
    latest_path = os.path.join(checkpoint_dir, "epoch_latest")
    if not numbered:
        return latest_path
    # Both exist. epoch_latest is rewritten every epoch (--save-most-recent)
    # so it normally supersedes numbered saves — but a crash between the
    # numbered save and the atomic latest replace leaves a STALE epoch_latest
    # from the previous epoch. The save order is numbered-then-latest, so a
    # current epoch_latest is always at least as new as the newest numbered
    # dir: resolve by directory mtime, tie-breaking to epoch_latest.
    newest_numbered = os.path.join(checkpoint_dir, numbered[-1])
    try:
        if os.stat(newest_numbered).st_mtime > os.stat(latest_path).st_mtime:
            return newest_numbered
    except OSError:
        pass
    return latest_path


def get_latest_checkpoint_remote(remote_dir: str) -> Optional[str]:
    """Newest epoch_* checkpoint under an s3 prefix (reference main.py:142-162:
    with --remote-sync, resume-latest must consult the REMOTE checkpoints
    dir — the local one may be empty on a fresh host). Lists via
    ``aws s3 ls``; returns the full s3 path or None."""
    import subprocess

    try:
        proc = subprocess.run(
            ["aws", "s3", "ls", remote_dir.rstrip("/") + "/"],
            capture_output=True, text=True, timeout=120, check=True,
        )
    except (OSError, subprocess.SubprocessError) as e:
        logger.error("remote checkpoint listing failed: %s", e)
        return None
    names = []
    for line in proc.stdout.splitlines():
        # dir entries look like "                           PRE epoch_3/"
        part = line.split()[-1].rstrip("/") if line.split() else ""
        if re.fullmatch(r"epoch_\d+", part):
            names.append(part)
    if not names:
        return None
    names.sort(key=_natural_key)
    return remote_dir.rstrip("/") + "/" + names[-1]


def rotate_checkpoints(checkpoint_dir: str, current_epoch: int) -> None:
    """--delete-previous-checkpoint: remove numbered checkpoints older than
    ``current_epoch``. (The reference, main.py:431-434, deletes only the
    literal ``epoch_{N-1}.pt`` — with ``--save-frequency > 1`` that file
    never exists and nothing is ever rotated; deliberate fix.)"""
    import shutil

    for entry in os.listdir(checkpoint_dir):
        m = re.fullmatch(r"epoch_(\d+)", entry)
        if m and int(m.group(1)) < current_epoch:
            shutil.rmtree(os.path.join(checkpoint_dir, entry),
                          ignore_errors=True)


# ---------------------------------------------------------------------------
# torch .pt import
# ---------------------------------------------------------------------------

def load_pt_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint to numpy (reference open_clip_train pt_load)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        sd = ckpt["state_dict"]
    elif isinstance(ckpt, dict) and "module" in ckpt:
        sd = ckpt["module"]
    else:
        sd = ckpt
    # strip DDP 'module.' prefix (reference main.py:311-312, factory.py:154-155)
    if next(iter(sd)).startswith("module."):
        sd = {k[len("module."):]: v for k, v in sd.items()}
    return {k: v.detach().cpu().numpy() for k, v in sd.items()
            if hasattr(v, "detach")}


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


_RESBLOCK_RE = re.compile(r"^transformer\.resblocks\.(\d+)\.(.+)$")


def _convert_block_param(sub: str, value: np.ndarray):
    """Map one in-block torch key to (flax_subpath, array)."""
    m = {
        "ln_1.weight": (("ln_1", "scale"), value),
        "ln_1.bias": (("ln_1", "bias"), value),
        "ln_2.weight": (("ln_2", "scale"), value),
        "ln_2.bias": (("ln_2", "bias"), value),
        "attn.in_proj_weight": (("attn", "in_proj", "kernel"), value.T),
        "attn.in_proj_bias": (("attn", "in_proj", "bias"), value),
        "attn.out_proj.weight": (("attn", "out_proj", "kernel"), value.T),
        "attn.out_proj.bias": (("attn", "out_proj", "bias"), value),
        "mlp.c_fc.weight": (("mlp", "c_fc", "kernel"), value.T),
        "mlp.c_fc.bias": (("mlp", "c_fc", "bias"), value),
        "mlp.c_proj.weight": (("mlp", "c_proj", "kernel"), value.T),
        "mlp.c_proj.bias": (("mlp", "c_proj", "bias"), value),
        "ls_1.gamma": (("ls_1", "gamma"), value),
        "ls_2.gamma": (("ls_2", "gamma"), value),
    }
    if sub not in m:
        return None
    return m[sub]


_BARE_RESBLOCK_RE = re.compile(r"^resblocks\.(\d+)\.(.+)$")
_CROSSBLOCK_RE = re.compile(r"^cross_attn\.(\d+)\.(.+)$")


def _convert_cross_block_param(sub: str, value: np.ndarray):
    """Map one cross-attention block key to [(flax_subpath, array), ...].

    torch MultiheadAttention packs q/k/v into in_proj even for cross
    attention; the flax cross path uses separate q/k/v Dense layers
    (models/layers.py), so the packed tensors split three ways here.
    """
    if sub in ("attn.in_proj_weight", "attn.in_proj_bias"):
        d = value.shape[0] // 3
        names = ("q_proj", "k_proj", "v_proj")
        leaf = "kernel" if sub.endswith("weight") else "bias"
        parts = [value[i * d:(i + 1) * d] for i in range(3)]
        if leaf == "kernel":
            parts = [p.T for p in parts]
        return [(("attn", n, leaf), p) for n, p in zip(names, parts)]
    m = {
        "ln_1.weight": ("ln_1", "scale"), "ln_1.bias": ("ln_1", "bias"),
        "ln_1_kv.weight": ("ln_1_kv", "scale"),
        "ln_1_kv.bias": ("ln_1_kv", "bias"),
        "ln_2.weight": ("ln_2", "scale"), "ln_2.bias": ("ln_2", "bias"),
        "attn.out_proj.weight": ("attn", "out_proj", "kernel"),
        "attn.out_proj.bias": ("attn", "out_proj", "bias"),
        "mlp.c_fc.weight": ("mlp", "c_fc", "kernel"),
        "mlp.c_fc.bias": ("mlp", "c_fc", "bias"),
        "mlp.c_proj.weight": ("mlp", "c_proj", "kernel"),
        "mlp.c_proj.bias": ("mlp", "c_proj", "bias"),
    }
    if sub not in m:
        return None
    path = m[sub]
    v = value.T if path[-1] == "kernel" and sub != "attn.in_proj_weight" else value
    return [(path, v)]


def _convert_token_head(prefix: str, key: str, value: np.ndarray):
    """vision/text_token_layer Sequential(LN, Linear, GELU, LN) indices 0/1/3
    (reference model.py:518-530) -> ln_in / proj / ln_out."""
    mapping = {
        "0.weight": ("ln_in", "scale"), "0.bias": ("ln_in", "bias"),
        "1.weight": ("proj", "kernel"), "1.bias": ("proj", "bias"),
        "3.weight": ("ln_out", "scale"), "3.bias": ("ln_out", "bias"),
    }
    if key not in mapping:
        return None
    sub = mapping[key]
    if key == "1.weight":
        value = value.T
    return (prefix,) + sub, value


def convert_openclip_state_dict(
    sd: Dict[str, np.ndarray],
    *,
    patch_size: Optional[int] = None,
) -> Dict:
    """OpenCLIP/ColXLIP torch state dict -> flax {'params': ...} tree.

    Handles both the flat CLIP text layout (token_embedding at top level) and
    'text.'-prefixed custom-text layouts.
    """
    params: Dict = {}
    skipped = []
    for key, value in sd.items():
        path = None
        v = value
        if key.startswith("visual."):
            k = key[len("visual."):]
            if k == "conv1.weight":
                # torch conv [out, in, ph, pw] -> flax dense [(ph pw c), out]
                out_c = v.shape[0]
                v = v.transpose(2, 3, 1, 0).reshape(-1, out_c)
                path = ("visual", "conv1", "kernel")
            elif k == "class_embedding":
                path = ("visual", "class_embedding")
            elif k == "positional_embedding":
                path = ("visual", "positional_embedding")
            elif k == "proj":
                path = ("visual", "proj")
            elif k in ("ln_pre.weight", "ln_post.weight"):
                path = ("visual", k.split(".")[0], "scale")
            elif k in ("ln_pre.bias", "ln_post.bias"):
                path = ("visual", k.split(".")[0], "bias")
            else:
                m = _RESBLOCK_RE.match(k)
                if m:
                    conv = _convert_block_param(m.group(2), v)
                    if conv:
                        sub, v = conv
                        path = ("visual", "transformer", f"resblocks_{m.group(1)}") + sub
        elif key.startswith(("vision_token_layer.", "text_token_layer.")):
            head, sub = key.split(".", 1)
            conv = _convert_token_head(head, sub, v)
            if conv:
                path, v = conv
        elif key.startswith("text_decoder."):
            # CoCa caption decoder (reference vendored MultimodalTransformer,
            # transformer.py:1104-1211): self-attn resblocks + cross_attn
            # blocks + ln_final + the width->vocab projection
            k = key[len("text_decoder."):]
            if k in ("ln_final.weight", "ln_final.bias"):
                path = ("text_decoder", "ln_final",
                        "scale" if k.endswith("weight") else "bias")
            elif k == "text_projection":
                # MultimodalTransformer.text_projection (width x output_dim)
                # IS the vocab head in the CoCa wiring -> VocabHead kernel
                path = ("to_logits", "kernel")
            else:
                m = _BARE_RESBLOCK_RE.match(k)
                if m:
                    conv = _convert_block_param(m.group(2), v)
                    if conv:
                        sub, v = conv
                        path = ("text_decoder", f"resblocks_{m.group(1)}") + sub
                else:
                    m = _CROSSBLOCK_RE.match(k)
                    if m:
                        conv = _convert_cross_block_param(m.group(2), v)
                        if conv is not None:
                            for sub, vv in conv:
                                _set(params, ("text_decoder",
                                              f"cross_attn_{m.group(1)}") + sub,
                                     np.asarray(vv, np.float32))
                            continue
        else:
            # text side: accept both flat and 'text.'-prefixed layouts
            k = key[len("text."):] if key.startswith("text.") else key
            if k == "cls_emb":
                path = ("text", "cls_emb")
            elif k == "token_embedding.weight":
                path = ("text", "token_embedding", "embedding")
            elif k == "positional_embedding":
                path = ("text", "positional_embedding")
            elif k == "text_projection":
                path = ("text", "text_projection")
            elif k == "text_projection.weight":
                path, v = ("text", "text_projection", "kernel"), v.T
            elif k == "text_projection.bias":
                path = ("text", "text_projection", "bias")
            elif k in ("ln_final.weight", "ln_final.bias"):
                path = ("text", "ln_final", "scale" if k.endswith("weight") else "bias")
            elif k == "logit_scale":
                path, v = ("logit_scale",), v.reshape(())
            elif k == "logit_bias":
                path, v = ("logit_bias",), v.reshape(())
            else:
                m = _RESBLOCK_RE.match(k)
                if m:
                    conv = _convert_block_param(m.group(2), v)
                    if conv:
                        sub, v = conv
                        path = ("text", "transformer", f"resblocks_{m.group(1)}") + sub
        if path is None:
            skipped.append(key)
            continue
        _set(params, path, np.asarray(v, np.float32))
    if skipped:
        logger.info("pt import: skipped %d keys (e.g. %s)", len(skipped), skipped[:5])
    return {"params": params}


def resize_vision_pos_embed(params: Dict, new_grid: Tuple[int, int]) -> Dict:
    """Interpolate visual positional embedding to a new grid (model.py:355-418)."""
    from ..models.pos_embed import interpolate_pos_embed

    pe = params["params"]["visual"]["positional_embedding"]
    n = pe.shape[0] - 1
    old = int(round(n ** 0.5))
    if (old, old) == tuple(new_grid):
        return params
    logger.info("resizing vision pos embed %dx%d -> %dx%d", old, old, *new_grid)
    new_pe = interpolate_pos_embed(jnp.asarray(pe), tuple(new_grid), (old, old))
    params["params"]["visual"]["positional_embedding"] = np.asarray(new_pe)
    return params


def load_pt_checkpoint(
    path: str,
    *,
    expected_params: Optional[Dict] = None,
    grid_size: Optional[Tuple[int, int]] = None,
) -> Dict:
    """Full .pt -> flax params pipeline with optional strictness check.

    Non-strict like the reference's ColXLIP load (factory.py:192-197): missing
    keys (e.g. token heads when importing a plain CLIP checkpoint into
    ColXLIP) keep their initialized values from ``expected_params``.
    """
    sd = load_pt_state_dict(path)
    params = convert_openclip_state_dict(sd)
    if grid_size is not None and "visual" in params["params"]:
        params = resize_vision_pos_embed(params, grid_size)
    if expected_params is not None:
        merged = _merge_trees(_to_pure_dict(expected_params), params)
        return merged
    return params


# ---------------------------------------------------------------------------
# torch .pt export (inverse of the import above)
# ---------------------------------------------------------------------------
#
# Lets a model trained HERE be handed to reference-ecosystem users: the
# emitted state dict uses the exact OpenCLIP/ColXLIP layout the reference
# loads (factory.py:159-201) — flat text tower, packed in_proj, Sequential
# token heads — and round-trips through convert_openclip_state_dict exactly.

_EXPORT_BLOCK = {
    ("ln_1", "scale"): ("ln_1.weight", False),
    ("ln_1", "bias"): ("ln_1.bias", False),
    ("ln_2", "scale"): ("ln_2.weight", False),
    ("ln_2", "bias"): ("ln_2.bias", False),
    ("attn", "in_proj", "kernel"): ("attn.in_proj_weight", True),
    ("attn", "in_proj", "bias"): ("attn.in_proj_bias", False),
    ("attn", "out_proj", "kernel"): ("attn.out_proj.weight", True),
    ("attn", "out_proj", "bias"): ("attn.out_proj.bias", False),
    ("mlp", "c_fc", "kernel"): ("mlp.c_fc.weight", True),
    ("mlp", "c_fc", "bias"): ("mlp.c_fc.bias", False),
    ("mlp", "c_proj", "kernel"): ("mlp.c_proj.weight", True),
    ("mlp", "c_proj", "bias"): ("mlp.c_proj.bias", False),
    ("ls_1", "gamma"): ("ls_1.gamma", False),
    ("ls_2", "gamma"): ("ls_2.gamma", False),
}

_TOKEN_HEAD_EXPORT = {
    ("ln_in", "scale"): ("0.weight", False), ("ln_in", "bias"): ("0.bias", False),
    ("proj", "kernel"): ("1.weight", True), ("proj", "bias"): ("1.bias", False),
    ("ln_out", "scale"): ("3.weight", False), ("ln_out", "bias"): ("3.bias", False),
}

_RESBLOCK_NAME_RE = re.compile(r"^resblocks_(\d+)$")


def _leaves(tree: Dict, prefix: Tuple[str, ...] = ()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _leaves(v, prefix + (k,))
        else:
            yield prefix + (k,), v


def _export_transformer(blocks: Dict, torch_prefix: str, out: Dict,
                        unmapped: list) -> None:
    for name, block in blocks.items():
        m = _RESBLOCK_NAME_RE.match(name)
        if not m:
            unmapped.append(torch_prefix + name)
            continue
        for sub, v in _leaves(block):
            conv = _EXPORT_BLOCK.get(sub)
            if conv is None:
                unmapped.append(f"{torch_prefix}{m.group(1)}.{'.'.join(sub)}")
                continue
            key, transpose = conv
            out[f"{torch_prefix}{m.group(1)}.{key}"] = (
                np.asarray(v).T if transpose else np.asarray(v))


def export_pt_state_dict(params: Dict) -> Dict[str, np.ndarray]:
    """flax params tree -> OpenCLIP/ColXLIP-layout numpy state dict.

    Covers the CLIP/ColXLIP families (both towers, token heads, logit
    scale/bias, bare-Parameter or Dense text projection). CoCa trees (cls_emb
    / text_decoder) are refused: the reference never round-trips CoCa and
    the decoder layout is oracle-test-only here.
    """
    p = _to_pure_dict(params)
    p = p.get("params", p)
    if "text_decoder" in p or "cls_emb" in p.get("text", {}):
        raise ValueError("CoCa export to .pt is not supported (CLIP/ColXLIP "
                         "families only)")
    out: Dict[str, np.ndarray] = {}
    unmapped: list = []

    vis = p.get("visual", {})
    for k, v in vis.items():
        v_np = None if isinstance(v, dict) else np.asarray(v)
        if k == "conv1":
            kernel = np.asarray(v["kernel"])  # [(ph pw c), out]
            width = kernel.shape[1]
            ph = int(round((kernel.shape[0] / 3) ** 0.5))
            if ph * ph * 3 != kernel.shape[0]:
                raise ValueError(f"non-square patchify kernel: {kernel.shape}")
            out["visual.conv1.weight"] = (
                kernel.reshape(ph, ph, 3, width).transpose(3, 2, 0, 1))
        elif k in ("class_embedding", "positional_embedding", "proj"):
            out[f"visual.{k}"] = v_np
        elif k in ("ln_pre", "ln_post"):
            out[f"visual.{k}.weight"] = np.asarray(v["scale"])
            out[f"visual.{k}.bias"] = np.asarray(v["bias"])
        elif k == "transformer":
            _export_transformer(v, "visual.transformer.resblocks.", out,
                                unmapped)
        else:
            unmapped.append(f"visual.{k}")

    txt = p.get("text", {})
    for k, v in txt.items():
        if k == "token_embedding":
            out["token_embedding.weight"] = np.asarray(v["embedding"])
        elif k == "positional_embedding":
            out["positional_embedding"] = np.asarray(v)
        elif k == "ln_final":
            out["ln_final.weight"] = np.asarray(v["scale"])
            out["ln_final.bias"] = np.asarray(v["bias"])
        elif k == "text_projection":
            if isinstance(v, dict):  # Dense variant
                out["text_projection.weight"] = np.asarray(v["kernel"]).T
                if "bias" in v:
                    out["text_projection.bias"] = np.asarray(v["bias"])
            else:
                out["text_projection"] = np.asarray(v)
        elif k == "transformer":
            _export_transformer(v, "transformer.resblocks.", out, unmapped)
        else:
            unmapped.append(f"text.{k}")

    for head in ("vision_token_layer", "text_token_layer"):
        for sub, v in _leaves(p.get(head, {})):
            conv = _TOKEN_HEAD_EXPORT.get(sub)
            if conv is None:
                unmapped.append(f"{head}.{'.'.join(sub)}")
                continue
            key, transpose = conv
            out[f"{head}.{key}"] = np.asarray(v).T if transpose else np.asarray(v)

    if "logit_scale" in p:
        out["logit_scale"] = np.asarray(p["logit_scale"]).reshape(())
    if "logit_bias" in p:
        out["logit_bias"] = np.asarray(p["logit_bias"]).reshape(())
    if unmapped:
        raise ValueError(f"params with no .pt export mapping: {unmapped[:8]}"
                         + ("..." if len(unmapped) > 8 else ""))
    return {k: v.astype(np.float32) for k, v in out.items()}


def save_pt_checkpoint(path: str, params: Dict, *, epoch: int = 0,
                       name: str = "") -> str:
    """Write a reference-loadable .pt: {'state_dict', 'epoch', 'name'} with
    torch tensors (reference main.py:413-422 checkpoint dict shape)."""
    import torch

    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_pt_state_dict(params).items()}
    torch.save({"state_dict": sd, "epoch": epoch, "name": name}, path)
    return path


def _merge_trees(base: Dict, overlay: Dict) -> Dict:
    out = dict(base)
    for k, v in overlay.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _merge_trees(out[k], v)
        else:
            if k in out and hasattr(out[k], "shape") and out[k].shape != v.shape:
                raise ValueError(f"shape mismatch for {k}: {out[k].shape} vs {v.shape}")
            out[k] = v
    return out
