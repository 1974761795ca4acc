"""Standalone 64-way ring-token proof (run in a fresh subprocess).

Proves the north-star 32k-global colclip configuration — ``local_loss`` +
``token_dist='ring'``, the only mode whose memory math survives 32k global
batch (the reference's token gather, loss.py:235-243, would move ~9 GB of
bf16 token features per device) — actually compiles and runs a full train
step on a 64-device mesh, and that its loss equals the full-gather
computation on the same global batch.

Usage: python tests/ring64_probe.py [n_devices]   (prints one JSON line)

Must run in its own process: XLA parses --xla_force_host_platform_device_count
once at backend init, and the test suite's conftest already fixed it at 8.
"""
import json
import os
import sys


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n}")

    import jax

    jax.config.update("jax_platforms", "cpu")
    assert jax.device_count() == n, (jax.device_count(), n)

    import jax.numpy as jnp
    import numpy as np
    from colxlip_tpu.models import CLIPCfg, ColXLIP, get_model_config
    from colxlip_tpu.parallel.mesh import create_mesh
    from colxlip_tpu.parallel.train_step import (
        TrainStepConfig,
        init_train_state,
        make_train_step,
        replicate_state,
    )
    from colxlip_tpu.training.optim import create_optimizer
    from colxlip_tpu.training.schedules import cosine_lr

    cfg = CLIPCfg.from_dict(get_model_config("ViT-S-16-test"))
    model = ColXLIP(cfg, dtype=jnp.float32)
    tx = create_optimizer(cosine_lr(1e-3, 10, 100), weight_decay=0.1)

    b = 2 * n
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((b, 64, 64, 3)).astype(np.float32))
    texts_np = np.zeros((b, 32), np.int32)
    texts_np[:, 0] = 49406
    texts_np[:, 1:5] = rng.integers(1, 40000, (b, 4))
    texts_np[:, 5] = 49407
    texts = jnp.asarray(texts_np)

    state = init_train_state(model, tx, jax.random.PRNGKey(0),
                             images[:2], texts[:2])

    # the north-star mode: sharded-logits local loss + ppermute token ring
    mesh = create_mesh(n)
    ring_step = make_train_step(
        model, tx,
        TrainStepConfig(loss_type="colclip", local_loss=True,
                        token_dist="ring", gather_with_grad=True,
                        maxsim_impl="xla"),
        mesh=mesh, donate=False,
    )
    ring_state, ring_metrics = ring_step(replicate_state(state, mesh),
                                         images, texts)
    ring_loss = float(ring_metrics["total_loss"])

    # oracle: the same global batch through the single-device full-gather
    # formulation (mathematically identical loss; grads identical for
    # gather_with_grad=True — see tests/test_losses.py ring parity)
    ref_step = make_train_step(
        model, tx, TrainStepConfig(loss_type="colclip", maxsim_impl="xla"),
        mesh=None, donate=False,
    )
    ref_state, ref_metrics = ref_step(state, images, texts)
    ref_loss = float(ref_metrics["total_loss"])

    probe = ("params", "visual", "transformer", "resblocks_0", "attn",
             "in_proj", "kernel")
    a = np.asarray(jax.device_get(_get(ring_state.params, probe)))
    bq = np.asarray(jax.device_get(_get(ref_state.params, probe)))
    max_param_diff = float(np.max(np.abs(a - bq)))

    print(json.dumps({
        "n_devices": n,
        "ring_local_loss": ring_loss,
        "full_gather_loss": ref_loss,
        "abs_diff": abs(ring_loss - ref_loss),
        "updated_param_max_abs_diff": max_param_diff,
    }))


def _get(tree, path):
    node = tree
    for p in path:
        node = node[p]
    return node


if __name__ == "__main__":
    main()
