"""Int8 quantization ops (Pallas TPU kernels + XLA fallback).

Counterpart of the reference's int8 linear replacement hook
(src/colxlip/utils.py:31-106 ``convert_int8_model_to_inference_mode`` /
bitsandbytes-style int8 Linear): per-channel symmetric int8 weight
quantization for inference-time memory/bandwidth reduction. The Pallas
kernel uses the TPU PRNG for stochastic rounding (guide: quantization
kernel pattern).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def quantize_int8_xla(
    w: jnp.ndarray, axis: int = 0
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-channel symmetric int8: returns (values int8, scales fp32)."""
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=axis, keepdims=True)
    scale = jnp.maximum(amax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale


def dequantize_int8(q: jnp.ndarray, scale: jnp.ndarray, dtype=jnp.bfloat16):
    return (q.astype(jnp.float32) * scale).astype(dtype)


def _quant_kernel(x_ref, seed_ref, values_ref, scales_ref):
    # mix the grid position into the seed: one scalar seed for every column
    # block would repeat the identical noise pattern per block, correlating
    # the rounding of element (i, j) with (i, j + block_n)
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    x = x_ref[...].astype(jnp.float32)
    amax = jnp.max(jnp.abs(x), axis=0, keepdims=True)
    scale = jnp.maximum(amax / 127.0, 1e-8)
    scaled = x / scale
    # manual stochastic rounding to int (pltpu.stochastic_round only targets
    # bf16/fp8): floor(x + u) with u ~ U[0, 1) is unbiased
    bits = pltpu.bitcast(pltpu.prng_random_bits(scaled.shape), jnp.uint32)
    u = (bits >> 8).astype(jnp.int32).astype(jnp.float32) * (1.0 / (1 << 24))
    rounded = jnp.floor(scaled + u)
    values_ref[...] = jnp.clip(rounded, -127.0, 127.0).astype(jnp.int8)
    scales_ref[...] = scale


def quantize_int8_pallas(
    w: jnp.ndarray, seed: int = 0, interpret: Optional[bool] = None,
    block_n: int = 512,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Stochastic-rounding int8 quantization of a [K, N] weight (per-column).

    Stochastic rounding makes the quantization unbiased — the standard trick
    for quantized training/inference stacks. Gridded over column blocks so
    the VMEM working set is [K, block_n] (+ temporaries) regardless of N —
    a whole ViT-L MLP kernel would otherwise blow the 16MB scoped limit.
    """
    if interpret is None and jax.default_backend() != "tpu":
        # pltpu.prng_seed has no CPU interpret lowering in this jax version;
        # the XLA path is the supported off-TPU implementation
        return quantize_int8_xla(w)
    interpret = bool(interpret)
    k, n = w.shape
    bn = min(block_n, n)
    n_pad = ((n + bn - 1) // bn) * bn
    w_p = jnp.pad(w, ((0, 0), (0, n_pad - n)))
    seed_arr = jnp.asarray([seed], jnp.int32)
    values, scales = pl.pallas_call(
        _quant_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((k, n_pad), jnp.int8),
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
        ),
        grid=(n_pad // bn,),
        in_specs=[
            pl.BlockSpec((k, bn), lambda j: (0, j)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((k, bn), lambda j: (0, j)),
            pl.BlockSpec((1, bn), lambda j: (0, j)),
        ),
        interpret=interpret,
    )(w_p, seed_arr)
    return values[:, :n], scales[:, :n]


def int8_matmul(x: jnp.ndarray, q: jnp.ndarray, scale: jnp.ndarray,
                bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """x @ dequant(q) with fp32 accumulation; the int8 weight is dequantized
    on the fly (XLA fuses the scale multiply into the matmul epilogue)."""
    out = jax.lax.dot_general(
        x.astype(jnp.bfloat16), q.astype(jnp.bfloat16),
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    if bias is not None:
        out = out + bias
    return out.astype(x.dtype)


@jax.custom_vjp
def int8_st_linear(x: jnp.ndarray, kernel: jnp.ndarray,
                   bias: jnp.ndarray) -> jnp.ndarray:
    """Linear layer with an int8-MXU FORWARD and a straight-through bf16
    backward (the precision-headroom experiment, VERDICT r4 #5).

    Forward: dynamic per-row symmetric int8 activation quant x per-column
    int8 weight quant -> int8 x int8 -> int32 dot (the v5e MXU's ~2x-bf16
    path) -> fp32 rescale by the outer product of scales + bias.
    Backward: exact bf16/fp32 gradients from the saved full-precision
    inputs (straight-through estimator w.r.t. the quantization) — training
    dynamics see quantization only as forward noise.
    """
    y, _ = _int8_fwd_impl(x, kernel, bias)
    return y


def _int8_fwd_impl(x, kernel, bias):
    *lead, d = x.shape
    x2 = x.reshape(-1, d).astype(jnp.float32)
    # per-row activation scale (dynamic), per-column weight scale (symmetric)
    xmax = jnp.max(jnp.abs(x2), axis=1, keepdims=True)
    xs = jnp.maximum(xmax / 127.0, 1e-8)
    xq = jnp.clip(jnp.round(x2 / xs), -127, 127).astype(jnp.int8)
    wq, ws = quantize_int8_xla(kernel.astype(jnp.float32), axis=0)
    acc = jax.lax.dot_general(
        xq, wq, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.float32)
    y = acc * xs * ws + bias.astype(jnp.float32)
    return y.reshape(*lead, -1).astype(x.dtype), (x, kernel)


def _int8_st_fwd(x, kernel, bias):
    y, res = _int8_fwd_impl(x, kernel, bias)
    return y, res


def _int8_st_bwd(res, g):
    x, kernel = res
    *lead, d = x.shape
    g2 = g.reshape(-1, g.shape[-1])
    x2 = x.reshape(-1, d)
    dx = (g2 @ kernel.astype(g2.dtype).T).reshape(x.shape).astype(x.dtype)
    dw = (x2.astype(jnp.float32).T @ g2.astype(jnp.float32)).astype(kernel.dtype)
    db = jnp.sum(g2.astype(jnp.float32), axis=0).astype(g.dtype)
    return dx, dw, db


int8_st_linear.defvjp(_int8_st_fwd, _int8_st_bwd)


def quantize_params_int8(params, *, min_size: int = 1 << 16):
    """Quantize every large 2-D kernel in a param tree to (int8, scale).

    Returns a new tree where matching leaves become dicts
    {'int8': values, 'scale': scales}; use with custom inference wrappers.
    """
    def q(path, leaf):
        if leaf.ndim == 2 and leaf.size >= min_size:
            values, scale = quantize_int8_xla(leaf)
            return {"int8": values, "scale": scale}
        return leaf
    return jax.tree_util.tree_map_with_path(q, params)
