"""Fused transformer MLP (Pallas/Mosaic, TPU): c_fc -> GELU -> c_proj in one
kernel, with a recompute backward. ZERO [B, N, 4D] tensors in HBM.

Why: the exact-erf GELU graph keeps two 4x-wide hidden tensors per layer
(~620 MB/layer at ViT-B batch 256) as AD residuals. Round-3 profiling showed
the full-residual graph does not fit the 16 GB chip at all (disabling XLA
rematerialization OOMs), XLA's auto-remat answer costs ~48 ms/step of
re-executed c_fc matmul fusions (colclip-erf 706.6 img/s vs its tanh twin's
808), and the targeted act->c_proj checkpoint loses more than it saves
(651 img/s: every consumer fusion re-reads the pre-activation). This kernel
removes the residual class entirely:

  - forward: per batch row-block, h = x @ W1 + b1 and a = gelu(h) live only
    in VMEM between the two matmuls; HBM sees x in and out out.
  - backward: recomputes h and a from x (one extra c_fc matmul — the same
    trade XLA's auto-remat already made for 8/12 layers, now paid uniformly
    and without the planner chaos), then computes all five gradients in
    VMEM. dW1/dW2/db accumulate in fp32 across the sequential TPU grid.
  - the GELU derivative inside the backward kernel is taken with jax.vjp of
    jax.nn.gelu itself, so erf/tanh numerics match the stock graph exactly.

Same deliberate design choices as ops/fused_attention.py: packed layout in
== layout out (no transposes), full-width blocks, custom VJP with the layer
INPUT as the only residual (it already exists as the ln_2 output).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gelu(x, approximate: bool):
    return jax.nn.gelu(x, approximate=approximate)


# --- in-kernel GELU -------------------------------------------------------
# Mosaic cannot lower erf/erfc (jax.nn.gelu's exact path), so the kernel
# computes the erf via the Abramowitz & Stegun 7.1.26 polynomial in fp32:
# max abs error 1.5e-7 — three orders of magnitude below bf16 resolution at
# activation scale (measured on chip: 6e-7 max deviation from jax.nn.gelu
# over [-6, 6]). The tanh variant is closed-form.

_SQRT1_2 = 0.7071067811865476
_SQRT_2_OVER_PI = 0.7978845608028654
_INV_SQRT_2PI = 0.3989422804014327


def _erf_poly(x):
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
           + t * (-1.453152027 + t * 1.061405429))))
    return jnp.sign(x) * (1.0 - poly * jnp.exp(-a * a))


def _kernel_gelu(x, approximate: bool):
    """fp32 GELU value for a (possibly bf16) input tile."""
    x32 = x.astype(jnp.float32)
    if approximate:
        u = _SQRT_2_OVER_PI * (x32 + 0.044715 * x32 * x32 * x32)
        return 0.5 * x32 * (1.0 + jnp.tanh(u))
    return 0.5 * x32 * (1.0 + _erf_poly(x32 * _SQRT1_2))


# --- tanh-structured exact-erf GELU --------------------------------------
# Round-3 HLO finding: with the save-one-residual custom VJP in place, the
# A&S-polynomial erf graph STILL re-executes 8 vision c_fc matmuls that the
# tanh twin never clones (scripts/hlo_diff.py; the abs/select/exp body plans
# differently under XLA). This variant removes the structural difference
# entirely: erf(x/sqrt2) = tanh(p(x)) with p an odd degree-13 polynomial
# fitted by weighted Lawson iteration (max |gelu err| 1.24e-7, |gelu' err|
# 4.4e-7 over [-8, 8] — three orders below bf16 resolution, the same
# accuracy class as the A&S path; p stays > 8 for |x| > 8 so tanh remains
# saturated). The resulting graph is op-for-op isomorphic to the tanh-GELU
# graph (Horner in x^2 + one tanh), which XLA plans 10% faster.
_TANH_ERF_C = (
    7.978849415003e-01, 3.633308435436e-02, -3.259467502166e-05,
    -5.530634998354e-05, 3.964779949953e-06, -1.322668724700e-07,
    1.756295264109e-09,
)

# Degree-9 variant of the same fit (max |gelu err| 3.4e-6, |gelu' err|
# 1.5e-5 in fp32 over [-8, 8]) — still below the ON-CHIP accuracy floor,
# which is set by the TPU's tanh itself (5.8e-5 / 2.3e-4 measured for the
# deg-13 fit), so chip-side numerics are indistinguishable while the Horner
# chains drop 2 fma each in forward and backward. Tail-safe: p has a
# positive leading coefficient and min p(x) = 106.8 on [8, 100]. Measured
# on chip: flagship colclip-erf 793.4/791.4 (deg-13) -> 804.9/803.4 img/s
# (repeat runs) — now the DEFAULT gelu(); COLXLIP_GELU_IMPL=fast keeps the
# deg-13 fit.
_TANH_ERF_C9 = (
    7.978279664811e-01, 3.646912955145e-02, -1.250404030320e-04,
    -3.054860572436e-05, 1.117285474498e-06,
)


def _tanh_erf_p(x32, coeffs=_TANH_ERF_C):
    u = x32 * x32
    p = jnp.float32(coeffs[-1])
    for c in coeffs[-2::-1]:
        p = p * u + jnp.float32(c)
    return x32 * p


def _tanh_erf_dp(x32, coeffs=_TANH_ERF_C):
    u = x32 * x32
    n = len(coeffs)
    p = jnp.float32((2 * n - 1) * coeffs[-1])
    for k in range(n - 2, -1, -1):
        p = p * u + jnp.float32((2 * k + 1) * coeffs[k])
    return p


def _kernel_gelu_tanherf(x, coeffs=_TANH_ERF_C):
    """fp32 exact-erf GELU value via the tanh-structured polynomial."""
    x32 = x.astype(jnp.float32)
    return 0.5 * x32 * (1.0 + jnp.tanh(_tanh_erf_p(x32, coeffs)))


def _kernel_gelu_and_grad_tanherf(x, coeffs=_TANH_ERF_C):
    """(value, d/dx) — exact derivatives of the tanh-structured formula."""
    x32 = x.astype(jnp.float32)
    t = jnp.tanh(_tanh_erf_p(x32, coeffs))
    val = 0.5 * x32 * (1.0 + t)
    grad = 0.5 * (1.0 + t) + 0.5 * x32 * (1.0 - t * t) * _tanh_erf_dp(x32, coeffs)
    return val, grad


def _kernel_gelu_and_grad(x, approximate: bool):
    """(value, d/dx) in fp32 — the exact derivatives of the formulas above."""
    x32 = x.astype(jnp.float32)
    if approximate:
        u = _SQRT_2_OVER_PI * (x32 + 0.044715 * x32 * x32 * x32)
        t = jnp.tanh(u)
        du = _SQRT_2_OVER_PI * (1.0 + 3.0 * 0.044715 * x32 * x32)
        val = 0.5 * x32 * (1.0 + t)
        grad = 0.5 * (1.0 + t) + 0.5 * x32 * (1.0 - t * t) * du
        return val, grad
    cdf = 0.5 * (1.0 + _erf_poly(x32 * _SQRT1_2))
    pdf = _INV_SQRT_2PI * jnp.exp(-0.5 * x32 * x32)
    return x32 * cdf, cdf + x32 * pdf


def resolve_mlp_impl(impl: str = "auto") -> str:
    """'auto' -> XLA: the fused kernel measured 685 vs 699 img/s at the
    ViT-B flagship (its uniform per-layer recompute loses to XLA's
    selective auto-remat; docs/BENCH.md fused-MLP entry). Env
    COLXLIP_MLP_IMPL overrides; explicit 'fused'/'xla' force a path."""
    if impl != "auto":
        return impl
    import os

    forced = os.environ.get("COLXLIP_MLP_IMPL")
    if forced:
        return forced
    return "xla"  # flipped to 'fused' only if the chip measurement wins


def _pick_block_b(b: int) -> int:
    # weights dominate VMEM; the row block only needs to amortize control
    # overhead. 4 rows x N<=257 x 4D<=4096 temps stay ~8-25 MB in fp32.
    for bb in (4, 2, 1):
        if b % bb == 0:
            return bb
    return 1


def _compiler_params(bb: int, n: int, d: int, h: int, itemsize: int,
                     backward: bool):
    # resident: W1+W2 (+ fp32 dW1+dW2 when backward) + per-b temps
    weights = 2 * d * h * itemsize + (2 * 4 * d * h if backward else 0)
    temps = bb * n * (4 * h * (4 if backward else 1) + 6 * d * itemsize)
    need = weights + temps
    return pltpu.CompilerParams(
        vmem_limit_bytes=min(120 * 1024 * 1024, max(32 * 1024 * 1024, need * 2)))


def _fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, *,
                approximate: bool):
    bb = x_ref.shape[0]
    for b in range(bb):
        x = x_ref[b]
        h = jax.lax.dot_general(
            x, w1_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x_ref.dtype) + b1_ref[...].astype(x_ref.dtype)
        a = _kernel_gelu(h, approximate).astype(x_ref.dtype)
        out_ref[b] = (jax.lax.dot_general(
            a, w2_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_ref.dtype) + b2_ref[...].astype(out_ref.dtype))


def _bwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, dout_ref,
                dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, *,
                approximate: bool):
    bb = x_ref.shape[0]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    for b in range(bb):
        x = x_ref[b]
        do = dout_ref[b]
        # recompute the hidden pre-activation exactly as the forward did
        h = jax.lax.dot_general(
            x, w1_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x_ref.dtype) + b1_ref[...].astype(x_ref.dtype)
        a32, g32 = _kernel_gelu_and_grad(h, approximate)
        a = a32.astype(x_ref.dtype)
        # dW2 += a^T @ dout ; db2 += colsum(dout)
        dw2_ref[...] += jax.lax.dot_general(
            a, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        db2_ref[...] += jnp.sum(do.astype(jnp.float32), axis=0)
        # da = dout @ W2^T ; dh = gelu'(h) * da
        da = jax.lax.dot_general(
            do, w2_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dh = (g32 * da).astype(x_ref.dtype)
        # dW1 += x^T @ dh ; db1 += colsum(dh) ; dx = dh @ W1^T
        dw1_ref[...] += jax.lax.dot_general(
            x, dh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        db1_ref[...] += jnp.sum(dh.astype(jnp.float32), axis=0)
        dx_ref[b] = jax.lax.dot_general(
            dh, w1_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dx_ref.dtype)


def _fwd_call(x, w1, b1, w2, b2, approximate, block_b, interpret):
    from .fused_attention import _require_tpu

    _require_tpu(interpret)
    b, n, d = x.shape
    h = w1.shape[1]
    bb = block_b or _pick_block_b(b)
    if b % bb:
        raise ValueError(
            f"block_b={bb} does not divide batch {b}: the truncated grid "
            "would leave trailing output rows uninitialized")
    kernel = functools.partial(_fwd_kernel, approximate=approximate)
    return pl.pallas_call(
        kernel,
        grid=(b // bb,),
        in_specs=[
            pl.BlockSpec((bb, n, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((d, h), lambda i: (0, 0)),
            pl.BlockSpec((h,), lambda i: (0,)),
            pl.BlockSpec((h, d), lambda i: (0, 0)),
            pl.BlockSpec((d,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((bb, n, d), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n * d * h,
            bytes_accessed=(2 * b * n * d + 2 * d * h) * x.dtype.itemsize,
            transcendentals=b * n * h,
        ),
        compiler_params=_compiler_params(bb, n, d, h, x.dtype.itemsize, False),
        interpret=interpret,
    )(x, w1, b1, w2, b2)


def _bwd_call(x, w1, b1, w2, dout, approximate, block_b, interpret):
    from .fused_attention import _require_tpu

    _require_tpu(interpret)
    b, n, d = x.shape
    h = w1.shape[1]
    bb = block_b or _pick_block_b(b)
    if b % bb:
        raise ValueError(
            f"block_b={bb} does not divide batch {b}: the truncated grid "
            "would leave trailing gradient rows uninitialized")
    kernel = functools.partial(_bwd_kernel, approximate=approximate)
    return pl.pallas_call(
        kernel,
        grid=(b // bb,),
        in_specs=[
            pl.BlockSpec((bb, n, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((d, h), lambda i: (0, 0)),
            pl.BlockSpec((h,), lambda i: (0,)),
            pl.BlockSpec((h, d), lambda i: (0, 0)),
            pl.BlockSpec((bb, n, d), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bb, n, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((d, h), lambda i: (0, 0)),
            pl.BlockSpec((h,), lambda i: (0,)),
            pl.BlockSpec((h, d), lambda i: (0, 0)),
            pl.BlockSpec((d,), lambda i: (0,)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, d), x.dtype),      # dx
            jax.ShapeDtypeStruct((d, h), jnp.float32),     # dW1
            jax.ShapeDtypeStruct((h,), jnp.float32),       # db1
            jax.ShapeDtypeStruct((h, d), jnp.float32),     # dW2
            jax.ShapeDtypeStruct((d,), jnp.float32),       # db2
        ],
        cost_estimate=pl.CostEstimate(
            flops=12 * b * n * d * h,
            bytes_accessed=(3 * b * n * d + 6 * d * h) * x.dtype.itemsize,
            transcendentals=2 * b * n * h,
        ),
        compiler_params=_compiler_params(bb, n, d, h, x.dtype.itemsize, True),
        interpret=interpret,
    )(x, w1, b1, w2, dout)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def fused_mlp(x, w1, b1, w2, b2, approximate: bool = False,
              block_b: int = 0, interpret: bool = False):
    """gelu-MLP over [B, N, D]: (gelu(x @ w1 + b1) @ w2 + b2).

    w1: [D, H], b1: [H], w2: [H, D], b2: [D] (bf16 compute copies; the
    custom VJP emits fp32 weight grads). The only backward residual is x.
    """
    return _fwd_call(x, w1, b1, w2, b2, approximate, block_b, interpret)


def _vjp_fwd(x, w1, b1, w2, b2, approximate, block_b, interpret):
    out = _fwd_call(x, w1, b1, w2, b2, approximate, block_b, interpret)
    # zero-size marker carries b2's dtype (custom_vjp residuals must be JAX
    # types; db2 must come back in b2's dtype, not b1's)
    return out, (x, w1, b1, w2, jnp.zeros((0,), b2.dtype))


def _vjp_bwd(approximate, block_b, interpret, res, dout):
    x, w1, b1, w2, b2_marker = res
    dx, dw1, db1, dw2, db2 = _bwd_call(
        x, w1, b1, w2, dout, approximate, block_b, interpret)
    return (dx, dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2.astype(b2_marker.dtype))


fused_mlp.defvjp(_vjp_fwd, _vjp_bwd)


def fused_mlp_reference(x, w1, b1, w2, b2, approximate: bool = False):
    """XLA path with identical semantics (oracle for tests; also the
    non-TPU fallback the flax MLP uses when the kernel is unavailable)."""
    dt = x.dtype
    h = jax.lax.dot_general(
        x, w1, (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ).astype(dt) + b1.astype(dt)
    a = _gelu(h, approximate)
    return jax.lax.dot_general(
        a, w2, (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ).astype(dt) + b2.astype(dt)
