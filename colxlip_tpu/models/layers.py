"""Core transformer layers, written TPU-first in flax.linen.

Behavioral counterparts of the reference's vendored OpenCLIP stack
(src/colxlip/transformer.py:14-513) — re-designed, not translated:

  - packed-QKV attention (one fused [D, 3D] matmul feeding the MXU) with
    ``jax.nn.dot_product_attention`` (XLA fuses the softmax); the reference
    uses torch ``nn.MultiheadAttention`` / SDPA (transformer.py:228,161-166).
  - LayerNorm always computes in fp32 and casts back, which is the TPU analog
    of the reference's ``LayerNormFp32``/``LayerNorm`` pair (transformer.py:14-29):
    with fp32 params there is a single LN class here.
  - QuickGELU (transformer.py:32-35), LayerScale (:38-46),
    PatchDropout (:49-89) with the same keep-count semantics.

Parameter tree naming intentionally mirrors OpenCLIP state-dict keys
(ln_1/attn.in_proj/attn.out_proj/ln_2/mlp.c_fc/mlp.c_proj) so that ``.pt``
checkpoint import is a mechanical rename (see training/checkpoint_import.py).
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class LayerNorm(nn.Module):
    """LayerNorm computed in fp32, output cast back to the compute dtype.

    Counterpart of reference transformer.py:14-29 (LayerNormFp32/LayerNorm).
    Stats always run fp32 and the output is cast back to the INPUT's dtype —
    deliberately no dtype knob (a field here would be dead config).
    """
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
        from ..ops.fused_ln import (
            fused_layernorm, fused_ln_supported, resolve_ln_impl,
        )

        if (resolve_ln_impl() == "fused"
                and fused_ln_supported(x.shape, jax.default_backend(),
                                       x.dtype.itemsize)):
            return fused_layernorm(x, scale, bias, self.epsilon)
        x = x.astype(jnp.float32)
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale + bias
        return y.astype(orig_dtype)


def quick_gelu(x):
    """x * sigmoid(1.702 x)  (reference transformer.py:32-35)."""
    return x * jax.nn.sigmoid(1.702 * x)


def _make_fast_gelu(approximate: bool):
    """GELU with a save-one-residual custom VJP (both erf and tanh numerics).

    Round-3 HLO analysis (scripts/hlo_diff.py) of the stock
    jax.nn.gelu(approximate=False) train graph: JAX lowers exact GELU via
    erfc, XLA expands bf16 erfc to a ~60-op two-branch fp32 rational fused
    TOGETHER with the c_fc matmul into a double-output fusion — the erf
    graph materializes 52 [B,N,4D] HBM tensors (vs tanh's 25) and
    re-executes 8 of those matmul+erfc fusions in backward. This variant
    computes erf by the A&S 7.1.26 polynomial (1.5e-7 max abs error, three
    orders below bf16 resolution; same formula as the Pallas fused-MLP
    kernel) and its VJP saves ONLY the bf16 pre-activation, recomputing
    cdf/pdf in backward — the residual structure XLA cannot be coaxed into
    choosing on its own for the erfc graph. Measured (docs/BENCH.md): erf
    flagship 699 -> 742.6 img/s.
    """

    @jax.custom_vjp
    def _fast_gelu(x):
        from ..ops.fused_mlp import _kernel_gelu

        return _kernel_gelu(x, approximate).astype(x.dtype)

    def _fwd(x):
        return _fast_gelu(x), x

    def _bwd(x, g):
        from ..ops.fused_mlp import _kernel_gelu_and_grad

        _, grad = _kernel_gelu_and_grad(x, approximate)
        return ((g.astype(jnp.float32) * grad).astype(x.dtype),)

    _fast_gelu.defvjp(_fwd, _bwd)
    return _fast_gelu


def _make_tanherf_gelu(coeffs=None):
    """Exact-erf GELU whose graph is op-isomorphic to the tanh-GELU graph.

    Same save-one-residual custom VJP as ``_make_fast_gelu``, but erf is
    computed as tanh of an odd degree-13 polynomial (ops/fused_mlp.py
    _TANH_ERF_C; max value error 1.24e-7, grad 4.4e-7 — sub-bf16-noise).
    Motivation: the A&S-poly erf graph's abs/select/exp body still plans
    differently under XLA (8 re-executed c_fc matmuls, docs/BENCH.md); this
    body is Horner + one tanh, identical in op mix to the tanh twin.
    """

    @jax.custom_vjp
    def _tanherf_gelu(x):
        from ..ops import fused_mlp as fm

        return fm._kernel_gelu_tanherf(
            x, coeffs or fm._TANH_ERF_C).astype(x.dtype)

    def _fwd(x):
        return _tanherf_gelu(x), x

    def _bwd(x, g):
        from ..ops import fused_mlp as fm

        _, grad = fm._kernel_gelu_and_grad_tanherf(
            x, coeffs or fm._TANH_ERF_C)
        return ((g.astype(jnp.float32) * grad).astype(x.dtype),)

    _tanherf_gelu.defvjp(_fwd, _bwd)
    return _tanherf_gelu


_gelu_exact_fast = _make_fast_gelu(approximate=False)
_gelu_tanh_fast = _make_fast_gelu(approximate=True)
_gelu_exact_tanhstruct = _make_tanherf_gelu()


@functools.lru_cache(maxsize=1)
def _gelu_exact_tanhstruct9():
    # lazy: fused_mlp imports are deferred module-wide (import-cycle hygiene)
    from ..ops.fused_mlp import _TANH_ERF_C9

    return _make_tanherf_gelu(_TANH_ERF_C9)


def gelu(x):
    # torch nn.GELU default is the erf ("exact") formulation; match it.
    # Round-2 history: the cheap A&S erf was tried three ways (naive AD,
    # custom_jvp, custom_vjp) and OOM'd HBM by ~176 MB at ViT-B batch 256 —
    # BEFORE the fused attention kernel freed the [B,H,N,N] residual class.
    # The custom_vjp form retried in round 3 with the freed HBM wins (699 ->
    # 742.6 img/s); env COLXLIP_GELU_IMPL selects the path ('stock' =
    # jax.nn.gelu erfc graph, for A/B and HLO-diff work).
    import os

    impl = os.environ.get("COLXLIP_GELU_IMPL", "fast9")
    if impl == "stock":
        return jax.nn.gelu(x, approximate=False)
    if impl == "aspoly":
        return _gelu_exact_fast(x)
    if impl == "fast":
        # deg-13 tanh-structured erf (tightest fit: 1.2e-7 value error)
        return _gelu_exact_tanhstruct(x)
    if impl != "fast9":
        # a typo'd env silently benchmarking the wrong path is exactly how
        # perf numbers go wrong — same loud failure as COLXLIP_ATTN_IMPL
        raise ValueError(
            f"COLXLIP_GELU_IMPL={impl!r}: expected one of "
            "'fast9' (default), 'fast', 'aspoly', 'stock'")
    # default 'fast9': deg-9 tanh-structured erf (ops/fused_mlp._TANH_ERF_C9)
    # — 2 fewer fma per Horner chain than deg-13; fp32 error 3.4e-6/1.5e-5,
    # still below the measured ON-CHIP tanh precision floor (5.8e-5/2.3e-4),
    # so chip numerics are unchanged. Measured 793.4 -> 804.9/803.4 img/s at
    # the flagship (docs/BENCH.md round 3).
    return _gelu_exact_tanhstruct9()(x)


def gelu_tanh(x):
    # tanh approximation: measurably faster on TPU VPUs (~10% tower speedup
    # at ViT-B scale); opt-in via CLIPCfg.gelu_approximate. Same env-gated
    # save-one-residual custom VJP as gelu() above.
    import os

    if os.environ.get("COLXLIP_GELU_IMPL", "fast") == "stock":
        return jax.nn.gelu(x, approximate=True)
    return _gelu_tanh_fast(x)


class LayerScale(nn.Module):
    """Per-channel learnable residual scaling (reference transformer.py:38-46)."""
    init_values: float = 1e-5

    @nn.compact
    def __call__(self, x):
        gamma = self.param(
            "gamma", nn.initializers.constant(self.init_values), (x.shape[-1],), jnp.float32
        )
        return x * gamma.astype(x.dtype)


class PatchDropout(nn.Module):
    """Randomly keep a subset of patch tokens during training.

    Same semantics as reference transformer.py:49-89: keeps
    ``max(1, int(num_tokens * (1 - prob)))`` tokens per sample, optionally
    always retaining the leading CLS token. Implemented with a static keep
    count (XLA-friendly: shapes stay fixed) via per-sample top-k of random
    scores — identical in distribution to the reference's randn+topk.
    """
    prob: float = 0.5
    exclude_first_token: bool = True

    @nn.compact
    def __call__(self, x, *, deterministic: bool):
        if deterministic or self.prob == 0.0:
            return x
        rng = self.make_rng("patch_dropout")
        if self.exclude_first_token:
            cls_tok, tokens = x[:, :1], x[:, 1:]
        else:
            cls_tok, tokens = x[:, :0], x
        b, n, d = tokens.shape
        num_keep = max(1, int(n * (1.0 - self.prob)))
        scores = jax.random.normal(rng, (b, n))
        _, keep_idx = jax.lax.top_k(scores, num_keep)  # [b, num_keep]
        kept = jnp.take_along_axis(tokens, keep_idx[:, :, None], axis=1)
        return jnp.concatenate([cls_tok, kept], axis=1)


class _DenseParams(nn.Module):
    """Declare Dense-layout params (kernel/bias, same names+inits as
    nn.Dense) without running the matmul — the fused-MLP kernel consumes the
    raw arrays while keeping the checkpoint tree identical."""
    features: int
    param_dtype: Dtype = jnp.float32
    kernel_init: Callable = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param("kernel", self.kernel_init,
                            (in_features, self.features), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), self.param_dtype)
        return kernel, bias


class MLP(nn.Module):
    """Transformer MLP: c_fc -> act -> c_proj (reference transformer.py:233-238).

    ``checkpoint_act``: wrap the act->c_proj region in ``jax.checkpoint`` so
    the backward pass holds ONE [B, N, 4D] residual (the pre-activation,
    needed for the activation derivative anyway) instead of two — the
    post-activation that c_proj's weight grad wants is recomputed with a
    single elementwise pass. The exact-erf GELU graph otherwise keeps both
    4x-wide tensors per layer (~620 MB/layer at ViT-B batch 256) and pushes
    XLA's memory planner into auto-remat re-execution of whole MLP fusions
    (round-2/3 profiles: ~48 ms/step). Unlike remat='mlp_scope' this never
    recomputes the c_fc matmul, so the overhead is pure VPU bandwidth.
    """
    dim: int
    mlp_ratio: float = 4.0
    act: Callable = gelu
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    checkpoint_act: bool = False
    mlp_impl: str = "auto"
    # from-scratch init overrides (reference transformer.py:925-940 text-
    # tower scheme); None keeps flax's lecun_normal default
    fc_init: Optional[Callable] = None
    proj_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x):
        from jax.ad_checkpoint import checkpoint_name

        fc_init = self.fc_init or nn.initializers.lecun_normal()
        proj_init = self.proj_init or nn.initializers.lecun_normal()
        hidden = int(self.dim * self.mlp_ratio)

        # int8-forward A/B (env COLXLIP_MLP_INT8=fwd): both MLP matmuls run
        # int8 x int8 -> int32 on the MXU with straight-through bf16
        # backward (ops/quantization.py int8_st_linear) — the precision-
        # headroom experiment toward the north-star throughput. Param paths
        # stay (mlp/c_fc, mlp/c_proj), checkpoint-compatible.
        import os

        if os.environ.get("COLXLIP_MLP_INT8", "") == "fwd":
            from ..ops.quantization import int8_st_linear

            w1, b1 = _DenseParams(hidden, self.param_dtype, fc_init,
                                  name="c_fc")(x.shape[-1])
            w2, b2 = _DenseParams(self.dim, self.param_dtype, proj_init,
                                  name="c_proj")(hidden)
            h = int8_st_linear(x.astype(self.dtype), w1, b1)
            return int8_st_linear(self.act(h), w2, b2)

        # fused Pallas path (TPU): whole MLP in one kernel, zero [B,N,4D]
        # HBM residuals, recompute backward (ops/fused_mlp.py). Param paths
        # (mlp/c_fc, mlp/c_proj) are identical to the Dense branch, so
        # checkpoints are interchangeable across impls.
        approximate = {gelu: False, gelu_tanh: True}.get(self.act)
        from ..ops.fused_mlp import resolve_mlp_impl

        if (approximate is not None and not self.checkpoint_act
                and x.ndim == 3 and resolve_mlp_impl(self.mlp_impl) == "fused"):
            from ..ops.fused_mlp import fused_mlp

            w1, b1 = _DenseParams(hidden, self.param_dtype, fc_init,
                                  name="c_fc")(x.shape[-1])
            w2, b2 = _DenseParams(self.dim, self.param_dtype, proj_init,
                                  name="c_proj")(hidden)
            dt = self.dtype
            return fused_mlp(x.astype(dt), w1.astype(dt), b1.astype(dt),
                             w2.astype(dt), b2.astype(dt), approximate)

        x = nn.Dense(hidden, name="c_fc", dtype=self.dtype,
                     param_dtype=self.param_dtype, kernel_init=fc_init)(x)
        # named so remat='mlp' can refuse to save the 4x-wide tensors (the
        # dominant activation memory: 2x [B, N, 4D] per layer)
        x = checkpoint_name(x, "mlp_hidden_pre")
        c_proj = nn.Dense(self.dim, name="c_proj", dtype=self.dtype,
                          param_dtype=self.param_dtype, kernel_init=proj_init)
        if self.checkpoint_act:
            def act_proj(mdl, h):
                return mdl(self.act(h))

            return nn.remat(act_proj)(c_proj, x)
        x = self.act(x)
        x = checkpoint_name(x, "mlp_hidden_act")
        return c_proj(x)


class MultiHeadAttention(nn.Module):
    """Multi-head self-attention with packed QKV projection.

    One [D, 3D] matmul produces Q,K,V (MXU-friendly; mirrors the reference's
    packed ``in_proj_weight``, transformer.py:118-121, which also keeps ``.pt``
    import trivial). The attention core dispatches through
    ``ops.attention.multi_head_attention``: the Pallas flash kernel on TPU
    (no [B,H,N,N] score tensor in HBM), XLA's fused softmax elsewhere;
    ``attn_impl`` or the COLXLIP_ATTN_IMPL env var force a path.
    """
    dim: int
    heads: int
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    attn_impl: str = "auto"
    # from-scratch init overrides (reference transformer.py:925-940);
    # None keeps flax's lecun_normal default
    in_proj_init: Optional[Callable] = None
    out_proj_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x, *, kv: Optional[jnp.ndarray] = None,
                 mask: Optional[jnp.ndarray] = None, is_causal: bool = False):
        b, n, d = x.shape
        assert d == self.dim
        head_dim = self.dim // self.heads
        in_proj_init = self.in_proj_init or nn.initializers.lecun_normal()
        out_proj_init = self.out_proj_init or nn.initializers.lecun_normal()
        if kv is None:
            qkv = nn.Dense(
                3 * self.dim, name="in_proj", dtype=self.dtype,
                param_dtype=self.param_dtype, kernel_init=in_proj_init,
            )(x)
            from ..ops.attention import resolve_impl

            # the Pallas kernel needs concrete dims (its grid/block choice is
            # a function of B); under jax.export symbolic shapes (serving/
            # aot.py symbolic batch) fall back to the XLA path, which lowers
            # shape-polymorphically
            concrete = all(isinstance(s, int) for s in (b, n))
            if (mask is None and concrete
                    and resolve_impl(self.attn_impl) == "fused"):
                # TPU path: fused packed-QKV Pallas kernel — consumes the
                # in_proj output directly (no split/transpose), materializes
                # no [B,H,N,N] tensor fwd or bwd (ops/fused_attention.py)
                from ..ops.fused_attention import fused_mha_packed

                out = fused_mha_packed(qkv, self.heads, is_causal)
                return nn.Dense(
                    self.dim, name="out_proj", dtype=self.dtype,
                    param_dtype=self.param_dtype, kernel_init=out_proj_init,
                )(out)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            m = n
        else:
            # cross-attention: separate projections (torch MultiheadAttention
            # with kdim/vdim uses q/k/v_proj_weight; names mirror that)
            m = kv.shape[1]
            q = nn.Dense(self.dim, name="q_proj", dtype=self.dtype,
                         param_dtype=self.param_dtype,
                         kernel_init=in_proj_init)(x)
            k = nn.Dense(self.dim, name="k_proj", dtype=self.dtype,
                         param_dtype=self.param_dtype,
                         kernel_init=in_proj_init)(kv)
            v = nn.Dense(self.dim, name="v_proj", dtype=self.dtype,
                         param_dtype=self.param_dtype,
                         kernel_init=in_proj_init)(kv)
        q = q.reshape(b, n, self.heads, head_dim)
        k = k.reshape(b, m, self.heads, head_dim)
        v = v.reshape(b, m, self.heads, head_dim)
        from ..ops.attention import multi_head_attention

        out = multi_head_attention(
            q, k, v, mask=mask, causal=is_causal, impl=self.attn_impl
        )
        out = out.reshape(b, n, self.dim)
        out = nn.Dense(
            self.dim, name="out_proj", dtype=self.dtype,
            param_dtype=self.param_dtype, kernel_init=out_proj_init,
        )(out)
        return out


class ResidualAttentionBlock(nn.Module):
    """Pre-LN transformer block (reference transformer.py:213-268)."""
    dim: int
    heads: int
    mlp_ratio: float = 4.0
    ls_init_value: Optional[float] = None
    act: Callable = gelu
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    mlp_remat: bool = False
    mlp_checkpoint_act: bool = False
    # (attn_std, proj_std, fc_std) from-scratch init, or None for flax
    # defaults — the reference text tower's depth-scaled normals
    # (transformer.py:925-940)
    init_stds: Optional[tuple] = None

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None, is_causal: bool = False):
        if self.init_stds is not None:
            attn_std, proj_std, fc_std = self.init_stds
            inits = dict(
                in_proj_init=nn.initializers.normal(stddev=attn_std),
                out_proj_init=nn.initializers.normal(stddev=proj_std),
            )
            mlp_inits = dict(
                fc_init=nn.initializers.normal(stddev=fc_std),
                proj_init=nn.initializers.normal(stddev=proj_std),
            )
        else:
            inits = {}
            mlp_inits = {}
        attn_out = MultiHeadAttention(
            self.dim, self.heads, dtype=self.dtype,
            param_dtype=self.param_dtype, name="attn", **inits,
        )(LayerNorm(name="ln_1")(x), mask=mask, is_causal=is_causal)
        if self.ls_init_value is not None:
            attn_out = LayerScale(self.ls_init_value, name="ls_1")(attn_out)
        x = x + attn_out
        # mlp_remat: checkpoint the MLP SUBMODULE — backward recomputes the
        # two [B,N,4D] hiddens from the stored MLP input, without forcing a
        # save policy on anything outside the MLP (unlike remat='mlp', which
        # OOMed — see Transformer docstring)
        mlp_cls = nn.remat(MLP) if self.mlp_remat else MLP
        mlp_out = mlp_cls(
            self.dim, self.mlp_ratio, act=self.act, dtype=self.dtype,
            param_dtype=self.param_dtype, name="mlp",
            checkpoint_act=self.mlp_checkpoint_act, **mlp_inits,
        )(LayerNorm(name="ln_2")(x))
        if self.ls_init_value is not None:
            mlp_out = LayerScale(self.ls_init_value, name="ls_2")(mlp_out)
        return x + mlp_out


class Transformer(nn.Module):
    """Stack of residual blocks (reference transformer.py:422-513).

    ``remat=True`` applies ``jax.checkpoint`` per block — the TPU-native
    analog of the reference's torch.utils.checkpoint grad-checkpointing hooks
    (transformer.py:500-504, main.py:250-251). ``remat='mlp'`` checkpoints
    each block with a policy that saves everything EXCEPT the two [B, N, 4D]
    MLP hidden tensors. CAUTION (round-2 measurement): because the policy
    force-saves every OTHER intermediate it can USE MORE memory than XLA's
    own auto-remat — it OOMed HBM at ViT-B batch 256 where remat=False fits.
    Useful only where attention residuals are small relative to MLP width.
    """
    width: int
    layers: int
    heads: int
    mlp_ratio: float = 4.0
    ls_init_value: Optional[float] = None
    act: Callable = gelu
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    remat: Any = False
    # depth-scaled normal block init (reference TextTransformer
    # init_parameters, transformer.py:925-940): attn_std = width^-0.5,
    # proj_std = width^-0.5 * (2*layers)^-0.5, fc_std = (2*width)^-0.5.
    # Off by default (the reference's VISION tower keeps torch defaults).
    scaled_init: bool = False

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None, is_causal: bool = False,
                 take_indices: Optional[tuple] = None):
        """take_indices (static tuple of block idxs) additionally returns those
        blocks' outputs — the reference's forward_intermediates feature taps
        (transformer.py:475-498 / utils.py feature_take_indices)."""
        block_cls = ResidualAttentionBlock
        mlp_remat = False
        mlp_checkpoint_act = False
        if self.remat == "act":
            # checkpoint ONLY the act->c_proj region of each MLP: one
            # [B,N,4D] residual per layer instead of two, recompute cost one
            # elementwise pass (see MLP.checkpoint_act)
            mlp_checkpoint_act = True
        elif self.remat == "mlp_scope":
            # checkpoint only the MLP submodule of each block (see
            # ResidualAttentionBlock.mlp_remat)
            mlp_remat = True
        elif self.remat == "mlp":
            import jax.ad_checkpoint as adc

            block_cls = nn.remat(
                ResidualAttentionBlock, static_argnums=(3,),
                policy=adc.checkpoint_policies.save_anything_except_these_names(
                    "mlp_hidden_pre", "mlp_hidden_act"),
            )
        elif self.remat:
            # static_argnums counts self at index 0; is_causal (bool) is static.
            block_cls = nn.remat(ResidualAttentionBlock, static_argnums=(3,))
        init_stds = None
        if self.scaled_init:
            init_stds = (
                self.width ** -0.5,
                (self.width ** -0.5) * ((2 * self.layers) ** -0.5),
                (2 * self.width) ** -0.5,
            )
        intermediates = []
        for i in range(self.layers):
            block = block_cls(
                self.width, self.heads, self.mlp_ratio,
                ls_init_value=self.ls_init_value, act=self.act,
                dtype=self.dtype, param_dtype=self.param_dtype,
                mlp_remat=mlp_remat, mlp_checkpoint_act=mlp_checkpoint_act,
                init_stds=init_stds,
                name=f"resblocks_{i}",
            )
            x = block(x, mask, is_causal)
            if take_indices is not None and i in take_indices:
                intermediates.append(x)
        if take_indices is not None:
            return x, intermediates
        return x


class AttentionalPooler(nn.Module):
    """n_queries learned queries cross-attend into a feature sequence
    (reference transformer.py:169-210; kv may have a different width)."""
    d_model: int
    n_head: int = 8
    n_queries: int = 256
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b = x.shape[0]
        query = self.param(
            "query", nn.initializers.normal(stddev=self.d_model ** -0.5),
            (self.n_queries, self.d_model), jnp.float32,
        )
        x = LayerNorm(name="ln_k")(x)
        q = LayerNorm(name="ln_q")(query.astype(self.dtype)[None])
        q = jnp.broadcast_to(q, (b, self.n_queries, self.d_model))
        out = MultiHeadAttention(
            self.d_model, self.n_head, dtype=self.dtype,
            param_dtype=self.param_dtype, name="attn",
        )(q, kv=x)
        return out
