"""Llama-family model stack over NF4-quantized weights (functional JAX).

The reference package's only "model" is a benchmark-harness MLP of three
``Linear4bit`` layers mirroring Llama's gated MLP (reference
``benchmark.py:38-50``).  The TPU build supplies the full decoder: RMSNorm,
rotary embeddings, GQA attention, SwiGLU MLP, tied into prefill/decode entry
points, with every linear projection running through the fused NF4
dequant-matmul kernel so packed weights never materialize in HBM.

Design notes (TPU-first):

* Pure functional: parameters are flax.struct pytrees, entry points are
  jit-able functions of (params, inputs).  No module framework state.
* All decoder layers are *stacked* (a leading ``num_layers`` axis on every
  leaf) and iterated with ``jax.lax.scan`` — one trace/compile of the layer
  body regardless of depth, the XLA-idiomatic way to express depth.
* Attention softmax and RMSNorm accumulate in fp32; activations are bf16.
* The KV cache is a fixed-shape ring of ``[L, B, KV, S_max, D]`` buffers
  updated with per-sequence positions (continuous-batching friendly).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..nf4.format import PackedNF4, QDense, pack_codes_for_tpu, quantize_for_tpu
from ..ops.matmul import nf4_matmul

__all__ = [
    "LlamaConfig",
    "LlamaParams",
    "LayerParams",
    "KVCache",
    "init_params",
    "quantize_dense_params",
    "quantize_layer",
    "recode_params_int8",
    "fuse_rows",
    "split_fused",
    "init_kv_cache",
    "forward",
    "train_forward",
    "prefill",
    "prefill_chunked",
    "decode_step",
]


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    """Static architecture description (hashable; safe as a jit static arg)."""

    vocab_size: int = 32000
    hidden_size: int = 2048
    intermediate_size: int = 5632
    num_layers: int = 22
    num_heads: int = 32
    num_kv_heads: int = 4
    head_dim: int = 64
    rope_theta: float = 10000.0
    # RoPE frequency scaling for long-context checkpoints, as a hashable
    # tuple: ("llama3", factor, low_freq_factor, high_freq_factor,
    # original_max_position_embeddings) — the Llama-3.1/3.2 scheme;
    # ("linear", factor); or ("longrope", short_factors, long_factors,
    # original_max_position_embeddings[, attention_factor]) — the Phi-3
    # scheme.  Factor choice is DEPLOYMENT-static (vLLM-style): long
    # factors when max_seq_len exceeds the original context, else short
    # (HF eager instead switches per runtime length — short prompts on a
    # long-deployed model differ from HF by construction).  cos/sin are
    # scaled by attention_factor; the loader computes it from the
    # CHECKPOINT's max_position_embeddings (sqrt(1+ln(scale)/ln(orig)))
    # so a serving-context cap cannot skew the checkpoint's math.
    rope_scaling: Optional[tuple] = None
    rms_norm_eps: float = 1e-5
    max_seq_len: int = 2048
    # Sliding-window attention (Mistral-style): each query attends only to
    # the last `sliding_window` positions.  None = full causal attention.
    sliding_window: Optional[int] = None
    # Bias on the q/k/v projections (Qwen2-style).
    attn_bias: bool = False
    # Per-head RMSNorm on the query/key projections before RoPE
    # (Qwen3-style; LayerParams.q_norm/k_norm hold the [head_dim] weights).
    qk_norm: bool = False
    # MLP activation on the gate branch: "silu" (Llama), "gelu_tanh"
    # (Gemma's GeGLU / HF gelu_pytorch_tanh), or exact "gelu".
    activation: str = "silu"
    # RMSNorm applies (1 + weight) instead of weight (Gemma convention).
    rmsnorm_one_plus: bool = False
    # Scale token embeddings by sqrt(hidden_size) (Gemma convention).
    scale_embeddings: bool = False
    # NF4-quantize the lm_head too (bnb/HF keep it dense).  A MEMORY
    # lever, not a speed one: it saves ~0.8 GB of HBM for a 128k vocab but
    # the dense bf16 head already streams at full matmul speed, so decode
    # throughput is unchanged (measured on v5e).  Opt-in; costs a little
    # quality where logits are most sensitive.
    quantize_lm_head: bool = False
    dtype: Any = jnp.bfloat16
    quantize: bool = True  # 4-bit-quantize the linear projections
    # 4-bit codebook for the quantized linears: "nf4" (default) or "fp4"
    # (bnb Linear4bit's default e2m1 table).  Every kernel, serving mode,
    # and checkpoint format honors the choice per-weight.
    quant_type: str = "nf4"
    # int8-quantize the KV cache (per-token-per-head absmax scales): halves
    # KV memory and read traffic — the dominant decode stream at long
    # context.  Scales fold into attention scores/probs, so the dequantized
    # cache is never materialized.
    kv_quant: bool = False
    # Pack row-parallel weights (wo, w_down) in this many K-chunks so they
    # can be contraction-sharded over a tensor-parallel mesh axis.
    tp_shards: int = 1
    # Mixture-of-experts MLP (Mixtral): the gated MLP is replicated into
    # num_experts experts (w_gateup/w_down leaves gain a leading expert
    # axis; LayerParams.router holds the [E, hidden] gate) and each token
    # is routed to the softmax-renormalized top experts_per_token of them.
    # num_experts=1 is the plain dense MLP.
    num_experts: int = 1
    experts_per_token: int = 2
    # Routing-weight normalization (HF ``norm_topk_prob``): True (Mixtral,
    # Qwen3-MoE) renormalizes the selected experts' weights to sum to 1
    # (= softmax over the top-k logits); False (Qwen1.5/2-MoE-style
    # checkpoints with norm_topk_prob=false) keeps the FULL-softmax
    # probabilities of the selected experts un-renormalized.
    moe_norm_topk: bool = True
    # MoE sharding strategy under tensor parallelism:
    # * "tensor": each expert's gate/up columns and down K-chunks split
    #   over the tp axis like the dense MLP (experts packed with
    #   tp_shards interleave/chunks).
    # * "expert": the EXPERT axis shards instead — each device holds
    #   num_experts/tp FULL-WIDTH experts (packed with shards=1).  Same
    #   HBM traffic, but fewer and wider matmuls per device (better MXU
    #   tiling at decode), and the tp degree is no longer baked into the
    #   expert pack layout.  Requires num_experts % tp == 0.
    moe_shard: str = "tensor"
    # Runtime-only (set by parallel.tp.tp_local_config inside shard_map,
    # never on checkpoints): the mesh axis experts are sharded over in
    # "expert" mode, so _moe_mlp can offset local expert ids to global.
    ep_axis: Optional[str] = None
    # Gemma-2 conventions (all optional / off by default):
    # tanh logit softcapping on attention scores and on final logits,
    # a query scale of query_pre_attn_scalar**-0.5 instead of
    # head_dim**-0.5, and alternating local/global attention —
    # sliding_window_pattern=N makes every Nth layer global
    # (layer i is windowed iff i % N != N-1; Gemma-2 uses N=2).
    attn_logit_softcapping: Optional[float] = None
    final_logit_softcapping: Optional[float] = None
    query_pre_attn_scalar: Optional[float] = None
    sliding_window_pattern: int = 1
    # Gemma-3: LOCAL (windowed) layers rotate with this base frequency,
    # unscaled; global layers use rope_theta + rope_scaling.  None = one
    # rope for all layers.
    rope_local_theta: Optional[float] = None

    @property
    def attn_scale(self) -> float:
        base = (
            self.query_pre_attn_scalar
            if self.query_pre_attn_scalar is not None
            else self.head_dim
        )
        return float(base) ** -0.5

    @property
    def q_dim(self) -> int:
        return self.num_heads * self.head_dim

    @property
    def kv_dim(self) -> int:
        return self.num_kv_heads * self.head_dim

    @property
    def moe_groups(self) -> int:
        """Shard interleave/chunk count the EXPERT weights are packed with:
        tp_shards in "tensor" mode, always 1 in "expert" mode (each device
        holds whole experts, so per-expert layouts are tp-independent)."""
        if self.moe_shard not in ("tensor", "expert"):
            raise ValueError(
                f"moe_shard={self.moe_shard!r}; expected 'tensor' or 'expert'"
            )
        return self.tp_shards if self.moe_shard == "tensor" else 1


Weight = Any  # PackedNF4 (quantized) or jax.Array (dense)


@struct.dataclass
class LayerParams:
    """Per-layer weights.  Column-parallel projections are FUSED so a decode
    step issues one kernel per projection group instead of one per tensor
    (q+k+v and gate+up each share a single packed weight / matmul), the
    standard Megatron fusion: at TinyLlama scale this removes ~40% of the
    per-token kernel launches, which dominate small-batch decode.

    Fused layouts are interleaved per tensor-parallel shard (``groups =
    cfg.tp_shards``): fused rows are ``concat_s [q_s; k_s; v_s]`` so a
    contiguous 1/tp slice of the output dim is exactly one device's
    ``[q_local; k_local; v_local]`` — column sharding needs no shuffles.
    """

    wqkv: Weight  # fused [q_dim + 2*kv_dim, hidden]
    wo: Weight
    w_gateup: Weight  # fused [2*intermediate, hidden]
    w_down: Weight
    input_norm: jax.Array  # [hidden]
    post_attn_norm: jax.Array  # [hidden]
    # Fused q/k/v bias [q_dim + 2*kv_dim] (Qwen2-style, cfg.attn_bias);
    # interleaved per shard exactly like wqkv's rows.  None when absent.
    qkv_bias: Optional[jax.Array] = None
    # MoE router [num_experts, hidden] (dense — it is tiny and the route
    # decision is precision-sensitive).  None for dense-MLP models.
    router: Optional[jax.Array] = None
    # Qwen3 per-head q/k RMSNorm weights [head_dim]; None otherwise.
    q_norm: Optional[jax.Array] = None
    k_norm: Optional[jax.Array] = None
    # Gemma-2 sublayer-OUTPUT norms, applied to the attention / MLP
    # result before its residual add (HF post_attention_layernorm /
    # post_feedforward_layernorm — note Gemma-2's MLP PRE-norm, HF's
    # pre_feedforward_layernorm, maps onto this struct's post_attn_norm,
    # which has always been the MLP pre-norm here).  None for non-Gemma-2.
    post_attn_out_norm: Optional[jax.Array] = None
    post_ffw_norm: Optional[jax.Array] = None


@struct.dataclass
class LlamaParams:
    embed: jax.Array  # [vocab, hidden] dense (bnb never quantizes embeddings)
    layers: LayerParams  # stacked: every leaf has leading [num_layers]
    final_norm: jax.Array  # [hidden]
    # [vocab, hidden]: dense by default (HF 4-bit keeps lm_head dense);
    # PackedNF4 when cfg.quantize_lm_head.
    lm_head: Weight


@struct.dataclass
class KVCache:
    k: jax.Array  # [L, B, KV, S_max, D] (bf16, or int8 when quantized)
    v: jax.Array  # [L, B, KV, S_max, D]
    # Per-token-per-head absmax scales [L, B, KV, S_max] fp32 when the cache
    # is int8-quantized (cfg.kv_quant); None for the bf16 cache.
    k_scale: Optional[jax.Array] = None
    v_scale: Optional[jax.Array] = None

    @property
    def batch_size(self) -> int:
        return self.k.shape[1]

    @property
    def max_seq_len(self) -> int:
        return self.k.shape[3]


# ---------------------------------------------------------------------------
# Parameter construction


def _linear(w, cfg: LlamaConfig, shards: int = 1) -> Weight:
    if isinstance(w, QDense):
        # Pre-quantized weight (e.g. parsed from a bitsandbytes-serialized
        # checkpoint, nf4.bnb_checkpoint): pure layout packing — the codes
        # the original quantizer chose are carried through untouched.
        if not cfg.quantize:
            raise ValueError(
                "pre-quantized (bnb) weights require cfg.quantize=True"
            )
        if w.quant_type != cfg.quant_type:
            raise ValueError(
                f"checkpoint quant_type {w.quant_type!r} != config "
                f"quant_type {cfg.quant_type!r}"
            )
        return pack_codes_for_tpu(
            w.codes, w.scales, dtype=cfg.dtype, shards=shards,
            quant_type=w.quant_type,
        )
    if cfg.quantize:
        return quantize_for_tpu(
            w, dtype=cfg.dtype, shards=shards, quant_type=cfg.quant_type
        )
    return jnp.asarray(w, dtype=cfg.dtype)


def fuse_rows(ws, groups: int = 1):
    """Fuse dense [m_i, n] weights along the out dim, interleaved per shard:
    rows = concat over s of [w0_s; w1_s; ...] with w_s = w[s*m/g:(s+1)*m/g].

    Accepts either all-dense numpy arrays or all-:class:`QDense` (quantized)
    weights — QDense fuses codes and per-block scales with the SAME row
    interleaving (out-features are rows of both), so separately quantized
    projections fuse exactly.  Mixing the two flavors in one fused group is
    rejected: silently quantizing the dense minority here would hide a
    checkpoint inconsistency.
    """
    n_q = sum(isinstance(w, QDense) for w in ws)
    if n_q:
        if n_q != len(ws):
            raise ValueError(
                "cannot fuse pre-quantized and dense weights in one group"
            )
        qt = {w.quant_type for w in ws}
        if len(qt) > 1:
            raise ValueError(f"mixed quant_types in fused group: {qt}")
        return QDense(
            fuse_rows([w.codes for w in ws], groups),
            fuse_rows([w.scales for w in ws], groups),
            ws[0].quant_type,
        )
    ws = [np.asarray(w) for w in ws]
    if groups == 1:
        return np.concatenate(ws, axis=0)
    blocks = []
    for s in range(groups):
        for w in ws:
            mg = w.shape[0] // groups
            blocks.append(w[s * mg : (s + 1) * mg])
    return np.concatenate(blocks, axis=0)


def split_fused(y: jax.Array, sizes, groups: int = 1):
    """Inverse of :func:`fuse_rows` on the output features of a fused matmul:
    y [..., sum(sizes)] -> one array per entry of ``sizes``."""
    if groups == 1:
        out, off = [], 0
        for size in sizes:
            out.append(y[..., off : off + size])
            off += size
        return out
    block = sum(sizes) // groups
    parts = [[] for _ in sizes]
    for s in range(groups):
        off = s * block
        for i, size in enumerate(sizes):
            sz = size // groups
            parts[i].append(y[..., off : off + sz])
            off += sz
    return [jnp.concatenate(p, axis=-1) for p in parts]


def init_params(cfg: LlamaConfig, seed: int = 0) -> LlamaParams:
    """Random-init a model (host-side numpy), quantizing per cfg.quantize.

    Layers are built per-depth then stacked leaf-wise so the result is
    directly scannable.
    """
    rng = np.random.default_rng(seed)
    h, inter = cfg.hidden_size, cfg.intermediate_size

    def dense(mo, ni):
        return (rng.standard_normal((mo, ni)) * (ni**-0.5)).astype(np.float32)

    g = cfg.tp_shards

    def mlp_weights():
        """(w_gateup, w_down, router): dense-MLP weights, or expert-stacked
        ([E, ...] leaves via tree-stacking the per-expert PackedNF4s) plus
        the dense router for MoE configs."""
        if cfg.num_experts == 1:
            return (
                _linear(fuse_rows([dense(inter, h), dense(inter, h)], g), cfg),
                _linear(dense(h, inter), cfg, shards=g),
                None,
            )
        ge = cfg.moe_groups
        gus, dns = [], []
        for _e in range(cfg.num_experts):
            gus.append(
                _linear(fuse_rows([dense(inter, h), dense(inter, h)], ge), cfg)
            )
            dns.append(_linear(dense(h, inter), cfg, shards=ge))
        stack = lambda ws: jax.tree.map(lambda *xs: jnp.stack(xs), *ws)
        router = jnp.asarray(
            rng.standard_normal((cfg.num_experts, h)) * (h**-0.5),
            dtype=jnp.float32,
        )
        return stack(gus), stack(dns), router

    layers = []
    for _ in range(cfg.num_layers):
        qkv_bias = None
        if cfg.attn_bias:
            qkv_bias = jnp.asarray(
                fuse_rows(
                    [
                        rng.standard_normal(cfg.q_dim) * 0.02,
                        rng.standard_normal(cfg.kv_dim) * 0.02,
                        rng.standard_normal(cfg.kv_dim) * 0.02,
                    ],
                    g,
                ),
                dtype=jnp.float32,
            )
        layers.append(
            LayerParams(
                wqkv=_linear(
                    fuse_rows(
                        [dense(cfg.q_dim, h), dense(cfg.kv_dim, h), dense(cfg.kv_dim, h)],
                        g,
                    ),
                    cfg,
                ),
                wo=_linear(dense(h, cfg.q_dim), cfg, shards=g),
                w_gateup=None,
                w_down=None,
                input_norm=jnp.ones((h,), dtype=jnp.float32),
                post_attn_norm=jnp.ones((h,), dtype=jnp.float32),
                qkv_bias=qkv_bias,
            )
        )
        gu, dn, router = mlp_weights()
        extra = {}
        if (
            cfg.attn_logit_softcapping is not None
            or cfg.sliding_window_pattern > 1
        ):  # Gemma-2 block shape
            extra = dict(
                post_attn_out_norm=jnp.ones((h,), dtype=jnp.float32),
                post_ffw_norm=jnp.ones((h,), dtype=jnp.float32),
            )
        if cfg.qk_norm:  # Qwen3 q/k head norms
            extra.update(
                q_norm=jnp.ones((cfg.head_dim,), dtype=jnp.float32),
                k_norm=jnp.ones((cfg.head_dim,), dtype=jnp.float32),
            )
        layers[-1] = layers[-1].replace(
            w_gateup=gu, w_down=dn, router=router, **extra
        )
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    return LlamaParams(
        embed=jnp.asarray(
            rng.standard_normal((cfg.vocab_size, h)) * 0.02, dtype=cfg.dtype
        ),
        layers=stacked,
        final_norm=jnp.ones((h,), dtype=jnp.float32),
        lm_head=_lm_head(
            (rng.standard_normal((cfg.vocab_size, h)) * (h**-0.5)).astype(np.float32),
            cfg,
        ),
    )


def _lm_head(w, cfg: LlamaConfig) -> Weight:
    if isinstance(w, QDense):
        # The checkpoint shipped a quantized lm_head (bnb quantizes it
        # unless it's in llm_int8_skip_modules): keep it packed.
        return pack_codes_for_tpu(
            w.codes, w.scales, dtype=cfg.dtype, quant_type=w.quant_type
        )
    if cfg.quantize_lm_head:
        return quantize_for_tpu(
            np.asarray(w, np.float32), dtype=cfg.dtype,
            quant_type=cfg.quant_type,
        )
    return jnp.asarray(w, dtype=cfg.dtype)


def quantize_layer(lw: dict, cfg: LlamaConfig) -> LayerParams:
    """Quantize ONE layer's dense weight dict to a LayerParams.

    The unit of the streaming loader (``models.loader.load_hf_llama``): a
    layer's dense tensors can be freed as soon as this returns, so peak host
    memory during checkpoint loading is one dense layer + the packed output
    rather than the whole dense model.
    """
    g = cfg.tp_shards
    qkv_bias = None
    if cfg.attn_bias:
        qkv_bias = jnp.asarray(
            fuse_rows([lw["bq"], lw["bk"], lw["bv"]], g), dtype=jnp.float32
        )
    if cfg.num_experts > 1:
        ge = cfg.moe_groups
        stack = lambda ws: jax.tree.map(lambda *xs: jnp.stack(xs), *ws)
        gu = stack(
            [
                _linear(
                    fuse_rows(
                        [lw[f"expert{e}.w_gate"], lw[f"expert{e}.w_up"]], ge
                    ),
                    cfg,
                )
                for e in range(cfg.num_experts)
            ]
        )
        dn = stack(
            [
                _linear(lw[f"expert{e}.w_down"], cfg, shards=ge)
                for e in range(cfg.num_experts)
            ]
        )
        router = lw["router"]
        if isinstance(router, QDense):
            # A bnb checkpoint may have quantized the (tiny) router Linear
            # too; the model wants it dense fp32 — exact dequantization.
            router = router.to_dense()
        router = jnp.asarray(router, dtype=jnp.float32)
    else:
        gu = _linear(fuse_rows([lw["w_gate"], lw["w_up"]], g), cfg)
        dn = _linear(lw["w_down"], cfg, shards=g)
        router = None
    return LayerParams(
        wqkv=_linear(fuse_rows([lw["wq"], lw["wk"], lw["wv"]], g), cfg),
        wo=_linear(lw["wo"], cfg, shards=g),
        w_gateup=gu,
        w_down=dn,
        input_norm=jnp.asarray(lw["input_norm"], dtype=jnp.float32),
        post_attn_norm=jnp.asarray(lw["post_attn_norm"], dtype=jnp.float32),
        qkv_bias=qkv_bias,
        router=router,
        post_attn_out_norm=(
            jnp.asarray(lw["post_attn_out_norm"], dtype=jnp.float32)
            if "post_attn_out_norm" in lw
            else None
        ),
        post_ffw_norm=(
            jnp.asarray(lw["post_ffw_norm"], dtype=jnp.float32)
            if "post_ffw_norm" in lw
            else None
        ),
        q_norm=(
            jnp.asarray(lw["q_norm"], dtype=jnp.float32)
            if "q_norm" in lw
            else None
        ),
        k_norm=(
            jnp.asarray(lw["k_norm"], dtype=jnp.float32)
            if "k_norm" in lw
            else None
        ),
    )


def quantize_dense_params(dense_layers: list, cfg: LlamaConfig, embed, final_norm, lm_head) -> LlamaParams:
    """Assemble LlamaParams from host-side dense per-layer weight dicts.

    ``dense_layers[i]`` maps {"wq","wk","wv","wo","w_gate","w_up","w_down",
    "input_norm","post_attn_norm"} to numpy arrays; linears are quantized.
    """
    built = [quantize_layer(lw, cfg) for lw in dense_layers]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *built)
    return LlamaParams(
        embed=jnp.asarray(embed, dtype=cfg.dtype),
        layers=stacked,
        final_norm=jnp.asarray(final_norm, dtype=jnp.float32),
        lm_head=_lm_head(lm_head, cfg),
    )


def init_kv_cache(cfg: LlamaConfig, batch_size: int, dtype=None) -> KVCache:
    dtype = dtype or cfg.dtype
    shape = (
        cfg.num_layers,
        batch_size,
        cfg.num_kv_heads,
        cfg.max_seq_len,
        cfg.head_dim,
    )
    if cfg.kv_quant:
        return KVCache(
            k=jnp.zeros(shape, dtype=jnp.int8),
            v=jnp.zeros(shape, dtype=jnp.int8),
            k_scale=jnp.zeros(shape[:-1], dtype=jnp.float32),
            v_scale=jnp.zeros(shape[:-1], dtype=jnp.float32),
        )
    return KVCache(k=jnp.zeros(shape, dtype=dtype), v=jnp.zeros(shape, dtype=dtype))


# ---------------------------------------------------------------------------
# Building blocks


def _matmul(x: jax.Array, w: Weight, out_dtype=None) -> jax.Array:
    out_dtype = out_dtype or x.dtype
    if isinstance(w, PackedNF4):
        return nf4_matmul(x, w, out_dtype=out_dtype)
    from ..ops.int8_serve import PackedInt8, int8_matmul

    if isinstance(w, PackedInt8):
        return int8_matmul(x, w, out_dtype=out_dtype)
    return jnp.dot(x, w.T, preferred_element_type=jnp.float32).astype(out_dtype)


def recode_params_int8(params: "LlamaParams") -> "LlamaParams":
    """Convert all quantized projections to the int8-recode serving format
    (ops.int8_serve): ~2.5x faster decode for 2x weight memory, values stay
    on the NF4 grid.  Checkpoints keep the 4-bit format; call this after
    loading when serving throughput matters more than HBM footprint."""
    from ..ops.int8_serve import recode_int8_weight

    def recode(leaf):
        return recode_int8_weight(leaf) if isinstance(leaf, PackedNF4) else leaf

    return jax.tree.map(
        recode, params, is_leaf=lambda l: isinstance(l, PackedNF4)
    )


def rms_norm(
    x: jax.Array, weight: jax.Array, eps: float, one_plus: bool = False
) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    w = 1.0 + weight if one_plus else weight
    return (normed * w).astype(x.dtype)


def _scaled_inv_freq(cfg: LlamaConfig) -> jax.Array:
    """Per-frequency inverse wavelengths, with optional long-context
    scaling (HF ``rope_scaling``).  The "llama3" scheme (Llama-3.1/3.2)
    divides low-frequency components by ``factor`` and smoothly
    interpolates the band between ``high_freq_factor`` and
    ``low_freq_factor`` wavelengths of the original training context —
    the exact formula of HF's ``_compute_llama3_parameters``."""
    half = cfg.head_dim // 2
    inv_freq = 1.0 / (
        cfg.rope_theta ** (jnp.arange(0, half, dtype=jnp.float32) / half)
    )
    if cfg.rope_scaling is None:
        return inv_freq
    kind = cfg.rope_scaling[0]
    if kind == "linear":
        return inv_freq / jnp.float32(cfg.rope_scaling[1])
    if kind == "llama3":
        _, factor, lo_f, hi_f, orig = cfg.rope_scaling
        wavelen = 2.0 * jnp.pi / inv_freq
        low_wl = orig / lo_f  # longest kept-ish wavelengths
        high_wl = orig / hi_f
        scaled = inv_freq / jnp.float32(factor)
        smooth = (orig / wavelen - lo_f) / (hi_f - lo_f)
        mid = (1.0 - smooth) * scaled + smooth * inv_freq
        return jnp.where(
            wavelen < high_wl, inv_freq, jnp.where(wavelen > low_wl, scaled, mid)
        )
    if kind == "longrope":
        _, short, long, orig = cfg.rope_scaling[:4]
        factors = long if cfg.max_seq_len > orig else short
        return inv_freq / jnp.asarray(factors, jnp.float32)
    raise ValueError(
        f"unknown rope_scaling kind {kind!r}; llama3|linear|longrope"
    )


def _rope_attn_scale(cfg: LlamaConfig) -> float:
    """Phi-3 longrope multiplies cos/sin by the checkpoint's attention
    factor (tuple entry 5 when present — computed by the loader from the
    checkpoint's full max_position_embeddings, sqrt(1+ln(scale)/ln(orig));
    falls back to deriving it from cfg.max_seq_len for hand-built
    configs); 1.0 for every other scheme."""
    if cfg.rope_scaling is None or cfg.rope_scaling[0] != "longrope":
        return 1.0
    if len(cfg.rope_scaling) > 4:
        return float(cfg.rope_scaling[4])
    orig = cfg.rope_scaling[3]
    scale = cfg.max_seq_len / orig
    if scale <= 1.0:
        return 1.0
    import math

    return math.sqrt(1.0 + math.log(scale) / math.log(orig))


def _layer_is_local(cfg: LlamaConfig) -> Optional[jax.Array]:
    """Per-layer bool [L]: True for windowed (local) layers under an
    alternating pattern; None when a single rope/window serves all."""
    if cfg.sliding_window_pattern <= 1:
        return None
    i = jnp.arange(cfg.num_layers, dtype=jnp.int32)
    pat = cfg.sliding_window_pattern
    return i % pat != pat - 1


def _layer_windows(cfg: LlamaConfig) -> Optional[jax.Array]:
    """Per-layer sliding windows [L] for alternating local/global
    attention (Gemma-2), or None when every layer uses the static
    cfg.sliding_window.  Global layers get a window larger than any
    context — the same visibility as no window."""
    if cfg.sliding_window_pattern <= 1 or cfg.sliding_window is None:
        return None
    i = jnp.arange(cfg.num_layers, dtype=jnp.int32)
    pat = cfg.sliding_window_pattern
    return jnp.where(
        i % pat != pat - 1,
        jnp.int32(cfg.sliding_window),
        jnp.int32(cfg.max_seq_len + 1),
    )


def _softcap(logits: jax.Array, cap: Optional[float]) -> jax.Array:
    return logits if cap is None else jnp.tanh(logits / cap) * cap


def local_rope_tables(cfg: LlamaConfig, positions: jax.Array):
    """Gemma-3 local-layer tables: rope_local_theta, UNSCALED (global
    layers keep rope_theta + rope_scaling); None when single-rope."""
    if cfg.rope_local_theta is None:
        return None
    local_cfg = dataclasses.replace(
        cfg, rope_theta=cfg.rope_local_theta, rope_scaling=None
    )
    return rope_tables(local_cfg, positions)


def rope_tables(cfg: LlamaConfig, positions: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """cos/sin tables for the HF 'rotate_half' convention; positions [...]"""
    inv_freq = _scaled_inv_freq(cfg)
    angles = positions.astype(jnp.float32)[..., None] * inv_freq  # [..., half]
    emb = jnp.concatenate([angles, angles], axis=-1)  # [..., D]
    m = _rope_attn_scale(cfg)
    if m != 1.0:
        return jnp.cos(emb) * jnp.float32(m), jnp.sin(emb) * jnp.float32(m)
    return jnp.cos(emb), jnp.sin(emb)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: [B, H, S, D]; cos/sin: [B, S, D] (broadcast over heads)."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    cos = cos[:, None, :, :]
    sin = sin[:, None, :, :]
    return (x.astype(jnp.float32) * cos + rotated.astype(jnp.float32) * sin).astype(
        x.dtype
    )


def _col_chunks(w: Weight, nchunks: int):
    """Static lane-dim (out-feature) chunks of a weight, or None if the
    padded out dim does not split into 128-lane-aligned chunks.

    Chunk logical shape = the padded chunk (padding columns dequantize to
    exact 0), so concatenating chunk outputs reproduces the padded output.
    """
    from ..ops.int8_serve import PackedInt8

    if isinstance(w, (PackedNF4, PackedInt8)):
        m_pad, n_pad = w.padded_shape
        if m_pad % nchunks or (m_pad // nchunks) % 128:
            return None
        mc = m_pad // nchunks
        out = []
        for c in range(nchunks):
            sl = (Ellipsis, slice(c * mc, (c + 1) * mc))
            meta = dict(shape=(mc, w.shape[1]), padded_shape=(mc, n_pad))
            if isinstance(w, PackedInt8):
                out.append(w.replace(values=w.values[sl], scales=w.scales[sl], **meta))
            else:
                out.append(w.replace(packed=w.packed[sl], scales=w.scales[sl], **meta))
        return out
    m = w.shape[-2]
    if m % nchunks:
        return None
    mc = m // nchunks
    return [w[..., c * mc : (c + 1) * mc, :] for c in range(nchunks)]


def _reduced_matmul(x, w: Weight, reduce_fn, out_dtype=None):
    """Row-parallel projection + reduction, optionally as a COLLECTIVE
    MATMUL: with ``NF4TPU_COLLECTIVE_MATMUL=N`` the output columns are
    computed in N chunks, each followed by its own ``reduce_fn`` (partial
    psum) — program structure that lets XLA overlap chunk c's collective
    with chunk c+1's matmul over ICI (the done-properly version of the
    reference's 3-stream trick, reference ``benchmark.py:68-84``).  Math is
    unchanged: every output element sees the identical psum."""
    from ..utils import env

    nchunks = env.collective_chunks()
    if nchunks > 1:
        chunks = _col_chunks(w, nchunks)
        if chunks is not None:
            m = w.shape[-2] if not hasattr(w, "out_features") else w.out_features
            parts = [
                reduce_fn(_matmul(x, wc, out_dtype=out_dtype)) for wc in chunks
            ]
            return jnp.concatenate(parts, axis=-1)[..., :m]
    return reduce_fn(_matmul(x, w, out_dtype=out_dtype))


def _lora_delta(x: jax.Array, ab, adapter_ids=None) -> Optional[jax.Array]:
    """Low-rank update ``(x @ A^T) @ B^T * scaling`` for one projection.

    ``ab`` is a ``train.lora.LoraAB`` (duck-typed here to keep the model
    free of a train-package import) or None.  Computed in ``x``'s dtype
    (bf16 in practice — the QLoRA convention); the rank-r intermediate is
    tiny so the cost is two skinny matmuls per adapted projection.

    BANKED adapters (multi-LoRA serving): ``ab.a [A, r, in]`` /
    ``ab.b [A, out, r]`` with ``adapter_ids [B]`` int32 selecting one
    adapter per batch row (-1 = none -> delta 0).  Row selection is a
    one-hot mask applied to the tiny rank-r intermediate between two
    full-bank einsums — no [B, out, r] gathers ever materialize, the
    bank is read once, and the cost is A x the single-adapter deltas
    (negligible next to the base matmuls for small banks).
    """
    if ab is None:
        return None
    a = ab.a.astype(x.dtype)
    b = ab.b.astype(x.dtype)
    if a.ndim == 2:  # single adapter: a [r, in], b [out, r]
        return jnp.dot(jnp.dot(x, a.T), b.T) * ab.scaling
    assert adapter_ids is not None, "banked LoRA needs adapter_ids [B]"
    n_adapters = a.shape[0]
    sel = (
        adapter_ids[:, None] == jnp.arange(n_adapters, dtype=adapter_ids.dtype)
    ).astype(x.dtype)  # [B, A]
    t = jnp.einsum("bsh,arh->absr", x, a)
    t = t * sel.T[:, :, None, None]
    return jnp.einsum("absr,aor->bso", t, b) * ab.scaling


def _add_delta(y: jax.Array, delta: Optional[jax.Array]) -> jax.Array:
    return y if delta is None else y + delta.astype(y.dtype)


def _quantize_kv(t):
    """[B,KV,S,D] -> (int8 values, fp32 per-token absmax scales [B,KV,S])."""
    tf = t.astype(jnp.float32)
    absmax = jnp.abs(tf).max(axis=-1)
    s = jnp.where(absmax > 0, absmax, jnp.float32(1.0))
    q8 = jnp.round(tf * (127.0 / s)[..., None]).astype(jnp.int8)
    return q8, absmax


def _layer_forward(
    cfg: LlamaConfig,
    x,
    lp: LayerParams,
    layer_cache: KVCache,
    positions,
    seq_lens,
    cos,
    sin,
    reduce_fn=None,
    ll=None,
    train: bool = False,
    segment_ids=None,
    adapter_ids=None,  # [B] int32 — banked multi-LoRA row selection
    window=None,  # per-layer sliding window (traced; Gemma-2 alternation)
    ring_axis=None,  # (mesh axis name, n_shards): sequence-parallel ring
    cache_positions=None,  # [B,S] cache-slot indices when != positions (SP)
):
    """One decoder layer. x: [B,S,H]; returns (x_out, new layer cache).

    ``reduce_fn`` (e.g. a ``psum`` over the tensor-parallel axis) is applied
    to the row-parallel projections (wo, w_down) before the residual add;
    identity when running single-device.

    ``ll`` is an optional per-layer LoRA adapter (``train.lora.LoraLayer``):
    low-rank deltas added to the adapted projections' outputs, in the same
    fused row basis as the packed weights.  ``train=True`` runs the layer
    without a KV cache (attention over this call's own K/V) and forces the
    differentiable attention path — the fine-tuning forward.
    """
    reduce_fn = reduce_fn or (lambda t: t)
    b, s, h = x.shape

    attn_in = rms_norm(x, lp.input_norm, cfg.rms_norm_eps, cfg.rmsnorm_one_plus)
    qkv = _matmul(attn_in, lp.wqkv)  # ONE kernel for q+k+v
    if ll is not None:
        qkv = _add_delta(qkv, _lora_delta(attn_in, ll.qkv, adapter_ids))
    if lp.qkv_bias is not None:
        qkv = qkv + lp.qkv_bias.astype(qkv.dtype)
    q, k, v = split_fused(
        qkv, (cfg.q_dim, cfg.kv_dim, cfg.kv_dim), groups=cfg.tp_shards
    )
    q = q.reshape(b, s, cfg.num_heads, cfg.head_dim)
    k = k.reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
    v = v.reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
    if lp.q_norm is not None:  # Qwen3: per-head RMSNorm before RoPE
        q = rms_norm(q, lp.q_norm, cfg.rms_norm_eps, cfg.rmsnorm_one_plus)
        k = rms_norm(k, lp.k_norm, cfg.rms_norm_eps, cfg.rmsnorm_one_plus)

    q = q.transpose(0, 2, 1, 3)  # [B,H,S,D]
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    # Scatter new K/V into the cache at per-sequence positions.  Under
    # sequence parallelism the cache holds only this shard's slots, so the
    # scatter indices (``cache_positions``, local) differ from the rope/
    # mask ``positions`` (global).
    cpos = positions if cache_positions is None else cache_positions

    def upd(cache, new):
        # cache [B,KV,T,...], new [B,KV,S,...], cpos [B,S]
        def per_seq(c, n, pos):
            return c.at[:, pos].set(n)  # advanced index on the T axis

        return jax.vmap(per_seq)(cache, new, cpos)

    from ..ops.attention import attention

    if train:
        # Fine-tuning forward: attention over this call's own K/V — no
        # cache buffers, no int8 KV rounding, differentiable paths only.
        attn = attention(
            q, k, v, positions, seq_lens,
            scale=cfg.attn_scale,
            sliding_window=window if window is not None else cfg.sliding_window,
            contiguous_positions=True,
            differentiable=True,
            segment_ids=segment_ids,
            logit_softcap=cfg.attn_logit_softcapping,
        )
    else:
        if cfg.kv_quant:
            k8, ks = _quantize_kv(k)
            v8, vs = _quantize_kv(v)
            layer_cache = KVCache(
                k=upd(layer_cache.k, k8),
                v=upd(layer_cache.v, v8),
                k_scale=upd(layer_cache.k_scale, ks),
                v_scale=upd(layer_cache.v_scale, vs),
            )
            k_loc, v_loc, ks_loc, vs_loc = k8, v8, ks, vs
        else:
            layer_cache = KVCache(
                k=upd(layer_cache.k, k.astype(layer_cache.k.dtype)),
                v=upd(layer_cache.v, v.astype(layer_cache.v.dtype)),
            )
            # Attend the same representation the cache stores (bf16 cast).
            k_loc = k.astype(layer_cache.k.dtype)
            v_loc = v.astype(layer_cache.v.dtype)
            ks_loc = vs_loc = None

        if ring_axis is not None:
            # Sequence-parallel prefill: this shard's fresh K/V circulate
            # around the mesh ring; the cache above holds only local slots.
            from ..parallel.sp import ring_attention

            axis_name, n_shards = ring_axis
            attn = ring_attention(
                q, k_loc, v_loc, positions, seq_lens,
                axis=axis_name,
                n_shards=n_shards,
                scale=cfg.attn_scale,
                sliding_window=(
                    window if window is not None else cfg.sliding_window
                ),
                k_scale=ks_loc,
                v_scale=vs_loc,
                logit_softcap=cfg.attn_logit_softcapping,
            )
        else:
            attn = attention(
                q,
                layer_cache.k,
                layer_cache.v,
                positions,
                seq_lens,
                scale=cfg.attn_scale,
                sliding_window=window if window is not None else cfg.sliding_window,
                k_scale=layer_cache.k_scale,
                v_scale=layer_cache.v_scale,
                logit_softcap=cfg.attn_logit_softcapping,
                # Every position tensor this package builds is offset + arange per
                # row (prefill, chunked prefill, engine buckets, decode, eval).
                contiguous_positions=True,
            )
    attn = attn.transpose(0, 2, 1, 3).reshape(b, s, cfg.q_dim)
    # Row-parallel projections: keep partials in fp32 through the TP psum,
    # cast once after the reduction (matches single-device numerics).
    # LoRA deltas on row-parallel projections are added to the PARTIAL
    # product, before the TP reduction: with A sharded on in_features the
    # per-device delta is a partial sum exactly like the base matmul, so
    # one psum reduces both (identity reduce_fn single-device — same math).
    # Without adapters the projection keeps its collective-matmul option
    # (_reduced_matmul + NF4TPU_COLLECTIVE_MATMUL).
    def _post(t, w):
        """Gemma-2 sublayer-output RMSNorm before the residual add."""
        if w is None:
            return t
        return rms_norm(t, w, cfg.rms_norm_eps, cfg.rmsnorm_one_plus)

    if ll is not None and ll.o is not None:
        o_proj = _add_delta(
            _matmul(attn, lp.wo, out_dtype=jnp.float32),
            _lora_delta(attn, ll.o, adapter_ids),
        )
        x = x + _post(reduce_fn(o_proj), lp.post_attn_out_norm).astype(x.dtype)
    else:
        x = x + _post(
            _reduced_matmul(attn, lp.wo, reduce_fn, out_dtype=jnp.float32),
            lp.post_attn_out_norm,
        ).astype(x.dtype)

    mlp_in = rms_norm(x, lp.post_attn_norm, cfg.rms_norm_eps, cfg.rmsnorm_one_plus)
    if cfg.activation == "silu":
        act = jax.nn.silu
    elif cfg.activation == "gelu_tanh":
        act = functools.partial(jax.nn.gelu, approximate=True)
    elif cfg.activation == "gelu":
        act = functools.partial(jax.nn.gelu, approximate=False)
    else:
        raise ValueError(
            f"unknown activation {cfg.activation!r}; silu|gelu|gelu_tanh"
        )

    # MoE predicate is the presence of a router, NOT cfg.num_experts > 1:
    # under expert-parallel sharding the LOCAL expert count can be 1
    # (tp == num_experts) while the MLP is still expert-stacked.
    if lp.router is not None:
        assert ll is None or (ll.gateup is None and ll.down is None), (
            "LoRA on MoE expert MLPs is not supported — adapt the "
            "attention projections (targets=('wqkv', 'wo'))"
        )
        x = x + _post(
            _moe_mlp(cfg, mlp_in, lp, act, reduce_fn), lp.post_ffw_norm
        ).astype(x.dtype)
        return x, layer_cache

    gateup = _matmul(mlp_in, lp.w_gateup)  # ONE kernel for gate+up
    if ll is not None:
        gateup = _add_delta(gateup, _lora_delta(mlp_in, ll.gateup, adapter_ids))
    gate, up = split_fused(
        gateup, (cfg.intermediate_size, cfg.intermediate_size), groups=cfg.tp_shards
    )
    h = act(gate.astype(jnp.float32)).astype(up.dtype) * up
    if ll is not None and ll.down is not None:
        down = _add_delta(
            _matmul(h, lp.w_down, out_dtype=jnp.float32),
            _lora_delta(h, ll.down, adapter_ids),
        )
        x = x + _post(reduce_fn(down), lp.post_ffw_norm).astype(x.dtype)
    else:
        x = x + _post(
            _reduced_matmul(h, lp.w_down, reduce_fn, out_dtype=jnp.float32),
            lp.post_ffw_norm,
        ).astype(x.dtype)
    return x, layer_cache


def _moe_mlp(cfg: LlamaConfig, mlp_in, lp: LayerParams, act, reduce_fn):
    """Mixture-of-experts gated MLP (Mixtral semantics): full softmax over
    router logits, top-``experts_per_token`` selection, weights
    renormalized over the selected experts (equivalently: softmax of the
    selected logits), expert outputs combined by those weights.

    TPU-first evaluation strategy: EVERY token runs through EVERY expert
    under a ``lax.scan`` over the expert axis, masked by the routing
    weights.  At decode batch sizes the MLP is weight-bound — all E packed
    experts stream from HBM once regardless of routing (any expert may be
    hit), so dense evaluation costs the same memory traffic as perfect
    dispatch and avoids data-dependent gather/scatter that XLA cannot
    tile.  At prefill it spends E/k extra MXU FLOPs — the standard
    small-scale TPU MoE trade (dispatch via collectives only pays off
    once experts are sharded over many chips).

    Under tensor parallelism ("tensor" moe_shard) each expert's gate/up
    columns and down K-chunks shard exactly like the dense MLP; under
    "expert" moe_shard the EXPERT axis shards instead — each device scans
    its num_experts/tp full-width local experts, masking by GLOBAL expert
    id (local id + axis_index offset via ``cfg.ep_axis``, router
    replicated).  Either way the psum happens ONCE on the accumulated
    expert sum (partials add across experts/devices before the
    reduction)."""
    router_logits = jnp.dot(
        mlp_in.astype(jnp.float32),
        lp.router.T.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )  # [B, S, E_global] — router is always replicated/full-width
    topv, topi = jax.lax.top_k(router_logits, cfg.experts_per_token)
    if cfg.moe_norm_topk:
        # Renormalized over the selected experts (= softmax of the top-k
        # logits): Mixtral, Qwen3-MoE (norm_topk_prob=true).
        weights = jax.nn.softmax(topv, axis=-1)  # [B, S, k]
    else:
        # norm_topk_prob=false (Qwen1.5/2-MoE-style): the full-softmax
        # probabilities of the selected experts, NOT renormalized.
        weights = jnp.take_along_axis(
            jax.nn.softmax(router_logits, axis=-1), topi, axis=-1
        )
    # Local-to-global expert id offset ("expert" sharding inside shard_map;
    # cfg.num_experts is the LOCAL count there).
    off = (
        jax.lax.axis_index(cfg.ep_axis) * cfg.num_experts
        if cfg.ep_axis is not None
        else 0
    )

    def body(acc, xs):
        e, gu_e, dn_e = xs
        gateup = _matmul(mlp_in, gu_e)
        gate, up = split_fused(
            gateup,
            (cfg.intermediate_size, cfg.intermediate_size),
            groups=cfg.moe_groups,
        )
        h = act(gate.astype(jnp.float32)).astype(up.dtype) * up
        out_e = _matmul(h, dn_e, out_dtype=jnp.float32)
        w_e = jnp.where(topi == e + off, weights, 0.0).sum(axis=-1)  # [B, S]
        return acc + w_e[..., None] * out_e, None

    b, s_len, _ = mlp_in.shape
    out_dim = mlp_in.shape[-1]
    acc0 = jnp.zeros((b, s_len, out_dim), jnp.float32)
    acc, _ = jax.lax.scan(
        body,
        acc0,
        (
            jnp.arange(cfg.num_experts, dtype=jnp.int32),
            lp.w_gateup,
            lp.w_down,
        ),
    )
    return reduce_fn(acc)


# ---------------------------------------------------------------------------
# Entry points


def forward(
    params: LlamaParams,
    cfg: LlamaConfig,
    tokens: jax.Array,  # [B, S] int32
    cache: KVCache,
    positions: jax.Array,  # [B, S] int32 — absolute positions of `tokens`
    seq_lens: jax.Array,  # [B] int32 — total visible length AFTER this step
    reduce_fn=None,
    last_only: bool = False,
    lora=None,
    adapter_ids=None,  # [B] int32 — banked multi-LoRA (see _lora_delta)
    ring_axis=None,  # (axis name, n_shards): SP ring attention (parallel/sp)
    cache_positions=None,  # [B, S] local cache-slot indices (SP prefill)
) -> Tuple[jax.Array, KVCache]:
    """General step: embeds tokens, runs all layers via scan, returns logits.

    Works for prefill (S = prompt length, positions = arange) and decode
    (S = 1, positions = current index per sequence).  Under tensor
    parallelism, ``cfg`` describes the per-device slice (heads /
    intermediate / vocab divided by the TP degree), ``reduce_fn`` is the
    TP psum, and the returned logits cover the local lm_head shard.

    ``last_only=True`` returns logits only for each sequence's last valid
    token ([B, V] instead of [B, S, V]) — serving prefill never needs the
    full-sequence logits, whose [B, S, vocab] fp32 tensor is tens of GB at
    long context (Llama-3 vocab: 8 x 8192 x 128256 fp32 = 33 GB).

    ``lora`` is an optional (unmerged) ``train.lora.LoraParams`` adapter,
    applied on top of the frozen packed weights — single-device / data-
    parallel only (under TP the adapted projections see sharded
    activations; merge adapters via ``train.lora.merge_lora`` to serve
    them TP).
    """
    assert lora is None or reduce_fn is None, (
        "unmerged LoRA adapters cannot run under tensor parallelism; "
        "merge_lora() them into the packed weights first"
    )
    b, s = tokens.shape

    x = params.embed[tokens]  # [B,S,H]
    if cfg.scale_embeddings:  # Gemma: embeddings scaled by sqrt(hidden)
        x = (x.astype(jnp.float32) * (cfg.hidden_size**0.5)).astype(x.dtype)
    cos, sin = rope_tables(cfg, positions)

    # Visibility (cache slot t visible to query position p iff t <= p,
    # t < seq_len, and within the sliding window) is computed chunk-wise
    # inside ops.attention from (positions, seq_lens) — the O(B*S*T) mask
    # tensor is never materialized.

    local_tabs = local_rope_tables(cfg, positions)
    is_local = _layer_is_local(cfg) if local_tabs is not None else None

    def body(x, layer):
        lp, layer_cache, ll, window, loc = layer
        if local_tabs is not None:
            # Gemma-3: local layers rotate with the unscaled local-theta
            # tables; the per-layer flag is a scalar bool from the scan.
            c = jnp.where(loc, local_tabs[0], cos)
            sn = jnp.where(loc, local_tabs[1], sin)
        else:
            c, sn = cos, sin
        x, layer_cache = _layer_forward(
            cfg, x, lp, layer_cache, positions, seq_lens, c, sn, reduce_fn,
            ll=ll, adapter_ids=adapter_ids, window=window,
            ring_axis=ring_axis, cache_positions=cache_positions,
        )
        return x, layer_cache

    # The KVCache struct scans as a pytree: every leaf (k/v and, when
    # quantized, the scale arrays) carries the leading layer axis.  A None
    # lora is an empty subtree — scan passes it through untouched; so is a
    # None per-layer window vector (uniform-window models).
    lora_layers = None if lora is None else lora.layers
    x, new_cache = jax.lax.scan(
        body, x,
        (params.layers, cache, lora_layers, _layer_windows(cfg), is_local),
    )

    if last_only:
        # Row index of each sequence's last written token within this call.
        last_idx = jnp.clip(seq_lens - 1 - positions[:, 0], 0, s - 1)
        x = x[jnp.arange(b), last_idx]  # [B, H]
    x = rms_norm(x, params.final_norm, cfg.rms_norm_eps, cfg.rmsnorm_one_plus)
    if isinstance(params.lm_head, (PackedNF4,)) or not isinstance(
        params.lm_head, jax.Array
    ):
        logits = _matmul(x, params.lm_head, out_dtype=jnp.float32)
    else:
        logits = jnp.dot(
            x, params.lm_head.T.astype(x.dtype), preferred_element_type=jnp.float32
        )
    return _softcap(logits, cfg.final_logit_softcapping), new_cache


def train_forward(
    params: LlamaParams,
    cfg: LlamaConfig,
    tokens: jax.Array,  # [B, S] int32
    lora=None,
    remat: bool = False,
    positions=None,  # [B, S] segment-relative (packed rows); default arange
    segment_ids=None,  # [B, S] example id per slot, -1 = padding
    reduce_fn=None,  # TP psum inside shard_map (train.trainer tp path)
) -> jax.Array:
    """Full-sequence logits for fine-tuning: ``[B, S, V]`` fp32.

    Differs from :func:`prefill` exactly where training requires it — no
    KV cache is allocated or written (each layer attends over its own
    fresh K/V), attention runs only differentiable XLA paths, and
    ``remat=True`` wraps the scanned layer body in :func:`jax.checkpoint`
    so the backward pass rematerializes per-layer activations instead of
    storing all ``L`` of them (the standard depth-for-memory trade; peak
    activation memory drops from O(L*B*S) to O(B*S) + sqrt-free scan
    storage).  Gradients flow to ``lora`` (and any dense leaves of
    ``params``); packed NF4 weights are frozen by construction — their
    custom VJP only propagates to activations.

    Packed rows (``train.data.pack_sft``): ``segment_ids`` makes
    attention block-diagonal (a slot sees only earlier slots of its own
    example) and ``positions`` carries segment-relative RoPE phases.  The
    causal mask itself runs on SLOT indices, which stay ``arange(S)``
    regardless — packing changes which slots match, not slot order.
    """
    b, s = tokens.shape
    x = params.embed[tokens]
    if cfg.scale_embeddings:
        x = (x.astype(jnp.float32) * (cfg.hidden_size**0.5)).astype(x.dtype)
    slot_ids = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (b, s))
    seq_lens = jnp.full((b,), s, dtype=jnp.int32)
    cos, sin = rope_tables(cfg, slot_ids if positions is None else positions)

    def body(x, layer):
        lp, ll, window, loc = layer
        if local_tabs is not None:
            c = jnp.where(loc, local_tabs[0], cos)
            sn = jnp.where(loc, local_tabs[1], sin)
        else:
            c, sn = cos, sin
        x, _ = _layer_forward(
            cfg, x, lp, None, slot_ids, seq_lens, c, sn,
            reduce_fn=reduce_fn, ll=ll, train=True, segment_ids=segment_ids,
            window=window,
        )
        return x, None

    if remat:
        body = jax.checkpoint(body)
    lora_layers = None if lora is None else lora.layers
    local_tabs = local_rope_tables(
        cfg, slot_ids if positions is None else positions
    )
    is_local = _layer_is_local(cfg) if local_tabs is not None else None
    x, _ = jax.lax.scan(
        body, x,
        (params.layers, lora_layers, _layer_windows(cfg), is_local),
    )

    x = rms_norm(x, params.final_norm, cfg.rms_norm_eps, cfg.rmsnorm_one_plus)
    if isinstance(params.lm_head, jax.Array):
        logits = jnp.dot(
            x, params.lm_head.T.astype(x.dtype), preferred_element_type=jnp.float32
        )
    else:
        logits = _matmul(x, params.lm_head, out_dtype=jnp.float32)
    return _softcap(logits, cfg.final_logit_softcapping)


def prefill(params, cfg, tokens, cache=None):
    """Process a full prompt [B, S]; returns (logits [B,S,V], cache)."""
    b, s = tokens.shape
    if cache is None:
        cache = init_kv_cache(cfg, b)
    positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (b, s))
    seq_lens = jnp.full((b,), s, dtype=jnp.int32)
    return forward(params, cfg, tokens, cache, positions, seq_lens)


def prefill_chunked(params, cfg, tokens, cache=None, chunk: int = 2048):
    """Long-context prefill in sequence chunks (bounded activation memory).

    Processes [B, S] in segments of ``chunk`` tokens; each segment attends
    to the cache written by earlier segments (the positions/seq_lens
    contract of :func:`forward` makes this exact).  Peak activation memory
    is O(B * chunk) instead of O(B * S) — at Llama-3-8B, an 8k x 8 prompt's
    fused gate+up activation alone is 3.8 GB bf16, which with the weights
    and KV cache exceeds a v5e chip; chunking bounds it to ~1 GB.

    Returns (last-token logits [B, V], cache).
    """
    b, s = tokens.shape
    if cache is None:
        cache = init_kv_cache(cfg, b)
    logits = None
    for off in range(0, s, chunk):
        seg = tokens[:, off : off + chunk]
        width = seg.shape[1]
        positions = jnp.broadcast_to(
            off + jnp.arange(width, dtype=jnp.int32), (b, width)
        )
        seq_lens = jnp.full((b,), off + width, dtype=jnp.int32)
        logits, cache = forward(
            params, cfg, seg, cache, positions, seq_lens, last_only=True
        )
    return logits, cache


def decode_step(
    params, cfg, token: jax.Array, cache: KVCache, positions: jax.Array,
    lora=None, adapter_ids=None,
):
    """One token per sequence. token [B], positions [B] (index being written).

    ``lora``/``adapter_ids``: optional multi-LoRA bank + per-slot adapter
    selection (serve.engine multi-adapter serving).  Returns
    (logits [B, V], cache).
    """
    tokens = token[:, None]
    pos2 = positions[:, None]
    seq_lens = positions + 1
    logits, cache = forward(
        params, cfg, tokens, cache, pos2, seq_lens,
        lora=lora, adapter_ids=adapter_ids,
    )
    return logits[:, 0, :], cache
