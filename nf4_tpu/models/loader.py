"""Checkpoint loading: HF safetensors -> quantized LlamaParams.

The reference package consumes weights already quantized in-process by
bitsandbytes (no loading/saving of its own, SURVEY.md §5 "checkpoint /
resume: absent").  The TPU build supplies the full path: load a dense HF
Llama checkpoint from local safetensors shards, quantize each linear to NF4
(bit-exact bnb semantics via the oracle), and also save/load the *packed*
TPU format so a model is quantized once and reloaded fast.

Pre-quantized bitsandbytes-serialized checkpoints ("*-bnb-4bit": packed
uint8 weights + quant-state sidecar tensors) load through the same
``load_hf_llama`` — detected per tensor, grouped via ``nf4.bnb_checkpoint``,
and REPACKED into the TPU layout without requantization.
"""

from __future__ import annotations

import json
import os
import re
from typing import Dict, Iterator, Optional, Tuple

import numpy as np

from ..nf4.bnb_checkpoint import (
    BnbWeightGroup,
    is_bnb_sidecar,
    qdense_from_group,
)
from ..nf4.format import QDense
from .llama import LlamaConfig, LlamaParams


def config_to_dict(cfg: LlamaConfig) -> Dict:
    """JSON-serializable dict of a LlamaConfig (for checkpoint metadata).

    ``dtype`` becomes its numpy name; ``ep_axis`` (runtime-only, set inside
    shard_map by ``parallel.tp.tp_local_config``) is dropped.
    """
    import dataclasses

    out = {}
    for f in dataclasses.fields(LlamaConfig):
        if f.name == "ep_axis":
            continue
        v = getattr(cfg, f.name)
        if f.name == "dtype":
            v = np.dtype(v).name
        out[f.name] = v
    return out


def config_from_dict(d: Dict) -> LlamaConfig:
    """Inverse of :func:`config_to_dict` (tolerates JSON round-tripping:
    lists become tuples, dtype name becomes the jnp type)."""
    import jax.numpy as jnp

    def detuple(v):
        return tuple(detuple(x) for x in v) if isinstance(v, (list, tuple)) else v

    dtypes = {"bfloat16": jnp.bfloat16, "float16": jnp.float16, "float32": jnp.float32}
    kwargs = {}
    import dataclasses

    known = {f.name for f in dataclasses.fields(LlamaConfig)}
    for k, v in d.items():
        if k not in known:
            continue  # forward compat: ignore fields this build doesn't know
        if k == "dtype":
            v = dtypes[v]
        elif isinstance(v, list):
            v = detuple(v)
        kwargs[k] = v
    return LlamaConfig(**kwargs)


def _rows(t, r0: int, r1: int):
    """Out-feature row slice for dense arrays and QDense alike."""
    return t.rows(r0, r1) if isinstance(t, QDense) else t[r0:r1]

__all__ = [
    "load_hf_llama",
    "save_packed",
    "load_packed",
    "load_packed_auto",
    "hf_config_to_llama",
    "config_to_dict",
    "config_from_dict",
]


def _parse_rope_scaling(rs, ckpt_max=None):
    """HF ``rope_scaling`` dict -> the hashable LlamaConfig tuple.

    Handles the "llama3" scheme (Llama-3.1/3.2) and "linear"; "default"/
    None pass through.  Unknown schemes (yarn, longrope, dynamic) raise —
    silently ignoring them would load a checkpoint with wrong long-range
    attention."""
    if not rs:
        return None
    kind = str(rs.get("rope_type", rs.get("type", ""))).lower()
    if kind in ("", "default"):
        return None
    if kind == "linear":
        return ("linear", float(rs["factor"]))
    if kind == "llama3":
        return (
            "llama3",
            float(rs["factor"]),
            float(rs["low_freq_factor"]),
            float(rs["high_freq_factor"]),
            int(rs["original_max_position_embeddings"]),
        )
    if kind == "longrope":
        orig = int(rs["original_max_position_embeddings"])
        # The attention factor comes from the CHECKPOINT's full context
        # (hf max_position_embeddings), not the serving cap — HF derives
        # it once from the config regardless of runtime length.
        af = rs.get("attention_factor")
        if af is None:
            import math

            scale = max(1.0, float(ckpt_max or orig) / orig)
            af = (
                1.0
                if scale == 1.0
                else math.sqrt(1.0 + math.log(scale) / math.log(orig))
            )
        return (
            "longrope",
            tuple(float(f) for f in rs["short_factor"]),
            tuple(float(f) for f in rs["long_factor"]),
            orig,
            float(af),
        )
    raise ValueError(
        f"unsupported rope_scaling type {kind!r} "
        "(supported: llama3, linear, longrope)"
    )


def hf_config_to_llama(cfg_path: str, **overrides) -> LlamaConfig:
    """Translate an HF ``config.json`` into a LlamaConfig."""
    with open(cfg_path) as f:
        hf = json.load(f)
    head_dim = hf.get("head_dim") or hf["hidden_size"] // hf["num_attention_heads"]
    kwargs = dict(
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        intermediate_size=hf["intermediate_size"],
        num_layers=hf["num_hidden_layers"],
        num_heads=hf["num_attention_heads"],
        num_kv_heads=hf.get("num_key_value_heads", hf["num_attention_heads"]),
        head_dim=head_dim,
        rope_theta=float(hf.get("rope_theta", 10000.0)),
        rope_scaling=_parse_rope_scaling(
            hf.get("rope_scaling"), hf.get("max_position_embeddings")
        ),
        num_experts=int(
            hf.get("num_local_experts") or hf.get("num_experts") or 1
        ),
        experts_per_token=int(hf.get("num_experts_per_tok", 2) or 2),
        # HF norm_topk_prob (Qwen-MoE family): absent means the Mixtral
        # convention (renormalize over the selected experts).
        moe_norm_topk=bool(hf.get("norm_topk_prob", True)),
        rms_norm_eps=float(hf.get("rms_norm_eps", 1e-5)),
        attn_bias=bool(hf.get("attention_bias", False))
        or hf.get("model_type") == "qwen2",
        qk_norm=hf.get("model_type") in ("qwen3", "qwen3_moe"),
        max_seq_len=min(int(hf.get("max_position_embeddings", 2048)), 8192),
        sliding_window=(
            int(hf["sliding_window"]) if hf.get("sliding_window") else None
        ),
    )
    # Gemma conventions: GeGLU, (1+w) RMSNorm, sqrt(hidden) embed scale.
    # Map tanh-approximate GELU names to gelu_tanh and exact gelu names to
    # gelu (exact); anything else gelu-like is an error rather than a silent
    # approximation swap.
    act = hf.get("hidden_act") or hf.get("hidden_activation") or ""
    is_gemma = hf.get("model_type") in (
        "gemma", "gemma2", "gemma3", "gemma3_text"
    )
    if hf.get("model_type") in ("gemma3", "gemma3_text"):
        kwargs.update(
            # Gemma-3: 5 local layers per global one, dual rope (local
            # layers at rope_local_base_freq unscaled; global layers at
            # rope_theta with the config's rope_scaling), q/k head norms,
            # no softcapping, Gemma-2-style 4-norm blocks.
            sliding_window_pattern=int(hf.get("sliding_window_pattern", 6)),
            rope_local_theta=float(hf.get("rope_local_base_freq", 10000.0)),
            qk_norm=True,
            query_pre_attn_scalar=float(hf["query_pre_attn_scalar"])
            if hf.get("query_pre_attn_scalar")
            else None,
        )
    if hf.get("model_type") == "gemma2":
        def _capval(key, default):
            # Present-but-null/0 means EXPLICITLY DISABLED; defaults
            # apply only when the key is absent.
            if key in hf:
                v = hf[key]
                return None if not v else float(v)
            return default

        qpas = hf.get(
            "query_pre_attn_scalar",
            hf["hidden_size"] / hf["num_attention_heads"],
        )
        kwargs.update(
            attn_logit_softcapping=_capval("attn_logit_softcapping", 50.0),
            final_logit_softcapping=_capval("final_logit_softcapping", 30.0),
            query_pre_attn_scalar=float(qpas) if qpas else None,
            # Gemma-2 alternates local/global attention every other layer.
            sliding_window_pattern=2,
        )
    if is_gemma or "gelu" in act:
        # HF naming: gelu_pytorch_tanh / gelu_tanh / gelu_new / gelu_fast are
        # all tanh-family approximations; bare "gelu" / "gelu_python" are the
        # exact erf form.
        if is_gemma or act in (
            "gelu_pytorch_tanh", "gelu_tanh", "gelu_new", "gelu_fast"
        ):
            activation = "gelu_tanh"
        elif act in ("gelu", "gelu_python"):
            activation = "gelu"
        else:
            raise ValueError(f"unsupported hidden_act {act!r}")
        kwargs.update(
            activation=activation,
            rmsnorm_one_plus=is_gemma,
            scale_embeddings=is_gemma,
        )
    if kwargs["num_experts"] > 1:
        # Qwen3-MoE: per-expert MLP width is moe_intermediate_size (the
        # top-level intermediate_size is the dense width, unused when every
        # layer is sparse).  Mixed dense/sparse stacks and shared experts
        # (Qwen2-MoE) are not supported — fail loudly, not wrongly.
        if hf.get("moe_intermediate_size"):
            kwargs["intermediate_size"] = int(hf["moe_intermediate_size"])
        if hf.get("shared_expert_intermediate_size"):
            raise ValueError(
                "shared-expert MoE (Qwen2-MoE style) is not supported"
            )
        if hf.get("mlp_only_layers"):
            raise ValueError(
                "mixed dense/sparse layer stacks (mlp_only_layers) are "
                "not supported"
            )
        # HF Qwen-MoE: decoder_sparse_step > 1 makes a layer dense unless
        # (idx+1) % step == 0; treating such a stack as all-sparse would
        # make the streaming loader wait forever for expert keys that the
        # dense layers don't have.  Fail loudly, not obscurely.
        if int(hf.get("decoder_sparse_step", 1) or 1) != 1:
            raise ValueError(
                "mixed dense/sparse layer stacks (decoder_sparse_step > 1) "
                "are not supported"
            )
    # Pre-quantized checkpoints: transformers records the bitsandbytes
    # setup under quantization_config; the safetensors then carry packed
    # uint8 weights + quant-state sidecars (nf4.bnb_checkpoint), which
    # load_hf_llama repacks WITHOUT requantizing.  bnb_4bit_quant_type
    # defaults to "fp4" (bitsandbytes' default codebook).
    qc = hf.get("quantization_config")
    if qc:
        method = str(qc.get("quant_method", "bitsandbytes")).lower()
        if method != "bitsandbytes":
            raise ValueError(
                f"unsupported quantization_config quant_method {method!r} "
                "(only bitsandbytes 4-bit checkpoints are supported)"
            )
        if qc.get("load_in_8bit") or qc.get("_load_in_8bit"):
            raise ValueError(
                "bitsandbytes 8-bit (LLM.int8) checkpoints are not "
                "supported — only 4-bit (nf4/fp4)"
            )
        if not (qc.get("load_in_4bit") or qc.get("_load_in_4bit")):
            raise ValueError(
                "quantization_config is present but load_in_4bit is not "
                "set; cannot tell how the checkpoint was quantized"
            )
        kwargs["quant_type"] = str(
            qc.get("bnb_4bit_quant_type") or "fp4"
        ).lower()
    kwargs.update(overrides)
    return LlamaConfig(**kwargs)


def _iter_safetensors(model_dir: str) -> Iterator[Tuple[str, np.ndarray]]:
    from safetensors import safe_open

    files = sorted(
        f for f in os.listdir(model_dir) if f.endswith(".safetensors")
    )
    if not files:
        raise FileNotFoundError(f"no .safetensors files in {model_dir}")
    for fname in files:
        with safe_open(os.path.join(model_dir, fname), framework="np") as f:
            for key in f.keys():
                yield key, f.get_tensor(key)


_HF_LAYER_RE = re.compile(r"model\.layers\.(\d+)\.(.+)")
_HF_EXPERT_RE = re.compile(
    r"block_sparse_moe\.experts\.(\d+)\.w([123])\.weight"
)
_EXPERT_W = {"1": "w_gate", "2": "w_down", "3": "w_up"}
# Qwen3-MoE (and OLMoE-style) expert naming: mlp.experts.N.{gate,up,down}_proj.
_HF_QWEN_EXPERT_RE = re.compile(
    r"mlp\.experts\.(\d+)\.(gate|up|down)_proj\.weight"
)

_HF_TO_OURS = {
    "self_attn.q_proj.weight": "wq",
    "self_attn.k_proj.weight": "wk",
    "self_attn.v_proj.weight": "wv",
    "self_attn.o_proj.weight": "wo",
    "mlp.gate_proj.weight": "w_gate",
    "mlp.up_proj.weight": "w_up",
    "mlp.down_proj.weight": "w_down",
    # Mixtral MoE router; per-expert weights are matched by
    # _HF_EXPERT_RE below (w1=gate, w3=up, w2=down).
    "block_sparse_moe.gate.weight": "router",
    # Qwen3-MoE router (experts matched by _HF_QWEN_EXPERT_RE).
    "mlp.gate.weight": "router",
    # Qwen3 per-head q/k norms.
    "self_attn.q_norm.weight": "q_norm",
    "self_attn.k_norm.weight": "k_norm",
    "input_layernorm.weight": "input_norm",
    "post_attention_layernorm.weight": "post_attn_norm",
    # Qwen2-style attention biases (optional; required iff cfg.attn_bias).
    "self_attn.q_proj.bias": "bq",
    "self_attn.k_proj.bias": "bk",
    "self_attn.v_proj.bias": "bv",
}
_BIAS_KEYS = {"bq", "bk", "bv"}


def load_hf_llama(
    model_dir: str,
    cfg: LlamaConfig | None = None,
    stats: Dict | None = None,
) -> Tuple[LlamaParams, LlamaConfig]:
    """Load a local HF Llama checkpoint directory and quantize to NF4,
    STREAMING: each layer is quantized (and its dense tensors freed) as soon
    as its last tensor has been read, so peak host memory is

        packed output (~m*n*0.5625 bytes total)
      + one dense layer being quantized (fp32 transient)
      + embed / lm_head / norms,

    NOT the whole dense checkpoint.  Llama-3-70B math: dense fp16 = ~141 GB,
    of which the streaming path holds at most one decoder layer at a time
    (~1.6 GB fp16, ~3.3 GB as the fp32 quantizer transient) on top of the
    ~40 GB packed output and ~4.2 GB embed+lm_head — ~48 GB peak instead of
    ~180 GB.  (Multi-host serving additionally wants per-host shard loading;
    the packed output here is the full model, which each host can slice
    after ``repack_tp``.)

    Reads ``config.json`` + ``*.safetensors``; tied embeddings are handled
    (lm_head falls back to the embedding matrix when absent).  ``stats``,
    when given, is filled with ``peak_dense_bytes`` (max bytes of dense
    layer tensors simultaneously resident) and ``total_dense_bytes`` — the
    bounded-memory contract the tests pin down.
    """
    if cfg is None:
        cfg = hf_config_to_llama(os.path.join(model_dir, "config.json"))

    from .llama import quantize_layer

    required = set(_HF_TO_OURS.values())
    if not cfg.attn_bias:
        required -= _BIAS_KEYS
    # Gemma-2 blocks carry FOUR norms; crucially HF's
    # post_attention_layernorm is the attention-OUTPUT norm there, while
    # this struct's post_attn_norm has always been the MLP PRE-norm
    # (= Gemma-2's pre_feedforward_layernorm).
    # Gemma-2 marker: 4-norm blocks ride with EITHER convention (a
    # checkpoint may explicitly disable softcapping but always alternates
    # attention).
    gemma2 = (
        cfg.attn_logit_softcapping is not None
        or cfg.sliding_window_pattern > 1
    )
    if gemma2:
        required |= {"post_attn_out_norm", "post_ffw_norm"}
    if not cfg.qk_norm:
        required -= {"q_norm", "k_norm"}
    if cfg.num_experts > 1:
        # MoE checkpoints have per-expert MLP tensors instead of the
        # dense mlp.* keys, plus the router.
        required -= {"w_gate", "w_up", "w_down"}
        required |= {
            f"expert{e}.{w}"
            for e in range(cfg.num_experts)
            for w in ("w_gate", "w_up", "w_down")
        }
    else:
        required -= {"router"}

    layer_weights: Dict[int, Dict[str, np.ndarray]] = {}
    built: Dict[int, object] = {}  # layer idx -> quantized LayerParams
    embed = final_norm = lm_head = None
    dense_bytes = 0
    peak_dense = 0
    total_dense = 0

    def route(key, tensor):
        """Dispatch one logical tensor (dense ndarray, or a QDense decoded
        from a bitsandbytes sidecar group) to its slot."""
        nonlocal embed, final_norm, lm_head
        nonlocal dense_bytes, peak_dense, total_dense
        if key == "model.embed_tokens.weight":
            if isinstance(tensor, QDense):
                raise ValueError("quantized embeddings are not supported")
            embed = tensor
        elif key == "model.norm.weight":
            final_norm = tensor
        elif key == "lm_head.weight":
            lm_head = tensor  # QDense fine: _lm_head keeps it packed
        else:
            m = _HF_LAYER_RE.match(key)
            if not m:
                return
            idx, sub = int(m.group(1)), m.group(2)
            if gemma2:
                sub = {
                    "post_attention_layernorm.weight": "__post_attn_out__",
                    "pre_feedforward_layernorm.weight": (
                        "post_attention_layernorm.weight"
                    ),
                    "post_feedforward_layernorm.weight": "__post_ffw__",
                }.get(sub, sub)
            ours = _HF_TO_OURS.get(sub)
            if ours is None and sub == "__post_attn_out__":
                ours = "post_attn_out_norm"
            elif ours is None and sub == "__post_ffw__":
                ours = "post_ffw_norm"
            if ours is None:
                me = _HF_EXPERT_RE.match(sub)
                if me:
                    ours = f"expert{int(me.group(1))}.{_EXPERT_W[me.group(2)]}"
                else:
                    me = _HF_QWEN_EXPERT_RE.match(sub)
                    if me:
                        ours = f"expert{int(me.group(1))}.w_{me.group(2)}"
            # Phi-3 ships q/k/v and gate/up PRE-FUSED (plain [q;k;v] /
            # [gate;up] row concat); split here so the pack-time
            # tp-interleaved fusion sees separate tensors.
            pieces = None
            if ours is not None:
                pieces = {ours: tensor}
            elif sub == "self_attn.qkv_proj.weight":
                q_dim = cfg.num_heads * cfg.head_dim
                kv_dim = cfg.num_kv_heads * cfg.head_dim
                pieces = {
                    "wq": _rows(tensor, 0, q_dim),
                    "wk": _rows(tensor, q_dim, q_dim + kv_dim),
                    "wv": _rows(tensor, q_dim + kv_dim, tensor.shape[0]),
                }
            elif sub == "mlp.gate_up_proj.weight":
                inter = tensor.shape[0] // 2
                pieces = {
                    "w_gate": _rows(tensor, 0, inter),
                    "w_up": _rows(tensor, inter, tensor.shape[0]),
                }
            if pieces is None or idx >= cfg.num_layers:
                return
            lw = layer_weights.setdefault(idx, {})
            lw.update(pieces)
            dense_bytes += tensor.nbytes
            total_dense += tensor.nbytes
            peak_dense = max(peak_dense, dense_bytes)
            if required <= set(lw):
                # Layer complete: quantize NOW and free the dense tensors.
                built[idx] = quantize_layer(lw, cfg)
                dense_bytes -= tensor.nbytes
                for name, a in lw.items():
                    if name not in pieces:
                        dense_bytes -= a.nbytes
                del layer_weights[idx]

    # bitsandbytes-serialized checkpoints: a quantized Linear arrives as a
    # packed uint8 ".weight" plus sidecar tensors (absmax / nested stats /
    # quant_state JSON blob), possibly split across files.  Group them and
    # route the decoded QDense once complete — codes pass through to the
    # TPU packed layout untouched (no requantization).
    pending: Dict[str, BnbWeightGroup] = {}

    def _bnb_add(base, part, tensor):
        group = pending.setdefault(base, BnbWeightGroup(base))
        group.add(part, tensor)
        if group.complete():
            del pending[base]
            route(base, qdense_from_group(group))

    for key, tensor in _iter_safetensors(model_dir):
        tensor = np.asarray(tensor)
        side = is_bnb_sidecar(key)
        if side is not None:
            _bnb_add(side[0], side[1], tensor)
        elif tensor.dtype == np.uint8 and key.endswith(".weight"):
            _bnb_add(key, "weight", tensor)
        else:
            route(key, tensor)

    if pending:
        raise ValueError(
            "incomplete bitsandbytes weight groups (missing sidecar "
            f"tensors): {sorted(pending)[:4]}"
        )
    if embed is None or final_norm is None:
        raise ValueError(f"checkpoint at {model_dir} missing embed/final norm")
    if lm_head is None:
        lm_head = embed  # tied embeddings

    missing_layers = sorted(set(range(cfg.num_layers)) - set(built))
    if missing_layers:
        i = missing_layers[0]
        have = set(layer_weights.get(i, {}))
        raise ValueError(f"layer {i} missing tensors: {sorted(required - have)}")

    if stats is not None:
        stats["peak_dense_bytes"] = peak_dense
        stats["total_dense_bytes"] = total_dense

    import jax

    import jax.numpy as jnp

    from .llama import _lm_head

    stacked = jax.tree.map(
        lambda *xs: jnp.stack(xs), *[built[i] for i in range(cfg.num_layers)]
    )
    params = LlamaParams(
        embed=jnp.asarray(embed, dtype=cfg.dtype),
        layers=stacked,
        final_norm=jnp.asarray(final_norm, dtype=jnp.float32),
        lm_head=_lm_head(lm_head, cfg),
    )
    return params, cfg


# ---------------------------------------------------------------------------
# Packed-format persistence (quantize once, reload fast)


_LINEAR_FIELDS = ("wqkv", "wo", "w_gateup", "w_down")
_NORM_FIELDS = ("input_norm", "post_attn_norm")


def save_packed(path: str, params: LlamaParams, cfg: LlamaConfig) -> None:
    """Persist quantized params (packed bytes + scales) to disk.

    Format by extension: ``.safetensors`` writes a safetensors file
    (zero-copy mmap loading, native bf16, ecosystem-standard); anything
    else writes an ``.npz`` archive (bf16 stored as uint16 bit patterns).

    Explicit per-field schema either way: ``layers.<name>.packed`` /
    ``.scales`` for quantized linears (stacked over the layer axis),
    ``layers.<name>`` for norms, top-level ``embed`` / ``final_norm`` /
    ``lm_head``.
    """
    from ..nf4.format import PackedNF4

    arrays: Dict[str, np.ndarray] = {
        "embed": np.asarray(params.embed),
        "final_norm": np.asarray(params.final_norm),
    }
    shapes: Dict[str, Tuple[int, int]] = {}
    shards: Dict[str, int] = {}
    quant_types: Dict[str, str] = {}
    if isinstance(params.lm_head, PackedNF4):
        arrays["lm_head.packed"] = np.asarray(params.lm_head.packed)
        arrays["lm_head.scales"] = np.asarray(params.lm_head.scales)
        shapes["lm_head"] = list(params.lm_head.shape)
        shards["lm_head"] = params.lm_head.shards
        quant_types["lm_head"] = params.lm_head.quant_type
    else:
        arrays["lm_head"] = np.asarray(params.lm_head)
    for name in _LINEAR_FIELDS:
        w = getattr(params.layers, name)
        if isinstance(w, PackedNF4):
            arrays[f"layers.{name}.packed"] = np.asarray(w.packed)
            arrays[f"layers.{name}.scales"] = np.asarray(w.scales)
            shapes[name] = list(w.shape)
            shards[name] = w.shards
            quant_types[name] = w.quant_type
        else:
            arrays[f"layers.{name}"] = np.asarray(w)
    for name in _NORM_FIELDS:
        arrays[f"layers.{name}"] = np.asarray(getattr(params.layers, name))
    if params.layers.qkv_bias is not None:
        arrays["layers.qkv_bias"] = np.asarray(params.layers.qkv_bias)
    if params.layers.router is not None:
        arrays["layers.router"] = np.asarray(params.layers.router)
    for name in ("post_attn_out_norm", "post_ffw_norm", "q_norm", "k_norm"):
        w = getattr(params.layers, name)
        if w is not None:
            arrays[f"layers.{name}"] = np.asarray(w)

    meta = {
        "shapes": shapes,
        "shards": shards,
        "quant_types": quant_types,
        "dtypes": {},
        "dtype": str(np.dtype(cfg.dtype).name),
        # Full architecture config: makes the artifact self-describing —
        # load_packed_auto() reconstructs the LlamaConfig from here.
        "config": config_to_dict(cfg),
    }

    if path.endswith(".safetensors"):
        from safetensors.numpy import save_file

        save_file(
            {k: np.ascontiguousarray(v) for k, v in arrays.items()},
            path,
            metadata={"nf4_tpu": json.dumps(meta)},
        )
        return

    # np.savez has no bfloat16 support: store such arrays as uint16 bit
    # patterns and record the true dtype.
    for key, arr in list(arrays.items()):
        if arr.dtype.names is None and str(arr.dtype) == "bfloat16":
            arrays[key] = arr.view(np.uint16)
            meta["dtypes"][key] = "bfloat16"

    np.savez(path, __meta__=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8), **arrays)


def _read_packed(path: str):
    """Read a save_packed artifact -> (data dict, meta dict)."""
    import ml_dtypes

    if path.endswith(".safetensors"):
        from safetensors import safe_open

        with safe_open(path, framework="np") as f:
            meta = json.loads(f.metadata()["nf4_tpu"])
            data = {k: f.get_tensor(k) for k in f.keys()}
        return data, meta

    with np.load(path, allow_pickle=False) as data:
        meta = json.loads(bytes(data["__meta__"]).decode())
        data = {k: data[k] for k in data.files if k != "__meta__"}
    for key, arr in list(data.items()):
        if meta["dtypes"].get(key) == "bfloat16":
            data[key] = arr.view(ml_dtypes.bfloat16)
    return data, meta


def load_packed(path: str, cfg: LlamaConfig) -> LlamaParams:
    """Reload params saved by :func:`save_packed` (.npz or .safetensors)."""
    data, meta = _read_packed(path)
    return _assemble_packed(data, meta, cfg)


def load_packed_auto(path: str, **overrides) -> Tuple[LlamaParams, LlamaConfig]:
    """Reload a packed checkpoint AND its architecture config.

    The artifact is self-describing (``save_packed`` embeds the full
    LlamaConfig in the metadata), so no model name or HF config is needed.
    ``overrides`` are serving-time knobs applied on top (e.g.
    ``kv_quant=True``, ``max_seq_len=4096``).
    """
    data, meta = _read_packed(path)
    if "config" not in meta:
        raise ValueError(
            f"{path} predates self-describing checkpoints (no 'config' in "
            "metadata) — use load_packed(path, cfg) with the model's "
            "LlamaConfig instead"
        )
    cfg = config_from_dict(meta["config"])
    if overrides:
        import dataclasses

        cfg = dataclasses.replace(cfg, **overrides)
    return _assemble_packed(data, meta, cfg), cfg


class _LazySafetensorEntry:
    """Shape-carrying handle over one safetensors tensor; ``entry[idx]``
    reads ONLY the requested byte range from the (mmapped) file."""

    __slots__ = ("_slice", "shape", "ndim", "stats", "key")

    def __init__(self, sl, key, stats=None):
        self._slice = sl
        self.shape = tuple(sl.get_shape())
        self.ndim = len(self.shape)
        self.key = key
        self.stats = stats

    def __getitem__(self, idx):
        if self.stats is not None:
            self.stats.setdefault(self.key, []).append(idx)
        return self._slice[idx]


class _LazyNpzEntry:
    """Lazy .npz member: shape comes from the array header; ``entry[idx]``
    decompresses the WHOLE member then slices (npz has no partial reads —
    peak host memory is one full tensor, not the checkpoint)."""

    __slots__ = ("_zf", "_name", "shape", "ndim", "_view_dtype", "stats", "key")

    def __init__(self, zf, name, view_dtype=None, stats=None):
        self._zf = zf
        self._name = name
        with zf.open(name) as f:
            version = np.lib.format.read_magic(f)
            # Public per-version header readers (the private
            # _read_array_header has changed signature across numpy
            # releases; these are the stable API for the same job).
            if version == (1, 0):
                shape, _, _ = np.lib.format.read_array_header_1_0(f)
            elif version == (2, 0):
                shape, _, _ = np.lib.format.read_array_header_2_0(f)
            else:
                # Self-written members are always 1.0; a hard error beats
                # silently parsing e.g. a (3,0) utf8 header as 2.0.
                raise ValueError(
                    f"unsupported .npy format version {version} for "
                    f"member {name!r}"
                )
        self.shape = tuple(shape)
        self.ndim = len(self.shape)
        self._view_dtype = view_dtype
        self.key = name[:-4] if name.endswith(".npy") else name
        self.stats = stats

    def __getitem__(self, idx):
        if self.stats is not None:
            self.stats.setdefault(self.key, []).append(idx)
        with self._zf.open(self._name) as f:
            arr = np.lib.format.read_array(f, allow_pickle=False)
        if self._view_dtype is not None:
            arr = arr.view(self._view_dtype)
        return arr[idx]


def load_packed_sharded(
    path: str,
    mesh,
    axis: str = "tp",
    read_stats: Optional[Dict] = None,
    **overrides,
) -> Tuple[LlamaParams, LlamaConfig]:
    """Load a packed checkpoint DIRECTLY onto a device mesh, shard-on-read.

    The multi-host / large-model loading path: instead of materializing the
    whole checkpoint on every host and ``device_put``-sharding it afterwards
    (peak host RAM = full checkpoint per host), every leaf is created with
    :func:`jax.make_array_from_callback` under its tensor-parallel
    :func:`~nf4_tpu.parallel.tp.param_specs` sharding, and the callback
    reads ONLY the slices this host's devices own — via safetensors
    ``get_slice`` (mmapped partial reads) or per-member .npz decompression.
    A Llama-3-70B checkpoint (~37 GB packed) on an 8-host tp=8 slice reads
    ~4.6 GB per host instead of 8 x 37 GB.

    The checkpoint must already be packed for ``mesh.shape[axis]``
    (``python -m nf4_tpu.quantize --tp N`` or
    :func:`~nf4_tpu.parallel.tp.repack_tp` + :func:`save_packed`): the fused
    column-parallel interleave is a global permutation, which cannot be
    applied slice-locally on read.

    Returns ``(params, cfg)`` exactly like :func:`load_packed_auto`, except
    every leaf is a global :class:`jax.Array` sharded over ``mesh`` — the
    :class:`~nf4_tpu.serve.engine.Engine`'s own ``shard_params`` then
    recognizes the shardings and moves no bytes.  ``read_stats`` (tests)
    collects the index tuples actually read per tensor key.

    The reference has no checkpoint system at all (SURVEY.md §5) — its
    weights arrive pre-quantized in bitsandbytes modules.
    """
    import jax
    from jax.sharding import NamedSharding

    from ..parallel.tp import param_specs

    if path.endswith(".safetensors"):
        from safetensors import safe_open

        handle = safe_open(path, framework="np")
    else:
        import zipfile

        handle = zipfile.ZipFile(path, "r")

    try:
        if path.endswith(".safetensors"):
            meta = json.loads(handle.metadata()["nf4_tpu"])
            data = {
                k: _LazySafetensorEntry(handle.get_slice(k), k, read_stats)
                for k in handle.keys()
            }
        else:
            import ml_dtypes

            names = [n for n in handle.namelist() if n.endswith(".npy")]
            with handle.open("__meta__.npy") as f:
                meta_arr = np.lib.format.read_array(f, allow_pickle=False)
            meta = json.loads(bytes(meta_arr).decode())
            data = {}
            for name in names:
                key = name[:-4]
                if key == "__meta__":
                    continue
                view = (
                    ml_dtypes.bfloat16
                    if meta["dtypes"].get(key) == "bfloat16"
                    else None
                )
                data[key] = _LazyNpzEntry(handle, name, view, read_stats)

        if "config" not in meta:
            raise ValueError(
                f"{path} predates self-describing checkpoints (no 'config' "
                "in metadata) — quantize/save it again, or use load_packed"
            )
        cfg = config_from_dict(meta["config"])
        if overrides:
            import dataclasses

            cfg = dataclasses.replace(cfg, **overrides)
        tp = mesh.shape[axis]
        if tp > 1 and cfg.tp_shards != tp:
            raise ValueError(
                f"checkpoint is packed for tp_shards={cfg.tp_shards} but the "
                f"mesh has {axis}={tp}; shard-on-read needs a matching pack "
                f"(python -m nf4_tpu.quantize --tp {tp}, or repack_tp + "
                "save_packed), or load eagerly and repack_tp in memory"
            )

        # Leaves stay lazy through assembly; specs anchor on trailing dims,
        # so the lazy entries only need .shape/.ndim.
        skeleton = _assemble_packed(data, meta, cfg, wrap=lambda x: x)
        specs = param_specs(skeleton, axis, cfg.moe_shard)

        def materialize(entry, spec):
            sharding = NamedSharding(mesh, spec)
            # The callback fires once per addressable device; replicated
            # slices (dp replicas, norms/embed) would otherwise be re-read
            # per device.  Memoize per distinct index within this leaf.
            memo = {}

            def read(idx):
                key = tuple((s.start, s.stop, s.step) for s in idx)
                if key not in memo:
                    memo[key] = np.ascontiguousarray(entry[idx])
                return memo[key]

            return jax.make_array_from_callback(entry.shape, sharding, read)

        return jax.tree.map(materialize, skeleton, specs), cfg
    finally:
        if hasattr(handle, "close"):
            handle.close()


def _assemble_packed(data, meta, cfg: LlamaConfig, wrap=None) -> LlamaParams:
    import jax.numpy as jnp

    from ..nf4.format import PackedNF4
    from .llama import LayerParams

    if wrap is None:
        wrap = jnp.asarray

    def get(key):
        return wrap(data[key])

    # Older checkpoints predate the "shards" / "quant_types" meta fields;
    # they were only ever written with shards=1, quant_type="nf4".
    meta_shards = meta.get("shards", {})
    meta_qt = meta.get("quant_types", {})

    def packed_weight(key_base, meta_name):
        packed = get(f"{key_base}.packed")
        scales = get(f"{key_base}.scales")
        m, n = meta["shapes"][meta_name]
        return PackedNF4(
            packed=packed,
            scales=scales,
            shape=(m, n),
            padded_shape=(packed.shape[-1], 2 * packed.shape[-2]),
            dtype=jnp.dtype(cfg.dtype),
            shards=int(meta_shards.get(meta_name, 1)),
            quant_type=str(meta_qt.get(meta_name, "nf4")),
        )

    fields = {}
    for name in _LINEAR_FIELDS:
        if f"layers.{name}.packed" in data:
            fields[name] = packed_weight(f"layers.{name}", name)
        else:
            fields[name] = get(f"layers.{name}")
    for name in _NORM_FIELDS:
        fields[name] = get(f"layers.{name}")
    fields["qkv_bias"] = (
        get("layers.qkv_bias") if "layers.qkv_bias" in data else None
    )
    fields["router"] = (
        get("layers.router") if "layers.router" in data else None
    )
    for name in ("post_attn_out_norm", "post_ffw_norm", "q_norm", "k_norm"):
        fields[name] = (
            get(f"layers.{name}") if f"layers.{name}" in data else None
        )
    if "lm_head.packed" in data:
        lm_head = packed_weight("lm_head", "lm_head")
    else:
        lm_head = get("lm_head")
    return LlamaParams(
        embed=get("embed"),
        layers=LayerParams(**fields),
        final_norm=get("final_norm"),
        lm_head=lm_head,
    )
