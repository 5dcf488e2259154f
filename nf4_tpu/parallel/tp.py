"""Tensor parallelism for packed NF4 weights over a named mesh.

The TPU equivalent of the distributed layer the reference never had
(SURVEY.md §2.2: the reference's only concurrency is a Triton launch grid and
three benchmark-harness CUDA streams).  Sharding strategy (Megatron-style,
expressed with jax.shard_map so the Pallas kernels run on per-device local
chunks with explicit XLA collectives over ICI):

* Column-parallel (shard out_features -> the LANE dim of the packed layout):
  the FUSED wqkv and w_gateup projections, whose rows are interleaved per
  shard at pack time (models.llama.fuse_rows) so each device's contiguous
  slice is exactly its [q; k; v] (resp. [gate; up]) block.
* Row-parallel (shard in_features -> whole K-chunks of the packed layout,
  enabled by ``PackedNF4.shards``): wo, w_down, followed by a ``psum``.
  One psum per attention block + one per MLP — the minimum for this mapping.
* lm_head: vocab-sharded; logits return vocab-sharded and XLA inserts the
  gather only if a consumer needs it (argmax sampling reduces locally).
* KV cache: sharded over heads — each device attends only its own heads, so
  decode attention needs no collectives at all.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.llama import (
    KVCache,
    LayerParams,
    LlamaConfig,
    LlamaParams,
    forward,
    init_kv_cache,
)
from ..nf4.format import PackedNF4

__all__ = [
    "tp_local_config",
    "localize_params",
    "param_specs",
    "shard_params",
    "cache_spec",
    "tp_forward",
    "tp_prefill",
    "tp_decode_step",
    "repack_tp",
]

_COL_PARALLEL = ("wqkv", "w_gateup")
_ROW_PARALLEL = ("wo", "w_down")
_REPLICATED = ("input_norm", "post_attn_norm")


def tp_local_config(cfg: LlamaConfig, tp: int, axis: str = "tp") -> LlamaConfig:
    """The per-device slice of the architecture.

    MoE "expert" sharding keeps each expert full-width and divides the
    expert COUNT instead, recording the mesh axis in ``ep_axis`` so
    ``_moe_mlp`` can offset local expert ids to global ones."""
    assert cfg.num_heads % tp == 0, f"num_heads {cfg.num_heads} % tp {tp} != 0"
    assert cfg.num_kv_heads % tp == 0, (
        f"num_kv_heads {cfg.num_kv_heads} % tp {tp} != 0 "
        "(KV-head replication not yet supported)"
    )
    assert cfg.tp_shards == tp, (
        f"params were packed for tp_shards={cfg.tp_shards} but the mesh has "
        f"tp={tp}; fused column-parallel weights are interleaved per shard, "
        "so the degrees must match (re-quantize with the right tp_shards, "
        "or repack_tp the checkpoint)"
    )
    expert_mode = cfg.num_experts > 1 and cfg.moe_shard == "expert"
    moe_fields = {}
    if expert_mode:
        assert cfg.num_experts % tp == 0, (
            f"num_experts {cfg.num_experts} % tp {tp} != 0 "
            "(moe_shard='expert' needs a whole number of experts per device)"
        )
        moe_fields = dict(num_experts=cfg.num_experts // tp, ep_axis=axis)
    return dataclasses.replace(
        cfg,
        num_heads=cfg.num_heads // tp,
        num_kv_heads=cfg.num_kv_heads // tp,
        intermediate_size=(
            cfg.intermediate_size
            if expert_mode
            else cfg.intermediate_size // tp
        ),
        tp_shards=1,
        **moe_fields,
    )


def _localize_weight(w, tp: int, kind: str):
    """Rewrite quantized-weight static metadata to per-device shapes."""
    from ..ops.int8_serve import PackedInt8

    if not isinstance(w, (PackedNF4, PackedInt8)):
        return w  # dense arrays carry their shape in the leaf itself
    m, n = w.shape
    m_pad, n_pad = w.padded_shape
    if kind == "col":
        assert m % tp == 0 and m_pad % (tp * 128) == 0, (
            f"out_features {m} (padded {m_pad}) not col-shardable over {tp}"
        )
        return w.replace(shape=(m // tp, n), padded_shape=(m_pad // tp, n_pad))
    if isinstance(w, PackedNF4):
        assert w.shards == tp, (
            f"row-parallel weight must be packed with shards={tp}, got "
            f"{w.shards} (set LlamaConfig.tp_shards before quantizing)"
        )
        return w.replace(
            shape=(m, n // tp), padded_shape=(m_pad, n_pad // tp), shards=1
        )
    # PackedInt8: K rows are chunk-contiguous, so a plain 1/tp slice of the
    # row dim is one device's K chunk.
    assert w.shards == tp, (
        f"row-parallel int8 weight must carry shards={tp}, got {w.shards} "
        "(recode from a PackedNF4 quantized with the right tp_shards)"
    )
    return w.replace(
        shape=(m, n // tp), padded_shape=(m_pad, n_pad // tp), shards=1
    )


def localize_params(
    params: LlamaParams, tp: int, moe_shard: str = "tensor"
) -> LlamaParams:
    """Params with static metadata describing per-device local shapes.

    Leaves stay global; only the aux data changes.  The result is what gets
    passed through shard_map (which slices leaves but keeps aux data).

    ``moe_shard="expert"``: expert weights shard on their leading E axis,
    so their per-expert metadata (logical shapes, pack groups) is already
    local — only the attention projections get localized.
    """
    lp = params.layers
    expert_mode = lp.router is not None and moe_shard == "expert"
    mlp_fields = () if expert_mode else ("w_gateup", "w_down")
    new_layers = lp.replace(
        **{
            k: _localize_weight(getattr(lp, k), tp, "col")
            for k in _COL_PARALLEL
            if k == "wqkv" or k in mlp_fields
        },
        **{
            k: _localize_weight(getattr(lp, k), tp, "row")
            for k in _ROW_PARALLEL
            if k == "wo" or k in mlp_fields
        },
    )
    # lm_head is vocab(=out)-sharded; quantized heads need local metadata.
    lm_head = _localize_weight(params.lm_head, tp, "col")
    return params.replace(layers=new_layers, lm_head=lm_head)


def _weight_spec(w, kind: str, axis: str):
    """PartitionSpec pytree matching one (stacked) weight.

    Rank-aware: specs anchor on the TRAILING dims so any number of leading
    stack axes works — ``[L, rows, lanes]`` dense-MLP leaves and
    ``[L, E, rows, lanes]`` MoE expert-stacked leaves alike (the expert
    axis is replicated; each expert's columns/K-chunks shard like the
    dense MLP, see models.llama._moe_mlp)."""
    from ..ops.int8_serve import PackedInt8

    def trailing(arr, pos_from_end):
        lead = [None] * (arr.ndim - pos_from_end)
        tail = [None] * (pos_from_end - 1)
        return P(*lead, axis, *tail)

    def expert(arr):  # E is dim 1 of [L, E, ...]
        return P(None, axis, *([None] * (arr.ndim - 2)))

    if isinstance(w, (PackedNF4, PackedInt8)):
        packed = w.values if isinstance(w, PackedInt8) else w.packed
        if kind == "col":  # lane dim (last) holds out_features
            spec = trailing(packed, 1)
        elif kind == "expert":  # leading stacked expert axis
            spec = expert(packed)
        else:  # sublane dim (second-to-last) holds K rows/chunks
            spec = trailing(packed, 2)
        if isinstance(w, PackedInt8):
            return w.replace(values=spec, scales=spec)
        return w.replace(packed=spec, scales=spec)
    # Dense [..., m, n]: col-parallel shards m, row-parallel n.
    if kind == "expert":
        return expert(w)
    return trailing(w, 2) if kind == "col" else trailing(w, 1)


def param_specs(
    params: LlamaParams, axis: str = "tp", moe_shard: str = "tensor"
) -> LlamaParams:
    """A params-structured pytree of PartitionSpecs (for shard_map/device_put)."""
    lp = params.layers
    expert_mode = lp.router is not None and moe_shard == "expert"
    fields = {}
    for k in _COL_PARALLEL:
        kind = "expert" if expert_mode and k == "w_gateup" else "col"
        fields[k] = _weight_spec(getattr(lp, k), kind, axis)
    for k in _ROW_PARALLEL:
        kind = "expert" if expert_mode and k == "w_down" else "row"
        fields[k] = _weight_spec(getattr(lp, k), kind, axis)
    for k in _REPLICATED:
        fields[k] = P(None, None)
    if lp.qkv_bias is not None:
        fields["qkv_bias"] = P(None, axis)  # column-parallel like wqkv rows
    if lp.router is not None:
        fields["router"] = P(None, None, None)  # [L, E, H] replicated
    for k in (
        "post_attn_out_norm", "post_ffw_norm",  # Gemma-2 [L, H]
        "q_norm", "k_norm",  # Qwen3 [L, D]
    ):
        if getattr(lp, k) is not None:
            fields[k] = P(None, None)
    from ..ops.int8_serve import PackedInt8

    if isinstance(params.lm_head, PackedNF4):
        # Non-stacked packed weight: vocab is the lane dim.
        lm_spec = params.lm_head.replace(packed=P(None, axis), scales=P(None, axis))
    elif isinstance(params.lm_head, PackedInt8):
        lm_spec = params.lm_head.replace(values=P(None, axis), scales=P(None, axis))
    else:
        lm_spec = P(axis, None)  # dense, vocab-sharded
    return LlamaParams(
        embed=P(None, None),
        layers=lp.replace(**fields),
        final_norm=P(None),
        lm_head=lm_spec,
    )


def cache_spec(axis: str = "tp", data_axis=None, kv_quant: bool = False) -> KVCache:
    spec = P(None, data_axis, axis, None, None)
    sspec = P(None, data_axis, axis, None) if kv_quant else None
    return KVCache(k=spec, v=spec, k_scale=sspec, v_scale=sspec)


def shard_params(
    params: LlamaParams, mesh: Mesh, axis: str = "tp", moe_shard: str = "tensor"
) -> Tuple[LlamaParams, LlamaParams]:
    """device_put params onto the mesh; returns (sharded_params, specs)."""
    specs = param_specs(params, axis, moe_shard)
    sharded = jax.tree.map(
        lambda leaf, spec: jax.device_put(leaf, NamedSharding(mesh, spec)),
        params,
        specs,
    )
    return sharded, specs


def init_sharded_kv_cache(
    cfg: LlamaConfig, batch_size: int, mesh: Mesh, axis: str = "tp", data_axis=None
) -> KVCache:
    cache = init_kv_cache(cfg, batch_size)
    specs = cache_spec(axis, data_axis, kv_quant=cfg.kv_quant)
    return jax.tree.map(
        lambda leaf, spec: jax.device_put(leaf, NamedSharding(mesh, spec)),
        cache,
        specs,
    )


def repack_tp(params: LlamaParams, cfg: LlamaConfig, tp: int):
    """Re-pack a quantized checkpoint for a different TP degree by pure
    index manipulation — no dequantization, no requantization.

    Removes the operational constraint that TP degree is baked at quantize
    time (``tp_local_config`` asserts ``cfg.tp_shards == mesh tp``): a
    checkpoint packed for ``tp_shards=1`` can be served at ``tp=N`` after
    ``params, cfg = repack_tp(params, cfg, N)``.  Exact: the result is
    bit-identical to quantizing with ``tp_shards=tp`` in the first place —
    column-parallel fused weights are a lane-column permutation
    (``nf4.format.permute_out_features``), row-parallel weights a K-row
    re-chunking (``nf4.format.rechunk_shards``); per-value bytes and scales
    never change.

    Returns ``(params, cfg)`` with ``cfg.tp_shards = tp``.
    """
    from ..nf4.format import interleave_perm, permute_out_features, rechunk_shards
    from ..ops.int8_serve import PackedInt8

    g0 = cfg.tp_shards
    if g0 == tp:
        return params, cfg
    q_dim = cfg.num_heads * cfg.head_dim
    kv_dim = cfg.num_kv_heads * cfg.head_dim
    sizes = {
        "wqkv": (q_dim, kv_dim, kv_dim),
        "w_gateup": (cfg.intermediate_size, cfg.intermediate_size),
    }

    def col_perm(field):
        """Permutation old-interleave -> new-interleave in old positions."""
        p_old = interleave_perm(sizes[field], g0)  # new pos -> tp1 index
        p_new = interleave_perm(sizes[field], tp)
        inv_old = np.argsort(p_old)  # tp1 index -> old pos
        return inv_old[p_new]  # new pos -> old pos

    def repack_col(w, field):
        if isinstance(w, PackedInt8):
            raise TypeError(
                "repack_tp operates on NF4 checkpoints; recode to int8 "
                "AFTER repacking (recode_params_int8)"
            )
        perm = col_perm(field)
        if isinstance(w, PackedNF4):
            return permute_out_features(w, perm)
        return jnp.take(w, jnp.asarray(perm), axis=-2)  # dense [L, m, n]

    def repack_row(w):
        if isinstance(w, PackedInt8):
            raise TypeError(
                "repack_tp operates on NF4 checkpoints; recode to int8 "
                "AFTER repacking (recode_params_int8)"
            )
        if isinstance(w, PackedNF4):
            return rechunk_shards(w, tp)
        return w  # dense row-parallel weights shard without re-chunking

    lp = params.layers
    fields = {
        "wqkv": repack_col(lp.wqkv, "wqkv"),
        "wo": repack_row(lp.wo),
    }
    # moe_shard="expert": expert weights are packed with groups=1 at any
    # tp degree (whole experts per device) — only attention repacks.
    if cfg.num_experts == 1 or cfg.moe_shard == "tensor":
        fields["w_gateup"] = repack_col(lp.w_gateup, "w_gateup")
        fields["w_down"] = repack_row(lp.w_down)
    if lp.qkv_bias is not None:
        fields["qkv_bias"] = jnp.take(
            lp.qkv_bias, jnp.asarray(col_perm("wqkv")), axis=-1
        )
    # lm_head / embed are single-component (vocab slices shard contiguously
    # at any degree) — no permutation needed.
    new_cfg = dataclasses.replace(cfg, tp_shards=tp)
    return params.replace(layers=lp.replace(**fields)), new_cfg


# ---------------------------------------------------------------------------
# Sharded entry points


def tp_forward(
    params_local: LlamaParams,
    cfg: LlamaConfig,
    mesh: Mesh,
    tokens: jax.Array,
    cache: KVCache,
    positions: jax.Array,
    seq_lens: jax.Array,
    axis: str = "tp",
    data_axis=None,
    last_only: bool = False,
):
    """shard_map-wrapped forward.  ``params_local`` must come from
    :func:`localize_params`; arrays must be sharded per :func:`param_specs`.

    ``data_axis`` optionally shards the batch dim over a second mesh axis
    (data parallelism): tokens/cache/logits are split on batch, weights are
    replicated across it.

    Returns (logits [B,S,V] — or [B,V] with ``last_only`` — vocab-sharded
    over ``axis``, new cache).
    """
    tp = mesh.shape[axis]
    cfg_local = tp_local_config(cfg, tp, axis)
    specs = param_specs(params_local, axis, cfg.moe_shard)
    da = data_axis
    logits_spec = P(da, axis) if last_only else P(da, None, axis)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            specs,
            cache_spec(axis, da, kv_quant=cfg.kv_quant),
            P(da, None),
            P(da, None),
            P(da),
        ),
        out_specs=(logits_spec, cache_spec(axis, da, kv_quant=cfg.kv_quant)),
        check_vma=False,
    )
    def fn(params, kv, tokens, positions, seq_lens):
        reduce_fn = lambda t: jax.lax.psum(t, axis)  # noqa: E731
        logits, new_cache = forward(
            params, cfg_local, tokens, kv, positions, seq_lens, reduce_fn,
            last_only=last_only,
        )
        return logits, new_cache

    return fn(params_local, cache, tokens, positions, seq_lens)


def tp_prefill(params_local, cfg, mesh, tokens, cache=None, axis="tp", data_axis=None):
    b, s = tokens.shape
    if cache is None:
        cache = init_sharded_kv_cache(cfg, b, mesh, axis, data_axis)
    positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (b, s))
    seq_lens = jnp.full((b,), s, dtype=jnp.int32)
    return tp_forward(
        params_local, cfg, mesh, tokens, cache, positions, seq_lens, axis, data_axis
    )


def tp_decode_step(
    params_local, cfg, mesh, token, cache, positions, axis="tp", data_axis=None
):
    logits, cache = tp_forward(
        params_local,
        cfg,
        mesh,
        token[:, None],
        cache,
        positions[:, None],
        positions + 1,
        axis,
        data_axis,
    )
    return logits[:, 0, :], cache
