"""Sequence parallelism: ring-attention prefill over a mesh axis.

The reference package is single-GPU (SURVEY.md §2.2); this is the TPU-native
long-context answer: a prompt's SEQUENCE axis is sharded over a mesh axis,
every transformer sublayer runs on its local token slice (norms, projections
and MLPs are pointwise over S), and attention — the one op that couples
positions — exchanges K/V blocks around the mesh ring with
``jax.lax.ppermute`` while a streaming-softmax accumulator merges each
block's contribution (the same online (max, normalizer, accumulator) math as
``ops.attention.chunked_attention``, associated over ring steps instead of
KV chunks).  Peak per-device activation memory is O(S / n_shards); each
device computes 1/n of the quadratic score work, and causally-irrelevant
blocks (entirely in a shard's future) are skipped with ``lax.cond`` just
like the chunk-skip decode path.

With XLA's async collectives the ppermute of block i+1 overlaps the score
work of block i — the ring is the classic compute/comm-overlapped pattern
(HBM-resident K/V blocks are a few MB; ICI moves them while the MXU chews
the previous block).

Composition: weights are REPLICATED over the sp axis (this is activation
parallelism, not weight parallelism), so ``sp`` composes with data
parallelism trivially and is orthogonal to the TP layer in ``parallel/tp.py``
(a tp x sp mesh would shard heads over tp inside each ring step — left for
multi-chip hardware).  The int8 KV cache rides the ring quantized: blocks
circulate as int8 + per-token scales (half the ICI bytes), folded into
scores/probs exactly like the cache path.

Numerics match ``chunked_attention`` (fp32 online softmax, one division at
the end): results agree with the single-device prefill to fp32-rounding,
and greedy next tokens are identical (tests/test_sp.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..models.llama import (
    KVCache,
    LlamaConfig,
    LlamaParams,
    forward,
    init_kv_cache,
)
from ..ops.attention import _NEG, _visibility

__all__ = ["ring_attention", "sp_prefill"]


def ring_attention(
    q: jax.Array,  # [B, H, Sl, D] this shard's queries
    k: jax.Array,  # [B, KV, Sl, D] this shard's fresh keys (bf16 or int8)
    v: jax.Array,  # [B, KV, Sl, D]
    q_positions: jax.Array,  # [B, Sl] GLOBAL positions of the queries
    seq_lens: jax.Array,  # [B] total visible length
    *,
    axis: str,
    n_shards: int,
    scale: float,
    sliding_window=None,  # Python int or traced per-layer scalar
    k_scale: Optional[jax.Array] = None,  # [B, KV, Sl] fp32 absmax (int8 KV)
    v_scale: Optional[jax.Array] = None,
    logit_softcap: Optional[float] = None,
) -> jax.Array:
    """Ring attention inside ``shard_map``: K/V blocks hop ``axis`` while a
    streaming softmax merges them.  Shard j's keys carry global positions
    ``j*Sl + arange(Sl)`` (token shards are contiguous slices), so causal /
    window masking is the ordinary ``_visibility`` arithmetic per block.

    Returns [B, H, Sl, D] — attention output for the local queries.
    """
    b, nh, sl, d = q.shape
    nkv = k.shape[1]
    group = nh // nkv
    compute_dtype = q.dtype
    qg = q.reshape(b, nkv, group, sl, d)
    idx = jax.lax.axis_index(axis)
    perm = [(j, (j + 1) % n_shards) for j in range(n_shards)]
    max_pos = jnp.max(q_positions)
    min_pos = jnp.min(
        jnp.where(q_positions < 0, jnp.int32(2**30), q_positions)
    )
    has_scale = k_scale is not None

    def step(carry, i):
        k_blk, v_blk, ks_blk, vs_blk, m, l, o = carry
        # After i hops the resident block originated at shard (idx - i).
        src = (idx - i) % n_shards
        t0 = src * sl

        def compute(state):
            m, l, o = state
            sc = jnp.einsum(
                "bkgsd,bktd->bkgst",
                qg,
                k_blk.astype(compute_dtype),
                preferred_element_type=jnp.float32,
            ) * scale
            if has_scale:
                sc = sc * (ks_blk * (1.0 / 127.0))[:, :, None, None, :]
            if logit_softcap is not None:
                sc = jnp.tanh(sc / logit_softcap) * logit_softcap
            t_ids = t0 + jnp.arange(sl, dtype=jnp.int32)
            vis = _visibility(t_ids, q_positions, seq_lens, sliding_window)
            sc = jnp.where(vis[:, None, None, :, :], sc, _NEG)
            m_new = jnp.maximum(m, sc.max(axis=-1))
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(sc - m_new[..., None])
            l2 = l * alpha + p.sum(axis=-1)
            if has_scale:
                p = p * (vs_blk * (1.0 / 127.0))[:, :, None, None, :]
            o2 = o * alpha[..., None] + jnp.einsum(
                "bkgst,bktd->bkgsd",
                p.astype(compute_dtype),
                v_blk.astype(compute_dtype),
                preferred_element_type=jnp.float32,
            )
            return (m_new, l2, o2)

        # Skip blocks this shard cannot see (entirely causal-future, or
        # entirely behind the sliding window) — a skipped block contributes
        # exactly what a fully-masked one would.  The ppermute below stays
        # unconditional (collectives must run on every shard every step).
        relevant = t0 <= max_pos
        if sliding_window is not None:
            relevant = relevant & (t0 + sl - 1 > min_pos - sliding_window)
        m, l, o = jax.lax.cond(relevant, compute, lambda st: st, (m, l, o))

        k_blk = jax.lax.ppermute(k_blk, axis, perm)
        v_blk = jax.lax.ppermute(v_blk, axis, perm)
        if has_scale:
            ks_blk = jax.lax.ppermute(ks_blk, axis, perm)
            vs_blk = jax.lax.ppermute(vs_blk, axis, perm)
        return (k_blk, v_blk, ks_blk, vs_blk, m, l, o), None

    m0 = jnp.full((b, nkv, group, sl), _NEG, jnp.float32)
    l0 = jnp.zeros((b, nkv, group, sl), jnp.float32)
    o0 = jnp.zeros((b, nkv, group, sl, d), jnp.float32)
    (_, _, _, _, _, l, o), _ = jax.lax.scan(
        step,
        (k, v, k_scale, v_scale, m0, l0, o0),
        jnp.arange(n_shards, dtype=jnp.int32),
    )
    out = o / jnp.maximum(l, 1e-30)[..., None]
    return out.reshape(b, nh, sl, d).astype(compute_dtype)


def sp_prefill(
    params: LlamaParams,
    cfg: LlamaConfig,
    tokens: jax.Array,  # [B, S] int32, S % n_shards == 0
    mesh: Mesh,
    axis: str = "sp",
    seq_lens: Optional[jax.Array] = None,  # [B] per-row prompt lengths
):
    """Sequence-parallel prefill: tokens sharded on S over ``mesh[axis]``,
    weights replicated, attention via :func:`ring_attention`.

    ``seq_lens`` supports right-padded batches: row ``i`` attends only to
    its first ``seq_lens[i]`` tokens (pad slots are invisible, exactly like
    the engine's prefill convention) and its returned logits are taken at
    position ``seq_lens[i] - 1`` — whichever sequence shard owns it.
    Default: every row is the full ``S`` tokens.

    Returns ``(last_logits [B, V] fp32, cache, seq_lens)`` with the cache in
    the standard engine layout ([L, B, KV, max_seq_len, D], prompt slots
    filled) so decoding continues through the ordinary single-device /
    tp-served paths.  The per-shard caches come back S-sharded from the
    shard_map and are placed into the full-length buffer outside it.
    """
    b, s = tokens.shape
    n = mesh.shape[axis]
    assert s % n == 0, f"prompt length {s} must divide over {n} sp shards"
    assert s <= cfg.max_seq_len
    sl = s // n
    if seq_lens is None:
        seq_lens = jnp.full((b,), s, dtype=jnp.int32)
    else:
        seq_lens = jnp.asarray(seq_lens, dtype=jnp.int32)
        assert seq_lens.shape == (b,), "seq_lens must be [B]"
    L = cfg.num_layers
    kv_shape = (L, b, cfg.num_kv_heads, sl, cfg.head_dim)

    def local_cache() -> KVCache:
        if cfg.kv_quant:
            return KVCache(
                k=jnp.zeros(kv_shape, jnp.int8),
                v=jnp.zeros(kv_shape, jnp.int8),
                k_scale=jnp.zeros(kv_shape[:-1], jnp.float32),
                v_scale=jnp.zeros(kv_shape[:-1], jnp.float32),
            )
        return KVCache(
            k=jnp.zeros(kv_shape, cfg.dtype), v=jnp.zeros(kv_shape, cfg.dtype)
        )

    kv_spec = P(None, None, None, axis, None)
    sc_spec = P(None, None, None, axis) if cfg.kv_quant else None
    cache_specs = KVCache(k=kv_spec, v=kv_spec, k_scale=sc_spec, v_scale=sc_spec)

    def run(tokens_l, lens):
        sidx = jax.lax.axis_index(axis)
        offset = sidx * sl
        local = jnp.arange(sl, dtype=jnp.int32)[None, :]
        positions = jnp.broadcast_to(local + offset, (b, sl))
        cache_pos = jnp.broadcast_to(local, (b, sl))
        logits, new_cache = forward(
            params,
            cfg,
            tokens_l,
            local_cache(),
            positions,
            lens,
            last_only=True,
            ring_axis=(axis, n),
            cache_positions=cache_pos,
        )
        # Each row's last valid token lives on shard (len-1)//sl
        # (``last_only`` already picked the right LOCAL row there); one
        # [B, V] psum of the owner rows replicates the answer everywhere.
        owner = (lens - 1) // sl == sidx
        logits = jax.lax.psum(
            jnp.where(owner[:, None], logits.astype(jnp.float32), 0.0), axis
        )
        return logits, new_cache

    logits, cache_s = jax.shard_map(
        run,
        mesh=mesh,
        in_specs=(P(None, axis), P()),
        out_specs=(P(), cache_specs),
        check_vma=False,
    )(tokens, seq_lens)

    full = init_kv_cache(cfg, b)
    full = KVCache(
        k=full.k.at[:, :, :, :s, :].set(cache_s.k),
        v=full.v.at[:, :, :, :s, :].set(cache_s.v),
        k_scale=(
            None
            if full.k_scale is None
            else full.k_scale.at[:, :, :, :s].set(cache_s.k_scale)
        ),
        v_scale=(
            None
            if full.v_scale is None
            else full.v_scale.at[:, :, :, :s].set(cache_s.v_scale)
        ),
    )
    return logits, full, seq_lens
