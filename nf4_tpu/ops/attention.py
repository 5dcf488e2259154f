"""Attention kernels: naive XLA and chunked (flash-style) online softmax.

The reference package has no model stack at all (its "model" is a benchmark
MLP, reference ``benchmark.py:38-50``); attention exists here because the
TPU build serves full Llama models.  Two interchangeable implementations of
one math contract:

* **naive** — materializes the [B, KV, G, S, T] fp32 score tensor.  Optimal
  for decode (S = 1) and short prefills, where the tensor is small and XLA
  fuses everything.
* **chunked** — flash-style streaming softmax: an outer ``lax.scan`` over
  query chunks, an inner ``lax.scan`` over KV chunks carrying the running
  (max, normalizer, accumulator) triple.  Peak memory per step is
  O(q_chunk x kv_chunk) instead of O(S x T), so an 8k-token prefill that
  would materialize tens of GB of scores runs in a few hundred MB.  All
  shapes static, both scans compile once.

Both paths fuse int8 KV dequantization: per-token absmax scales fold into
the scores (k) and probabilities (v), so the dequantized cache never
materializes (the round-1 implementation converted the whole cache per
step, which made the int8 cache *slower* than bf16).

Masking is computed from (positions, seq_lens, sliding_window) per chunk —
the O(B x S x T) boolean mask tensor the round-1 model built is never
materialized either.

Numerics: fp32 softmax and accumulation in both paths.  The chunked path is
mathematically identical to naive softmax but associates the sums
differently, so results match to fp32 rounding (not bit-exact); fully
masked query rows return finite garbage (they are padding by construction —
same contract as the naive path's uniform-softmax fallback).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = [
    "attention",
    "naive_attention",
    "chunked_attention",
    "flash_attention",
]

# Plain Python float (NOT a module-level device array: a captured device
# constant becomes an extra executable input buffer that can be freed
# between calls, breaking later invocations with a buffer-count mismatch).
_NEG = -1e30


def _visibility(t_ids, positions, seq_lens, sliding_window, q_seg=None, k_seg=None):
    """Bool visibility [B, S, C] for key slots ``t_ids`` [C] against query
    ``positions`` [B, S]: causal (t <= p), length-bounded (t < seq_len),
    optionally sliding-window (t > p - w), optionally segment-equal
    (``q_seg`` [B, S] == ``k_seg`` [B, C] — block-diagonal attention for
    packed training rows)."""
    t = t_ids[None, None, :]
    p = positions[:, :, None]
    vis = (t <= p) & (t < seq_lens[:, None, None])
    if sliding_window is not None:
        vis = vis & (t > p - sliding_window)
    if q_seg is not None:
        vis = vis & (q_seg[:, :, None] == k_seg[:, None, :])
    return vis


def naive_attention(
    q: jax.Array,  # [B, H, S, D]
    k: jax.Array,  # [B, KV, T, D] (bf16 or int8)
    v: jax.Array,  # [B, KV, T, D]
    positions: jax.Array,  # [B, S] absolute positions of the queries
    seq_lens: jax.Array,  # [B]
    *,
    scale: float,
    sliding_window: Optional[int] = None,
    k_scale: Optional[jax.Array] = None,  # [B, KV, T] fp32 absmax (int8 KV)
    v_scale: Optional[jax.Array] = None,
    segment_ids: Optional[jax.Array] = None,  # [B, S] (self-attn: S == T)
    logit_softcap: Optional[float] = None,  # Gemma-2: cap*tanh(sc/cap)
) -> jax.Array:
    b, nh, s, d = q.shape
    nkv, t_max = k.shape[1], k.shape[2]
    group = nh // nkv
    if segment_ids is not None:
        assert t_max == s, "segment_ids requires self-attention (S == T)"
    compute_dtype = q.dtype
    qg = q.reshape(b, nkv, group, s, d)
    scores = jnp.einsum(
        "bkgsd,bktd->bkgst",
        qg,
        k.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )
    scores = scores * scale
    if k_scale is not None:
        scores = scores * (k_scale * (1.0 / 127.0))[:, :, None, None, :]
    if logit_softcap is not None:
        scores = jnp.tanh(scores / logit_softcap) * logit_softcap
    vis = _visibility(
        jnp.arange(t_max, dtype=jnp.int32), positions, seq_lens, sliding_window,
        q_seg=segment_ids, k_seg=segment_ids,
    )
    scores = jnp.where(vis[:, None, None, :, :], scores, _NEG)
    probs = jax.nn.softmax(scores, axis=-1)
    if v_scale is not None:
        probs = probs * (v_scale * (1.0 / 127.0))[:, :, None, None, :]
    out = jnp.einsum(
        "bkgst,bktd->bkgsd",
        probs.astype(compute_dtype),
        v.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )
    return out.reshape(b, nh, s, d).astype(compute_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "q_chunk", "kv_chunk", "logit_softcap"),
)
def chunked_attention(
    q: jax.Array,  # [B, H, S, D]
    k: jax.Array,  # [B, KV, T, D] (bf16 or int8)
    v: jax.Array,
    positions: jax.Array,  # [B, S]
    seq_lens: jax.Array,  # [B]
    *,
    scale: float,
    sliding_window: Optional[int] = None,
    k_scale: Optional[jax.Array] = None,
    v_scale: Optional[jax.Array] = None,
    q_chunk: int = 512,
    kv_chunk: int = 512,
    segment_ids: Optional[jax.Array] = None,  # [B, S] (self-attn: S == T)
    logit_softcap: Optional[float] = None,  # Gemma-2: cap*tanh(sc/cap)
) -> jax.Array:
    b, nh, s, d = q.shape
    nkv, t_max = k.shape[1], k.shape[2]
    group = nh // nkv
    if segment_ids is not None:
        assert t_max == s, "segment_ids requires self-attention (S == T)"
    compute_dtype = q.dtype

    # Segment ids are consumed twice (query side, key side) with possibly
    # different paddings; -1 never equals a real segment so padded slots
    # stay invisible either way.
    seg_q = seg_k = segment_ids

    # Pad S up to a q_chunk multiple; padded rows get position -1 (never
    # visible) and are sliced off at the end.
    s_pad = -(-s // q_chunk) * q_chunk
    if s_pad != s:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, s_pad - s), (0, 0)))
        positions = jnp.pad(
            positions, ((0, 0), (0, s_pad - s)), constant_values=-1
        )
        if seg_q is not None:
            seg_q = jnp.pad(
                seg_q, ((0, 0), (0, s_pad - s)), constant_values=-1
            )
    # Pad T up to a kv_chunk multiple (slots >= seq_len are masked anyway).
    t_pad = -(-t_max // kv_chunk) * kv_chunk
    if t_pad != t_max:
        pad_kv = ((0, 0), (0, 0), (0, t_pad - t_max), (0, 0))
        k = jnp.pad(k, pad_kv)
        v = jnp.pad(v, pad_kv)
        if k_scale is not None:
            k_scale = jnp.pad(k_scale, ((0, 0), (0, 0), (0, t_pad - t_max)))
            v_scale = jnp.pad(v_scale, ((0, 0), (0, 0), (0, t_pad - t_max)))
        if seg_k is not None:
            seg_k = jnp.pad(
                seg_k, ((0, 0), (0, t_pad - t_max)), constant_values=-1
            )

    nq = s_pad // q_chunk
    nt = t_pad // kv_chunk
    qg = q.reshape(b, nkv, group, s_pad, d)

    # Both scans are INDEX-based: each chunk is dynamic_sliced from the
    # full arrays inside the body (and, for KV, inside the cond branch).
    # Pre-tiling with transposes would copy the entire cache per call, and
    # would fetch skipped chunks' DMA anyway; this way an irrelevant chunk
    # costs nothing — decode over a long cache reads only the live prefix.

    def one_q_tile(carry, qi):
        s0 = qi * q_chunk
        qt = jax.lax.dynamic_slice_in_dim(qg, s0, q_chunk, axis=3)
        pos_t = jax.lax.dynamic_slice_in_dim(positions, s0, q_chunk, axis=1)
        seg_t = (
            None
            if seg_q is None
            else jax.lax.dynamic_slice_in_dim(seg_q, s0, q_chunk, axis=1)
        )
        max_pos = jnp.max(pos_t)  # padded rows carry -1: no effect on max
        min_pos = jnp.min(jnp.where(pos_t < 0, jnp.int32(2**30), pos_t))

        def kv_body(state, ti):
            t0 = ti * kv_chunk

            def compute(state):
                m, l, o = state
                kc = jax.lax.dynamic_slice_in_dim(k, t0, kv_chunk, axis=2)
                vc = jax.lax.dynamic_slice_in_dim(v, t0, kv_chunk, axis=2)
                sc = jnp.einsum(
                    "bkgsd,bktd->bkgst",
                    qt,
                    kc.astype(compute_dtype),
                    preferred_element_type=jnp.float32,
                ) * scale
                if k_scale is not None:
                    ksc = jax.lax.dynamic_slice_in_dim(
                        k_scale, t0, kv_chunk, axis=2
                    )
                    sc = sc * (ksc * (1.0 / 127.0))[:, :, None, None, :]
                if logit_softcap is not None:
                    sc = jnp.tanh(sc / logit_softcap) * logit_softcap
                t_ids = t0 + jnp.arange(kv_chunk, dtype=jnp.int32)
                seg_c = (
                    None
                    if seg_k is None
                    else jax.lax.dynamic_slice_in_dim(
                        seg_k, t0, kv_chunk, axis=1
                    )
                )
                vis = _visibility(
                    t_ids, pos_t, seq_lens, sliding_window,
                    q_seg=seg_t, k_seg=seg_c,
                )
                sc = jnp.where(vis[:, None, None, :, :], sc, _NEG)

                m_new = jnp.maximum(m, sc.max(axis=-1))
                # exp(_NEG - _NEG) = 1 only while a row is still fully
                # masked; the first visible chunk raises m_new and alpha
                # discards the garbage accumulated so far (finite
                # self-correcting flash).
                alpha = jnp.exp(m - m_new)
                p = jnp.exp(sc - m_new[..., None])
                l = l * alpha + p.sum(axis=-1)
                if v_scale is not None:
                    vsc = jax.lax.dynamic_slice_in_dim(
                        v_scale, t0, kv_chunk, axis=2
                    )
                    p = p * (vsc * (1.0 / 127.0))[:, :, None, None, :]
                o = o * alpha[..., None] + jnp.einsum(
                    "bkgst,bktd->bkgsd",
                    p.astype(compute_dtype),
                    vc.astype(compute_dtype),
                    preferred_element_type=jnp.float32,
                )
                return (m_new, l, o)

            # Skip chunks this q-tile cannot see at all: entirely in the
            # causal future (t0 > max position), or entirely behind the
            # sliding window.  A skipped chunk contributes exactly what a
            # fully-masked chunk would (nothing), so this is lossless —
            # and removes the ~2x causal compute waste of a full T sweep.
            relevant = t0 <= max_pos
            if sliding_window is not None:
                relevant = relevant & (
                    t0 + kv_chunk - 1 > min_pos - sliding_window
                )
            state = jax.lax.cond(relevant, compute, lambda st: st, state)
            return state, None

        m0 = jnp.full((b, nkv, group, q_chunk), _NEG, jnp.float32)
        l0 = jnp.zeros((b, nkv, group, q_chunk), jnp.float32)
        o0 = jnp.zeros((b, nkv, group, q_chunk, d), jnp.float32)
        (m, l, o), _ = jax.lax.scan(
            kv_body, (m0, l0, o0), jnp.arange(nt, dtype=jnp.int32)
        )
        out = o / jnp.maximum(l, 1e-30)[..., None]
        return carry, out.astype(compute_dtype)

    _, outs = jax.lax.scan(
        one_q_tile, None, jnp.arange(nq, dtype=jnp.int32)
    )
    # [nq, B, KV, G, Sc, D] -> [B, H, S, D]
    out = outs.transpose(1, 2, 3, 0, 4, 5).reshape(b, nh, s_pad, d)
    return out[:, :, :s, :]


# ---------------------------------------------------------------------------
# Pallas flash-attention kernel (TPU fast path for long prefill)


def _make_flash_kernel(g, sc, c, d, kv, scale, sliding_window, int8_kv):
    from jax.experimental import pallas as pl

    def kernel(*refs):
        if int8_kv:
            (pos_ref, len_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref,
             o_ref, m_ref, l_ref, acc_ref) = refs
        else:
            (pos_ref, len_ref, q_ref, k_ref, v_ref,
             o_ref, m_ref, l_ref, acc_ref) = refs
        i = pl.program_id(0)
        bi = i // kv
        qi = pl.program_id(1)
        ti = pl.program_id(2)
        nt = pl.num_programs(2)
        t0 = ti * c

        @pl.when(ti == 0)
        def _init():
            m_ref[:] = jnp.full_like(m_ref, _NEG)
            l_ref[:] = jnp.zeros_like(l_ref)
            acc_ref[:] = jnp.zeros_like(acc_ref)

        # Contiguous positions: row r of this tile sits at absolute
        # position pos0 + (r % sc) (rows are [g, sc]-flattened).
        pos0 = pos_ref[bi, 0] + qi * sc
        max_pos = pos0 + sc - 1
        relevant = t0 <= max_pos
        if sliding_window is not None:
            relevant = jnp.logical_and(
                relevant, t0 + c - 1 > pos0 - sliding_window
            )

        @pl.when(relevant)
        def _compute():
            q = q_ref[0, 0]  # [G*Sc, D] bf16
            k = k_ref[0].astype(q.dtype)  # [C, D]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [G*Sc, C]
            s = s * scale
            if int8_kv:
                ksc = ks_ref[i, pl.ds(t0, c)]
                s = s * (ksc * (1.0 / 127.0))[None, :]
            t_ids = t0 + jax.lax.broadcasted_iota(jnp.int32, (1, c), 1)
            row_iota = jax.lax.broadcasted_iota(jnp.int32, (g * sc, 1), 0)
            pos_rows = pos0 + row_iota % sc  # [G*Sc, 1]
            seq_len = len_ref[bi, 0]
            vis = (t_ids <= pos_rows) & (t_ids < seq_len)
            if sliding_window is not None:
                vis = vis & (t_ids > pos_rows - sliding_window)
            s = jnp.where(vis, s, _NEG)

            m_prev = m_ref[:]  # [G*Sc, 1]
            m_new = jnp.maximum(m_prev, s.max(axis=-1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)
            l_ref[:] = l_ref[:] * alpha + p.sum(axis=-1, keepdims=True)
            m_ref[:] = m_new
            if int8_kv:
                vsc = vs_ref[i, pl.ds(t0, c)]
                p = p * (vsc * (1.0 / 127.0))[None, :]
            v_blk = v_ref[0].astype(q.dtype)
            acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
                p.astype(q.dtype), v_blk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        @pl.when(ti == nt - 1)
        def _store():
            o_ref[0, 0] = (
                acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)
            ).astype(o_ref.dtype)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("scale", "sliding_window", "sc", "c", "interpret"),
)
def flash_attention(
    q: jax.Array,  # [B, H, S, D] bf16
    k: jax.Array,  # [B, KV, T, D] (bf16 or int8)
    v: jax.Array,
    positions: jax.Array,  # [B, S] — rows MUST be contiguous per batch
    seq_lens: jax.Array,  # [B]
    *,
    scale: float,
    sliding_window: Optional[int] = None,
    k_scale: Optional[jax.Array] = None,
    v_scale: Optional[jax.Array] = None,
    sc: int = 512,
    c: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Pallas flash attention: one streaming-softmax program per
    (batch x KV-head, q-tile), inner grid over KV tiles with causal tile
    skipping.  GQA packing puts all G query groups of a KV head in one
    [G*Sc, D] block, so both dots are MXU-tall.  3.3x the XLA chunked path
    at the Llama-3-8B 8k-prefill shape on v5e.

    REQUIRES per-row contiguous positions (positions[b] = pos0_b + arange;
    true for every entry point in this package); the dispatcher only takes
    this path under that guarantee.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, s, d = q.shape
    nkv, t = k.shape[1], k.shape[2]
    g = h // nkv
    int8_kv = k_scale is not None

    # Non-multiple S: pad queries up to a tile multiple.  Padded rows get
    # positions pos0 + (s..s_pad) — causally consistent garbage rows whose
    # outputs are sliced off; only positions[:, 0] is ever read, so the
    # positions array itself needs no padding.
    s_orig = s
    s_pad = -(-s // sc) * sc
    if s_pad != s:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, s_pad - s), (0, 0)))
        s = s_pad
    # Non-multiple T: pad the KV cache up to a tile multiple.  Padded slots
    # have t_ids >= t >= seq_len, so the visibility mask kills them.
    t_pad = -(-t // c) * c
    if t_pad != t:
        pad_kv = ((0, 0), (0, 0), (0, t_pad - t), (0, 0))
        k = jnp.pad(k, pad_kv)
        v = jnp.pad(v, pad_kv)
        if int8_kv:
            k_scale = jnp.pad(k_scale, ((0, 0), (0, 0), (0, t_pad - t)))
            v_scale = jnp.pad(v_scale, ((0, 0), (0, 0), (0, t_pad - t)))
        t = t_pad
    nq, nt = s // sc, t // c

    q6 = (
        q.reshape(b, nkv, g, nq, sc, d)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(b * nkv, nq, g * sc, d)
    )
    k3 = k.reshape(b * nkv, t, d)
    v3 = v.reshape(b * nkv, t, d)
    lens2 = seq_lens.reshape(b, 1).astype(jnp.int32)
    pos0s = positions[:, :1].astype(jnp.int32)  # [B, 1]

    in_specs = [
        pl.BlockSpec((b, 1), lambda i, qi, ti: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((b, 1), lambda i, qi, ti: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec(
            (1, 1, g * sc, d), lambda i, qi, ti: (i, qi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec((1, c, d), lambda i, qi, ti: (i, ti, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c, d), lambda i, qi, ti: (i, ti, 0), memory_space=pltpu.VMEM),
    ]
    args = [pos0s, lens2, q6, k3, v3]
    if int8_kv:
        # Whole scale planes as one cached block ([B*KV, T] fp32); sliced
        # per tile in-kernel.
        in_specs += [
            pl.BlockSpec(
                (b * nkv, t), lambda i, qi, ti: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (b * nkv, t), lambda i, qi, ti: (0, 0), memory_space=pltpu.VMEM
            ),
        ]
        args += [k_scale.reshape(b * nkv, t), v_scale.reshape(b * nkv, t)]

    out = pl.pallas_call(
        _make_flash_kernel(g, sc, c, d, nkv, scale, sliding_window, int8_kv),
        grid=(b * nkv, nq, nt),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, g * sc, d), lambda i, qi, ti: (i, qi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b * nkv, nq, g * sc, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((g * sc, 1), jnp.float32),
            pltpu.VMEM((g * sc, 1), jnp.float32),
            pltpu.VMEM((g * sc, d), jnp.float32),
        ],
        interpret=interpret,
    )(*args)

    return (
        out.reshape(b, nkv, nq, g, sc, d)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(b, h, s, d)[:, :, :s_orig, :]
    )


# Use the chunked path when the naive score tensor would be large enough to
# matter (it allocates B*H*S*T fp32): this threshold keeps decode (S=1) and
# short prefills on the fused naive path, which measures faster there.
_CHUNKED_MIN_SCORE_ELEMS = 1 << 27  # 512 MB of fp32 scores


def _flash_eligible(q, k, s, t_max, d) -> bool:
    import jax as _jax

    from ..utils import env

    # d=64 runs the kernel on half-filled 128-lane vregs (TinyLlama-class
    # heads; measured still well ahead of the XLA chunked path).  Non-tile-
    # multiple S/T are padded inside flash_attention, so the only shape
    # requirements left are a supported head_dim and enough rows to tile.
    return (
        env.backend() == "pallas"
        and not env.use_interpret()
        and _jax.default_backend() == "tpu"
        and q.dtype == jnp.bfloat16
        and (d % 128 == 0 or d == 64)
        and s >= 256
    )


def _pick_sc(s: int, g: int) -> int:
    """Query-tile rows for the flash kernel.  The GQA-packed q block is
    [G*sc, d] and the per-tile score matrix [G*sc, c] f32; G*sc > 2048
    blows the 16MB scoped-VMEM limit at c=512 (measured: TinyLlama G=8,
    sc=512 -> 18.3M compile-time OOM).  Cap the tile so G*sc <= 2048."""
    sc = 512 if s >= 512 else 256
    while g * sc > 2048 and sc > 128:
        sc //= 2
    return sc


def attention(
    q, k, v, positions, seq_lens, *, scale,
    sliding_window=None, k_scale=None, v_scale=None,
    q_chunk: int = 512, kv_chunk: int = 512,
    contiguous_positions: bool = False,
    differentiable: bool = False,
    segment_ids=None,
    logit_softcap=None,
):
    """Dispatching entry point; see module docstring for the contract.

    ``contiguous_positions`` asserts that every batch row's positions are
    ``pos0 + arange(S)`` — the guarantee every entry point in this package
    provides — unlocking the Pallas flash kernel for long prefills.

    ``differentiable=True`` (the training path) skips the Pallas flash
    kernel — it has no VJP — and routes through the pure-XLA chunked/naive
    paths, which JAX differentiates; their ``lax.scan`` structure also
    gives the backward pass bounded memory.

    ``segment_ids`` [B, S] (self-attention only) adds block-diagonal
    masking for packed training rows: a query sees a key only when their
    segment ids match.  Positions must then be SLOT indices (the causal
    check is ``t_slot <= q_position``); segment-relative RoPE phases are
    the caller's job (``models.llama.train_forward``).
    """
    b, nh, s, d = q.shape
    t_max = k.shape[2]
    score_elems = b * nh * s * t_max
    if s > 1 and score_elems >= _CHUNKED_MIN_SCORE_ELEMS:
        if (
            contiguous_positions
            and not differentiable
            and segment_ids is None
            and logit_softcap is None
            # Traced per-layer windows (Gemma-2 alternating local/global)
            # cannot drive the flash kernel's static tile skipping.
            and (sliding_window is None or isinstance(sliding_window, int))
            and _flash_eligible(q, k, s, t_max, d)
        ):
            sc = _pick_sc(s, nh // k.shape[1])
            return flash_attention(
                q, k, v, positions, seq_lens, scale=scale,
                sliding_window=sliding_window,
                k_scale=k_scale, v_scale=v_scale, sc=sc, c=512,
            )
        return chunked_attention(
            q, k, v, positions, seq_lens, scale=scale,
            sliding_window=sliding_window, k_scale=k_scale, v_scale=v_scale,
            q_chunk=min(q_chunk, s), kv_chunk=kv_chunk,
            segment_ids=segment_ids, logit_softcap=logit_softcap,
        )
    if s == 1 and t_max >= 4096:
        # Decode over a long cache: the chunk-skipping path reads (and
        # computes) only the live prefix — ~4x faster than the full-T
        # naive sweep early in a sequence, ties at full context (v5e).
        kc = min(2048, max(512, t_max // 8))
        return chunked_attention(
            q, k, v, positions, seq_lens, scale=scale,
            sliding_window=sliding_window, k_scale=k_scale, v_scale=v_scale,
            q_chunk=1, kv_chunk=kc, logit_softcap=logit_softcap,
        )
    return naive_attention(
        q, k, v, positions, seq_lens, scale=scale,
        sliding_window=sliding_window, k_scale=k_scale, v_scale=v_scale,
        segment_ids=segment_ids, logit_softcap=logit_softcap,
    )
