"""Serving engine: continuous batching over fixed decode slots.

The reference's only concurrency is three CUDA streams in its benchmark
harness (reference ``benchmark.py:68-84``).  The TPU build supplies a real
decode loop: a fixed batch of slots steps together every iteration (one
jitted ``decode_step`` for the whole batch), finished sequences retire and
their slots are immediately refilled from the pending queue (continuous
batching), and per-slot prefills are written into the shared KV cache with a
batch-dim scatter.

Prompt lengths are bucketed to powers of two so the jitted prefill compiles
once per bucket, not once per prompt length.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.llama import (
    KVCache,
    LlamaConfig,
    LlamaParams,
    decode_step,
    forward,
    init_kv_cache,
)
from ..utils.shapes import bucket_len
from .sampling import BatchedSampling, SamplingParams, sample, sample_batched
from .speculative import propose_ngram

__all__ = ["Engine", "GenerationResult"]


@dataclasses.dataclass
class GenerationResult:
    prompt: List[int]
    tokens: List[int]  # generated tokens (without the prompt)
    finished: bool  # True if EOS reached (False if max_new_tokens hit)
    # log P(token | prefix) for each generated token, when the engine was
    # asked for them (generate(..., return_logprobs=True)); else None.
    logprobs: Optional[List[float]] = None
    # Top-N (token_id, logprob) alternatives of the raw next-token
    # distribution at each generated position, when the request's
    # SamplingParams.top_logprobs > 0; else None.
    top_logprobs: Optional[List[List[tuple]]] = None


@functools.partial(jax.jit, static_argnames=("k",))
def _top_logprobs_dev(logits: jax.Array, k: int):
    """(values, token_ids) of the top-k raw log-softmax per row [B, k]."""
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return jax.lax.top_k(lp, k)


@jax.jit
def _token_logprobs(logits: jax.Array, tokens) -> jax.Array:
    """log P(tokens) under log_softmax(logits); logits [B, V], tokens [B]."""
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return lp[jnp.arange(lp.shape[0]), jnp.asarray(tokens)]


def _tp_decode_wrap(params, token, cache, positions, *, cfg, mesh, axis, data_axis):
    from ..parallel.tp import tp_decode_step

    return tp_decode_step(
        params, cfg, mesh, token, cache, positions, axis=axis, data_axis=data_axis
    )


def _decode_bank_wrap(bundle, token, cache, positions, *, cfg):
    """decode_step over a (base params, adapter bank, slot adapter ids)
    bundle — the multi-LoRA serving step.  The bundle rides the normal
    ``params`` argument slot so every decode path (single-step, the
    lax.scan multi-step chunks) works unchanged."""
    base, bank, ids = bundle
    return decode_step(
        base, cfg, token=token, cache=cache, positions=positions,
        lora=bank, adapter_ids=ids,
    )


def _prefill_bank_impl(
    bundle, tokens, lengths, cache, slots, start, *, cfg, bucket
):
    """Engine._prefill_impl over a (base, bank, ids) bundle; each prefill
    row adopts its slot's adapter (ids[slots])."""
    base, bank, ids = bundle
    return Engine._prefill_impl(
        base, tokens, lengths, cache, slots, start, cfg=cfg, bucket=bucket,
        lora=bank, adapter_ids=ids[slots],
    )


def _fwd_wrap(params, tokens, cache, positions, seq_lens, *, cfg):
    """Model forward with the signature spec_verify expects."""
    return forward(params, cfg, tokens, cache, positions, seq_lens)


def _tp_fwd_wrap(
    params, tokens, cache, positions, seq_lens, *, cfg, mesh, axis, data_axis
):
    from ..parallel.tp import tp_forward

    # Full [B, S, V] logits (vocab-sharded over `axis`); the argmax in
    # spec_verify runs outside the shard_map, where GSPMD handles the
    # sharded-vocab reduction.
    return tp_forward(
        params, cfg, mesh, tokens, cache, positions, seq_lens,
        axis=axis, data_axis=data_axis,
    )


def _common_prefix_len(prompts) -> int:
    """Length of the longest token prefix shared by ALL prompts."""
    it = iter(prompts)
    first = list(next(it))
    n = len(first)
    for p in it:
        p = list(p)
        m = min(n, len(p))
        i = 0
        while i < m and p[i] == first[i]:
            i += 1
        n = i
        if n == 0:
            break
    return n


@jax.jit
def _bcast_slot0(cache):
    """Copy cache slot 0's row to every slot (all leaves index the slot
    axis at position 1 — layers lead).  Used after prefilling a shared
    prefix into slot 0 so every later continuation finds it in place."""
    return jax.tree.map(
        lambda a: jnp.broadcast_to(a[:, :1], a.shape), cache
    )


@jax.jit
def _slot0_row(cache):
    """Extract slot 0's cache row (kept on device for cross-call reuse)."""
    return jax.tree.map(lambda a: a[:, :1], cache)


@jax.jit
def _bcast_row(cache, row):
    """Fill every slot of ``cache`` with the saved prefix ``row``."""
    return jax.tree.map(
        lambda a, r: jnp.broadcast_to(r, a.shape), cache, row
    )


@jax.jit
def _mask_record(mask, toks, active):
    """Record emitted tokens in the device-resident [B, V] emitted-token
    state (bool mask, or int32 counts — dtype is trace-static) for rows
    where ``active``; never round-trips to host."""
    upd = mask.at[jnp.arange(mask.shape[0]), toks]
    hit = upd.set(True) if mask.dtype == jnp.bool_ else upd.add(1)
    return jnp.where(active[:, None], hit, mask)


def _decode_multi_impl(
    params, token, cache, positions, gen_mask, keys, active, *, step,
    sampling, n_steps, top_lp_k=0,
):
    """Run ``n_steps`` decode+sample iterations on-device (one host sync per
    chunk instead of per token — the host readback dominates small-model
    decode).  ``active [B]`` bool: idle slots ride along frozen (token and
    position held, KV garbage overwrites one already-stale cache row slot)
    — decode is weight-bound, so a partially-idle chunk costs what a full
    one does, and the tail of a wave keeps chunk speed after early slots
    retire.  Returns (tokens [n, B], logprobs [n, B], cache, positions,
    gen_mask)."""
    from .sampling import sample

    def body(carry, key_i):
        tok, cache, pos, mask = carry
        logits, cache = step(params, token=tok, cache=cache, positions=pos)
        lg = logits.astype(jnp.float32)
        if sampling.temperature == 0.0:
            nxt = sample(lg, sampling, generated_mask=mask)
        else:
            nxt = sample(lg, sampling, key_i, generated_mask=mask)
        nxt = jnp.where(active, nxt, tok)
        lpf = jax.nn.log_softmax(lg, axis=-1)
        lp = lpf[jnp.arange(lg.shape[0]), nxt]
        if mask is not None:
            hit = mask.at[jnp.arange(mask.shape[0]), nxt].set(True)
            mask = jnp.where(active[:, None], hit, mask)
        ys = (nxt, lp) + (
            tuple(jax.lax.top_k(lpf, top_lp_k)) if top_lp_k else ()
        )
        return (nxt, cache, pos + active.astype(pos.dtype), mask), ys

    (tok, cache, pos, mask), ys = jax.lax.scan(
        body, (token, cache, positions, gen_mask), keys, length=n_steps
    )
    toks, lps = ys[0], ys[1]
    tops = (ys[2], ys[3]) if top_lp_k else None
    return toks, lps, tops, cache, pos, mask


def _decode_multi_impl_batched(
    params, token, cache, positions, gen_mask, keys, bp, step_idx, bias,
    active, *, step, n_steps, top_lp_k=0,
):
    """Per-request variant of :func:`_decode_multi_impl`: sampling
    parameters arrive as a traced :class:`BatchedSampling` pytree (one row
    per slot), so ONE compilation per chunk length serves every parameter
    mix.  ``step_idx`` [B] carries each slot's generated-token count so
    seeded rows stay reproducible across chunk boundaries; ``bias`` is
    the per-slot dense logit-bias grid (or None); ``active [B]`` freezes
    idle slots (see :func:`_decode_multi_impl`)."""

    def body(carry, key_i):
        tok, cache, pos, mask, sidx = carry
        logits, cache = step(params, token=tok, cache=cache, positions=pos)
        lg = logits.astype(jnp.float32)
        nxt = sample_batched(
            lg, bp, key_i, generated_mask=mask, step_idx=sidx,
            logit_bias=bias,
        )
        nxt = jnp.where(active, nxt, tok)
        lpf = jax.nn.log_softmax(lg, axis=-1)
        lp = lpf[jnp.arange(lg.shape[0]), nxt]
        if mask is not None:
            upd = mask.at[jnp.arange(mask.shape[0]), nxt]
            hit = upd.set(True) if mask.dtype == jnp.bool_ else upd.add(1)
            mask = jnp.where(active[:, None], hit, mask)
        ys = (nxt, lp) + (
            tuple(jax.lax.top_k(lpf, top_lp_k)) if top_lp_k else ()
        )
        return (nxt, cache, pos + active.astype(pos.dtype), mask, sidx + 1), ys

    (tok, cache, pos, mask, _sidx), ys = jax.lax.scan(
        body,
        (token, cache, positions, gen_mask, step_idx),
        keys,
        length=n_steps,
    )
    toks, lps = ys[0], ys[1]
    tops = (ys[2], ys[3]) if top_lp_k else None
    return toks, lps, tops, cache, pos, mask


@jax.jit
def _mask_reset(mask, slots, toks):
    """Clear rows ``slots`` and record their first generated tokens
    (bool mask or int32 counts — dtype is trace-static)."""
    if mask.dtype == jnp.bool_:
        return mask.at[slots].set(False).at[slots, toks].set(True)
    return mask.at[slots].set(0).at[slots, toks].set(1)


_sample_batched_jit = jax.jit(sample_batched)


def _draft_dec_wrap(params, token, cache, positions, *, cfg):
    """Decode-step-shaped forward for the draft LM inside the device-
    chained draft chunks (jit-hash-stable top-level partial target)."""
    return decode_step(
        params, cfg, token=token, cache=cache, positions=positions
    )


def _bucket(n: int, minimum: int = 16) -> int:
    return bucket_len(n, minimum)


class Engine:
    """Synchronous continuous-batching engine over a fixed slot count.

    Pass ``mesh`` (a ``jax.sharding.Mesh`` with a tensor-parallel axis) to
    serve through the TP layer: the engine localizes + shards the params
    (``cfg.tp_shards`` must equal the mesh's TP degree), keeps the KV cache
    head-sharded, and routes prefill/decode through ``parallel.tp``'s
    shard_mapped entry points.  Logits stay vocab-sharded until sampling.

    When the mesh also has a data-parallel axis (``make_mesh(tp=4, dp=2)``),
    the engine shards its decode slots over it automatically: the slot batch,
    KV cache, and decode step split on ``dp`` while weights are replicated
    across it (BASELINE config 5's tensor+data layout).  ``batch_size`` must
    then be a multiple of the dp degree.  Prefill groups run with the batch
    replicated over dp (grouped prefill shapes are not generally divisible
    by dp; the hot decode loop is where dp throughput matters).

    ``spec_k > 0`` enables prompt-lookup speculative decoding
    (serve/speculative.py): token-identical to plain decode for greedy
    requests, distribution-preserving rejection sampling for stochastic
    ones (only the repetition penalty falls back to normal decode).
    ``prefix_cache=True`` enables shared-prefix prefill reuse
    (token-identical).
    """

    def __init__(
        self,
        params: LlamaParams,
        cfg: LlamaConfig,
        batch_size: int = 8,
        eos_token: int = 2,
        sampling: SamplingParams = SamplingParams(),
        seed: int = 0,
        mesh=None,
        tp_axis: str = "tp",
        data_axis: Optional[str] = "auto",
        decode_chunk: int = 8,
        pipeline_decode: bool = True,
        spec_k: int = 0,
        spec_ngram: int = 3,
        draft=None,
        prefix_cache: bool = False,
        lora_bank=None,
    ):
        self.cfg = cfg
        self.batch_size = batch_size
        self.eos_token = eos_token
        self.sampling = sampling
        self._key = jax.random.PRNGKey(seed)
        self.mesh = mesh
        self.tp_axis = tp_axis
        # Decode steps per host sync when all slots are busy (1 disables).
        # Stochastic sampling consumes a different (but equally valid) key
        # sequence than single-stepping; greedy output is identical.
        self.decode_chunk = decode_chunk
        # Overlap each decode chunk's host readback/bookkeeping with the
        # NEXT chunk's device compute (see generate()'s multi-step branch).
        # Greedy output is token-identical with or without; stochastic
        # requests consume a different — equally valid — key sequence when
        # a speculative chunk is discarded.  Costs one extra in-flight KV
        # cache buffer; disable when HBM is the constraint.
        self.pipeline_decode = pipeline_decode
        self.pipeline_stats = {"launched": 0, "discarded": 0}
        self._decode_multi_cache = {}
        self._decode_multi_b_cache = {}
        # Speculative decoding (prompt-lookup drafts, serve/speculative.py):
        # verify spec_k drafted tokens per forward when every slot is busy
        # (greedy accept rule, or rejection sampling for stochastic
        # requests).  0 disables.  spec_k must stay below the minimum
        # prefill bucket (16) so a refill prefill always overwrites the
        # garbage an idle slot's verify wrote at positions 0..spec_k.
        assert 0 <= spec_k < 16, "spec_k must be in [0, 16)"
        self.spec_k = spec_k
        self.spec_ngram = spec_ngram
        self._spec_cache = {}
        self._spec_chunk_cache = {}
        self._spec_sampled_cache = {}
        self._spec_chunk_sampled_cache = {}
        # Adaptive speculation: prompt-lookup acceptance is workload-
        # dependent (high on self-repetitive output, ~zero on novel text),
        # and a verify step costs 1.02-1.19x a decode step — so when the
        # measured mean acceptance per verify step drops below
        # ``spec_min_accept``, speculation pauses for ``spec_cooldown``
        # scheduling rounds (plain chunked decode serves them), then
        # probes again.  Consecutive failed probes BACK OFF exponentially
        # (cooldown doubles up to ``spec_cooldown_max``; any good probe
        # resets it) — so a persistently adversarial workload pays the
        # probe tax at a vanishing rate and floats at ~plain throughput,
        # while a workload that turns repetitive is rediscovered within
        # one capped cooldown.  Every output contract is unaffected
        # (greedy stays token-identical and sampled marginals are
        # preserved on BOTH paths).
        self.spec_min_accept = 0.15
        self.spec_cooldown = 8
        self.spec_cooldown_max = 128
        self._spec_pause = 0
        self._spec_backoff = 0  # current cooldown (0 = reset to base)
        # Observability: verify steps taken / tokens emitted through them
        # (ratio emitted/steps = mean tokens per verify = the speedup lever).
        self.spec_stats = {"steps": 0, "emitted": 0, "pauses": 0}
        # DRAFT-MODEL speculation: ``draft=(draft_params, draft_cfg)`` uses
        # a small LM (greedy) to propose the spec_k drafts instead of
        # prompt lookup — covers novel text where n-gram lookup never hits.
        # The draft keeps its own KV cache in LOCKSTEP with the target
        # (same slot_pos): an accepted position's draft KV is already
        # correct (the accepted token IS the draft token, computed on the
        # same accepted prefix), the correction token's KV is written by
        # the next propose (which processes cur_token first), and rejected
        # tails are overwritten because the next propose starts exactly at
        # pos + accepted + 1.  No catch-up forward needed.  Uses the
        # host-stepped verify path (the device-chained chunks stay
        # prompt-lookup); single-device engines only for now.
        self._draft = None
        if draft is not None:
            assert spec_k > 0, "draft= requires spec_k > 0"
            assert mesh is None, "draft-model speculation is single-device"
            dparams, dcfg = draft
            assert dcfg.vocab_size == cfg.vocab_size, (
                "draft and target must share a vocabulary"
            )
            assert dcfg.max_seq_len >= cfg.max_seq_len, (
                "draft max_seq_len must cover the target's"
            )
            self._draft = (dparams, dcfg)
            self._draft_init_cache = functools.partial(
                init_kv_cache, dcfg, batch_size
            )
            self._draft_prefill = jax.jit(
                functools.partial(self._prefill_impl, cfg=dcfg),
                static_argnames=("bucket",),
            )
            self._draft_propose_cache = {}
            self._spec_chunk_draft_cache = {}
            self._spec_chunk_draft_sampled_cache = {}
        # Shared-prefix caching: when all prompts of a generate() call share
        # a token prefix (few-shot / RAG / long system prompt), prefill it
        # ONCE, broadcast its KV to every slot, and prefill only each
        # prompt's remainder.  Prefill work drops from sum(len_i) to
        # Lp + sum(len_i - Lp) tokens.  The prefix region [0, Lp) of every
        # slot stays valid across continuous-batching refills because both
        # continuation prefill and decode only write positions >= Lp.
        self.prefix_cache = prefix_cache
        self.prefix_stats = {"prefix_len": 0, "tokens_saved": 0}
        # Multi-LoRA serving: a bank of adapters over ONE frozen 4-bit
        # base, selected per request (generate(..., adapter=[i, ...])).
        # Accepts a pre-stacked bank (train.lora.stack_adapters) or a
        # sequence of LoraParams to stack here.  The bank + per-slot
        # adapter ids ride the params argument as a bundle, so slot
        # reassignment never recompiles the decode program.
        self._bank = None
        self.num_adapters = 0
        if lora_bank is not None:
            assert mesh is None, (
                "multi-LoRA serving is single-device only for now; "
                "merge_lora an adapter into the packed weights to serve "
                "it over a mesh"
            )
            assert spec_k == 0 and not prefix_cache, (
                "lora_bank is not yet composable with speculative decoding "
                "or prefix caching"
            )
            if isinstance(lora_bank, (list, tuple)):
                from ..train.lora import stack_adapters

                lora_bank = stack_adapters(lora_bank)
            self._bank = lora_bank
            ref = next(
                getattr(lora_bank.layers, f)
                for f in ("qkv", "o", "gateup", "down")
                if getattr(lora_bank.layers, f) is not None
            )
            assert ref.a.ndim == 4, (
                "lora_bank must be a STACKED bank ([L, A, r, in] leaves) — "
                "use train.lora.stack_adapters, or pass a list of adapters"
            )
            self.num_adapters = ref.a.shape[1]
        # Cross-call reuse: (prefix token tuple, device-resident KV row).
        # A server with a fixed system prompt pays its prefill ONCE per
        # engine lifetime, not once per generate() call.
        self._prefix_saved = None

        if mesh is not None:
            from ..parallel.tp import (
                init_sharded_kv_cache,
                localize_params,
                shard_params,
                tp_decode_step,
            )

            if data_axis == "auto":
                data_axis = (
                    "dp"
                    if "dp" in mesh.axis_names and mesh.shape["dp"] > 1
                    else None
                )
            if data_axis is not None:
                dp = mesh.shape[data_axis]
                assert batch_size % dp == 0, (
                    f"batch_size {batch_size} must be a multiple of the "
                    f"data-parallel degree {dp} (axis {data_axis!r})"
                )
            self.data_axis = data_axis
            tp = mesh.shape[tp_axis]
            self.params, _ = shard_params(
                localize_params(params, tp, cfg.moe_shard),
                mesh,
                tp_axis,
                cfg.moe_shard,
            )
            self._decode = jax.jit(
                functools.partial(
                    _tp_decode_wrap,
                    cfg=cfg,
                    mesh=mesh,
                    axis=tp_axis,
                    data_axis=data_axis,
                )
            )
            self._prefill_g = jax.jit(
                functools.partial(
                    self._prefill_impl_tp, cfg=cfg, mesh=mesh, axis=tp_axis
                ),
                static_argnames=("bucket",),
            )
            self._init_cache = functools.partial(
                init_sharded_kv_cache,
                cfg,
                batch_size,
                mesh,
                tp_axis,
                data_axis=data_axis,
            )
        elif self._bank is not None:
            self.data_axis = None
            # (base, bank, per-slot adapter ids) bundle; ids start at -1
            # (no adapter) and are rewritten at refill time.
            self.params = (
                params,
                self._bank,
                jnp.full((batch_size,), -1, dtype=jnp.int32),
            )
            self._decode = jax.jit(functools.partial(_decode_bank_wrap, cfg=cfg))
            self._prefill_g = jax.jit(
                functools.partial(_prefill_bank_impl, cfg=cfg),
                static_argnames=("bucket",),
            )
            self._init_cache = functools.partial(init_kv_cache, cfg, batch_size)
        else:
            self.data_axis = None
            self.params = params
            self._decode = jax.jit(
                functools.partial(decode_step, cfg=cfg), static_argnames=()
            )
            self._prefill_g = jax.jit(
                functools.partial(self._prefill_impl, cfg=cfg),
                static_argnames=("bucket",),
            )
            self._init_cache = functools.partial(init_kv_cache, cfg, batch_size)

    # -- jitted pieces ------------------------------------------------------

    # Prompts longer than this prefill in segments inside the jitted call,
    # bounding activation memory to O(G * segment) — an 8k-token prompt at
    # Llama-3-8B would otherwise allocate multi-GB fused-MLP activations.
    PREFILL_SEGMENT = 2048

    @staticmethod
    def _prefill_impl(
        params, tokens, lengths, cache, slots, start, *, cfg, bucket,
        lora=None, adapter_ids=None,
    ):
        """Prefill a GROUP of sequences (each padded to `bucket`) into cache
        slots ``slots``; returns (last_logits [G, V], cache).

        tokens [G, bucket], lengths [G], slots [G], start [G] int32.
        ``start`` is each sequence's first absolute position — 0 for a
        fresh prompt, the shared-prefix length for a continuation prefill
        on top of already-cached context (the prefix-cache path); cache
        positions below ``start`` are left untouched.  The cache is an
        opaque pytree (bf16 k/v, or int8 k/v plus scale leaves when
        ``cfg.kv_quant``); slot rows are gathered/scattered on the batch
        axis so one jitted call serves any same-bucket group.  Buckets
        above PREFILL_SEGMENT run as a ``lax.scan`` over segments (chunked
        prefill); each sequence's last-token logits are picked from the
        segment containing its last token."""
        g = tokens.shape[0]
        slot_cache = jax.tree.map(lambda a: a[:, slots], cache)

        seg = Engine.PREFILL_SEGMENT
        if bucket <= seg:
            positions = start[:, None] + jnp.broadcast_to(
                jnp.arange(bucket, dtype=jnp.int32), (g, bucket)
            )
            last, new_slot_cache = forward(
                params, cfg, tokens, slot_cache, positions, start + lengths,
                last_only=True, lora=lora, adapter_ids=adapter_ids,
            )
        else:
            nseg = -(-bucket // seg)
            toks_pad = jnp.pad(tokens, ((0, 0), (0, nseg * seg - bucket)))

            def seg_body(carry_cache, si):
                t0 = si * seg
                seg_toks = jax.lax.dynamic_slice_in_dim(
                    toks_pad, t0, seg, axis=1
                )
                positions = start[:, None] + jnp.broadcast_to(
                    t0 + jnp.arange(seg, dtype=jnp.int32), (g, seg)
                )
                seg_lens = start + jnp.minimum(lengths, t0 + seg)
                logits_seg, carry_cache = forward(
                    params, cfg, seg_toks, carry_cache, positions, seg_lens,
                    last_only=True, lora=lora, adapter_ids=adapter_ids,
                )
                return carry_cache, logits_seg

            new_slot_cache, seg_logits = jax.lax.scan(
                seg_body, slot_cache, jnp.arange(nseg, dtype=jnp.int32)
            )
            seg_idx = jnp.clip((lengths - 1) // seg, 0, nseg - 1)
            last = seg_logits[seg_idx, jnp.arange(g)]

        cache = jax.tree.map(
            lambda full, new: full.at[:, slots].set(new), cache, new_slot_cache
        )
        return last, cache

    @staticmethod
    def _prefill_impl_tp(
        params, tokens, lengths, cache, slots, start, *, cfg, mesh, axis,
        bucket
    ):
        """TP variant of :meth:`_prefill_impl`: the forward runs shard_mapped
        over the mesh; the slot gather/scatter stays outside (plain XLA ops
        on head-sharded cache leaves).  Long buckets segment exactly like
        the single-device path."""
        from ..parallel.tp import tp_forward

        g = tokens.shape[0]
        slot_cache = jax.tree.map(lambda a: a[:, slots], cache)

        seg = Engine.PREFILL_SEGMENT
        if bucket <= seg:
            positions = start[:, None] + jnp.broadcast_to(
                jnp.arange(bucket, dtype=jnp.int32), (g, bucket)
            )
            last, new_slot_cache = tp_forward(
                params, cfg, mesh, tokens, slot_cache, positions,
                start + lengths, axis=axis, last_only=True,
            )
        else:
            nseg = -(-bucket // seg)
            toks_pad = jnp.pad(tokens, ((0, 0), (0, nseg * seg - bucket)))

            def seg_body(carry_cache, si):
                t0 = si * seg
                seg_toks = jax.lax.dynamic_slice_in_dim(
                    toks_pad, t0, seg, axis=1
                )
                positions = start[:, None] + jnp.broadcast_to(
                    t0 + jnp.arange(seg, dtype=jnp.int32), (g, seg)
                )
                seg_lens = start + jnp.minimum(lengths, t0 + seg)
                logits_seg, carry_cache = tp_forward(
                    params, cfg, mesh, seg_toks, carry_cache, positions,
                    seg_lens, axis=axis, last_only=True,
                )
                return carry_cache, logits_seg

            new_slot_cache, seg_logits = jax.lax.scan(
                seg_body, slot_cache, jnp.arange(nseg, dtype=jnp.int32)
            )
            seg_idx = jnp.clip((lengths - 1) // seg, 0, nseg - 1)
            last = seg_logits[seg_idx, jnp.arange(g)]

        cache = jax.tree.map(
            lambda full, new: full.at[:, slots].set(new), cache, new_slot_cache
        )
        return last, cache

    # -- public API ---------------------------------------------------------

    @staticmethod
    def admissible(features, prompt, sp: SamplingParams, *,
                   logprobs: bool = False, adapter=None) -> bool:
        """Can an in-flight generate() call (described by the ``features``
        dict its ``admit`` callback receives) serve this request?

        A generate() call compiles/allocates only the sampling machinery
        its INITIAL requests need (penalty masks, bias rows, top-k
        logprobs, per-token logprobs); a late request needing more must
        wait for the next call.  Prefix-cached calls additionally require
        admitted prompts to extend the shared prefix."""
        if logprobs and not features["return_logprobs"]:
            return False
        if len(prompt) == 0 or len(prompt) > features["max_prompt_len"]:
            return False
        if sp.top_logprobs > features["top_lp_k"]:
            return False
        needs_counts = (
            sp.presence_penalty != 0.0 or sp.frequency_penalty != 0.0
        )
        if needs_counts and not features["use_counts"]:
            return False
        if (
            needs_counts or sp.repetition_penalty != 1.0
        ) and not features["use_mask"]:
            return False
        if (
            sp.logit_bias or sp.min_new_tokens > 0 or sp.choices
        ) and not features["use_bias"]:
            return False
        if adapter is not None and not (
            features["adapters"]
            and -1 <= int(adapter) < features["num_adapters"]
        ):
            return False
        prefix = features["prefix"]
        if prefix and (
            len(prompt) <= len(prefix)
            or tuple(prompt[: len(prefix)]) != prefix
        ):
            return False
        return True

    def generate(
        self,
        prompts: Sequence[Sequence[int]],
        max_new_tokens: int = 64,
        sampling=None,
        return_logprobs: bool = False,
        stop_tokens: Optional[Sequence[int]] = None,
        on_token=None,
        adapter=None,
        admit=None,
        cancel=None,
    ) -> List[GenerationResult]:
        """Generate completions for all prompts with continuous batching.

        ``sampling`` is a single :class:`SamplingParams` for the whole
        call, or one per prompt (a sequence, ``None`` entries defaulting
        to the engine's) — per-request parameters ride a traced
        ``BatchedSampling`` pytree, so the decode program compiles once
        per chunk length, not once per parameter mix.
        ``return_logprobs=True`` also records log P(token | prefix) for each
        generated token.  ``stop_tokens`` adds extra end-of-sequence ids on
        top of the engine's ``eos_token``; each request's
        ``SamplingParams.stop_tokens`` adds its own on top of that, and
        ``SamplingParams.max_new_tokens`` overrides the call-level budget
        for that request (both are host-side scheduler controls — they
        never enter a compiled program).  ``on_token(request_idx, token)``,
        when given, is called as each token is emitted (streaming).

        ``adapter`` (engines built with ``lora_bank=...``): one bank index
        per prompt (or ``None`` for the bare base model) — requests with
        DIFFERENT adapters batch together in one wave; a slot adopts its
        request's adapter at refill and the decode program never
        recompiles across adapter mixes.

        ``admit`` enables CROSS-CALL continuous batching: whenever a slot
        frees up and the internal queue is empty, ``admit(features)`` is
        called and may return new ``(prompt_tokens, SamplingParams,
        adapter_or_None)`` requests to join the in-flight batch — they are
        appended to the request list (their results extend the returned
        list in admission order) and prefill into the freed slots while
        the other slots keep decoding, so a late HTTP request does not
        wait for the whole wave.  ``features`` describes what machinery
        this call compiled in; callers must only admit requests for which
        :meth:`admissible` is True (asserted) — incompatible requests wait
        for the next call, which builds whatever they need.  When the
        ``admit`` callable additionally exposes a ``peek()`` attribute
        (``admit.peek() -> bool``, True when work is waiting), the
        pipelined chunk loops poll it between chunks and break out to
        refill as soon as a request is waiting AND a slot is idle —
        without it, a request arriving while idle slots ride frozen
        through a long pipelined run waits for the run to end (the loop
        otherwise only exits on a retirement).  The HTTP dispatcher wires
        this to its queue; plain callables keep the old cadence.

        ``cancel(request_idx) -> bool``, when given, is polled at every
        host sync: a request reporting True retires immediately (its
        result carries whatever was generated, ``finished=False``) and
        its slot refills from the queue / ``admit`` — a disconnected
        HTTP client stops consuming chip time within one decode chunk.
        Cancellation is a host-side scheduler control: it never enters
        a compiled program, and in-flight pipelined chunks are simply
        discarded (the device path is functional, so there is nothing
        to roll back)."""
        if sampling is None:
            sampling = self.sampling
        if isinstance(sampling, SamplingParams):
            # Uniform calls that need per-row machinery route through
            # per-request mode: seeds (per-row keys) and presence/
            # frequency penalties (the counts-aware batched sampler).
            per_req = (
                [sampling] * len(prompts)
                if (
                    sampling.seed is not None
                    or sampling.presence_penalty != 0.0
                    or sampling.frequency_penalty != 0.0
                    or sampling.logit_bias
                    or sampling.min_new_tokens > 0
                    or sampling.choices
                )
                else None
            )
        else:
            per_req = [
                p if p is not None else self.sampling for p in sampling
            ]
            assert len(per_req) == len(prompts), (
                f"per-request sampling needs one SamplingParams per prompt "
                f"(got {len(per_req)} for {len(prompts)} prompts)"
            )
            sampling = self.sampling  # only per_req drives sampling below
        if admit is not None and per_req is None:
            # Admission appends per-request entries; run in per-request
            # mode from the start so the lists exist to append to.
            per_req = [sampling] * len(prompts)
        prompts = [list(p) for p in prompts]  # admission appends
        cfg = self.cfg
        B = self.batch_size
        base_stops = frozenset({self.eos_token} | set(stop_tokens or ()))

        def _sp_for(r: int) -> SamplingParams:
            return per_req[r] if per_req is not None else sampling

        req_stops = [
            base_stops | set(_sp_for(r).stop_tokens)
            for r in range(len(prompts))
        ]
        req_budget = [
            _sp_for(r).max_new_tokens
            if _sp_for(r).max_new_tokens is not None
            else max_new_tokens
            for r in range(len(prompts))
        ]
        for r in range(len(prompts)):
            if _sp_for(r).choices:
                # Guided choice: the budget must cover the longest option.
                req_budget[r] = max(
                    req_budget[r], max(len(c) for c in _sp_for(r).choices)
                )
        assert all(b >= 1 for b in req_budget), (
            "max_new_tokens must be >= 1 for every request"
        )

        if adapter is not None:
            assert self._bank is not None, (
                "generate(adapter=...) needs Engine(lora_bank=...)"
            )
            assert len(adapter) == len(prompts), (
                f"one adapter index per prompt: got {len(adapter)} "
                f"for {len(prompts)}"
            )
            req_adapter = [
                -1 if a is None else int(a) for a in adapter
            ]
            assert all(-1 <= a < self.num_adapters for a in req_adapter), (
                f"adapter indices must be in [0, {self.num_adapters}) or None"
            )
        else:
            req_adapter = [-1] * len(prompts)

        queue = list(range(len(prompts)))
        results: List[Optional[GenerationResult]] = [None] * len(prompts)

        cache = self._init_cache()
        # Draft-model speculation: the draft LM's own KV cache, kept in
        # lockstep with slot_pos (see __init__).  draft_pos[s] = positions
        # the draft cache validly covers (< draft_pos[s]); a slot whose
        # draft lags (plain rounds during an adaptive pause, or a fully-
        # accepted run) is caught up by a continuation prefill of the gap
        # before the next propose.
        draft_cache = (
            self._draft_init_cache() if self._draft is not None else None
        )
        draft_pos = np.zeros((B,), dtype=np.int64)
        # Latest spec round's verdict: mean acceptance >= threshold.
        # Draft-mode waves stay in the probing stance (short unpipelined
        # chunks) until one round clears it — draft acceptance is model
        # agreement, not history-dependent (see the probing note below).
        spec_confident = [False]

        # Shared-prefix cache: prefill the common prefix once into slot 0,
        # broadcast its KV row to every slot, then treat each prompt as a
        # continuation of length len(prompt) - Lp.  Lp is capped one below
        # the shortest prompt so every request still prefills >= 1 token
        # (the token that produces its first logits).
        prefix_len = 0
        if self.prefix_cache and len(prompts) >= 2:
            lcp = _common_prefix_len(prompts)
            shortest = min((len(p) for p in prompts), default=0)
            lcp = min(lcp, shortest - 1, cfg.max_seq_len - 2)
            if lcp >= 16:
                prefix_len = lcp
                ptoks = tuple(prompts[0][:prefix_len])
                if (
                    self._prefix_saved is not None
                    and self._prefix_saved[0] == ptoks
                ):
                    # Same prefix as a previous generate() call: reuse the
                    # saved KV row, no prefill at all.
                    cache = _bcast_row(cache, self._prefix_saved[1])
                    reused = True
                else:
                    bucket = min(_bucket(prefix_len), cfg.max_seq_len)
                    toks = np.zeros((1, bucket), dtype=np.int32)
                    toks[0, :prefix_len] = ptoks
                    _last, cache = self._prefill_g(
                        self.params,
                        jnp.asarray(toks),
                        jnp.asarray([prefix_len], dtype=jnp.int32),
                        cache,
                        jnp.asarray([0], dtype=jnp.int32),
                        jnp.asarray([0], dtype=jnp.int32),
                        bucket=bucket,
                    )
                    self._prefix_saved = (ptoks, _slot0_row(cache))
                    cache = _bcast_slot0(cache)
                    reused = False
                self.prefix_stats = {
                    "prefix_len": prefix_len,
                    "tokens_saved": prefix_len * (len(prompts) - 1),
                    "reused": reused,
                }

        # Per-slot host state.
        slot_req = [-1] * B  # request index or -1 (idle)
        slot_pos = np.zeros(B, dtype=np.int32)  # next position to write
        slot_generated: List[List[int]] = [[] for _ in range(B)]
        slot_logprobs: List[List[float]] = [[] for _ in range(B)]
        cur_token = np.zeros(B, dtype=np.int32)
        # Emitted-token state per slot for the repetition / presence /
        # frequency penalties (opt-in).  DEVICE-resident: one scatter per
        # step instead of re-uploading a [B, vocab] host array.  A bool
        # mask suffices for the repetition penalty; int32 counts are kept
        # when any request uses the additive penalties.
        def _uses_mask(p):
            return (
                p.repetition_penalty != 1.0
                or p.presence_penalty != 0.0
                or p.frequency_penalty != 0.0
            )

        def _uses_counts(p):
            return p.presence_penalty != 0.0 or p.frequency_penalty != 0.0

        sps_all = [sampling] if per_req is None else per_req
        # Top-k alternatives: the device computes top-max(k) once per step
        # for the whole batch; each request slices its own k at retire.
        top_lp_k = max((p.top_logprobs for p in sps_all), default=0)
        slot_toplp: List[List[List[tuple]]] = [[] for _ in range(B)]
        use_mask = any(_uses_mask(p) for p in sps_all)
        use_counts = any(_uses_counts(p) for p in sps_all)
        gen_mask = (
            jnp.zeros(
                (B, cfg.vocab_size),
                dtype=jnp.int32 if use_counts else bool,
            )
            if use_mask
            else None
        )
        # Per-slot sampling params (per-request mode); idle slots keep a
        # harmless default — their sampled tokens are discarded anyway.
        slot_sp: List[SamplingParams] = [SamplingParams()] * B
        # Per-slot dense logit-bias rows, device-resident; rows are
        # replaced at refill (rare) so plain decode steps upload nothing.
        # Slots with PROGRESS-DEPENDENT masks (min_new_tokens eos/stop
        # bans, guided-choice constraints) are "dynamic": their rows are
        # rebuilt at every host sync from the single source of truth
        # below (_np_row), so the two mechanisms compose instead of
        # clobbering each other.
        use_bias = any(
            p.logit_bias or p.min_new_tokens > 0 or p.choices
            for p in sps_all
        )
        slot_bias = (
            jnp.zeros((B, cfg.vocab_size), jnp.float32) if use_bias else None
        )
        slot_dynamic = [False] * B
        # Cache key of each slot's last-uploaded row: min-ban rows are
        # CONSTANT until the crossing (key = banned?), choice rows change
        # with every emitted token (key = progress) — skipping unchanged
        # rows keeps the per-step host work O(choice slots), not O(B*V).
        slot_rowkey = [None] * B

        def _row_key(p: SamplingParams, gen):
            if p.choices:
                return ("choice", len(gen))
            return ("ban", p.min_new_tokens > len(gen))

        def _np_row(p: SamplingParams, r: int, gen) -> np.ndarray:
            """One slot's dense logit-bias row given its progress."""
            row = np.zeros(cfg.vocab_size, np.float32)
            for t, bias in p.logit_bias:
                row[int(t)] = float(bias)
            if p.choices:
                # The choice mask SUBSUMES the min-token ban: allowed
                # continuations keep their plain logit_bias value even if
                # they are stop tokens (otherwise a stop-valued
                # continuation would make every vocab entry -1e9 and the
                # constraint would silently collapse).
                g = tuple(gen)
                allowed = {
                    c[len(g)]
                    for c in p.choices
                    if len(c) > len(g) and tuple(c[: len(g)]) == g
                }
                new = np.full(cfg.vocab_size, -1e9, np.float32)
                for t in allowed:
                    if 0 <= int(t) < cfg.vocab_size:
                        new[int(t)] = row[int(t)]
                return new
            if p.min_new_tokens > len(gen):
                for t in req_stops[r]:
                    if 0 <= int(t) < cfg.vocab_size:
                        row[int(t)] = -1e9
            return row

        def _still_dynamic(p: SamplingParams, gen) -> bool:
            return bool(p.choices) or p.min_new_tokens > len(gen)

        def _refresh_rows():
            """Rebuild the rows of active dynamic slots whose mask CONTENT
            changed since the last upload (one device scatter)."""
            nonlocal slot_bias
            upd = [
                s
                for s in range(B)
                if slot_dynamic[s]
                and slot_req[s] != -1
                and _row_key(slot_sp[s], slot_generated[s]) != slot_rowkey[s]
            ]
            if upd:
                rows = np.stack(
                    [
                        _np_row(slot_sp[s], slot_req[s], slot_generated[s])
                        for s in upd
                    ]
                )
                slot_bias = slot_bias.at[jnp.asarray(upd)].set(
                    jnp.asarray(rows)
                )
                for s in upd:
                    slot_rowkey[s] = _row_key(slot_sp[s], slot_generated[s])
            for s in range(B):
                if slot_dynamic[s] and slot_req[s] != -1:
                    slot_dynamic[s] = _still_dynamic(
                        slot_sp[s], slot_generated[s]
                    )

        # What this call's compiled/allocated machinery can serve — the
        # contract for admit() (see Engine.admissible).
        features = {
            "use_mask": use_mask,
            "use_counts": use_counts,
            "use_bias": use_bias,
            "top_lp_k": top_lp_k,
            "return_logprobs": return_logprobs,
            "adapters": self._bank is not None,
            "num_adapters": self.num_adapters,
            "prefix": tuple(prompts[0][:prefix_len]) if prefix_len else (),
            "max_prompt_len": cfg.max_seq_len - 1,
        }

        def _cancel_hit() -> bool:
            """Any ACTIVE slot's request cancelled?  Polled between
            pipelined chunks so a long pipelined stretch still returns
            to the retirement check within one chunk of a cancel."""
            return cancel is not None and any(
                slot_req[s] != -1 and cancel(slot_req[s]) for s in range(B)
            )

        admit_peek = getattr(admit, "peek", None) if admit is not None else None

        def _admit_waiting() -> bool:
            """A request is waiting AND an idle slot could take it —
            polled between pipelined chunks (admit hooks exposing
            ``peek()`` only; see the generate() docstring) so a newcomer
            joins within one chunk instead of waiting out a long run
            whose idle slots ride frozen."""
            return (
                admit_peek is not None
                and any(r == -1 for r in slot_req)
                and bool(admit_peek())
            )

        def refill(slots_tokens):
            """Assign queued requests to idle slots, prefilling same-bucket
            groups as real batches (group sizes in {4, 2, 1} so the jit
            compiles a bounded set of (bucket, group) shapes)."""
            nonlocal cache, gen_mask, slot_bias, draft_cache

            if (
                admit is not None
                and not queue
                and any(r == -1 for r in slot_req)
            ):
                for tok, sp, ad in admit(features):
                    sp = sp if sp is not None else self.sampling
                    assert Engine.admissible(features, tok, sp, adapter=ad), (
                        "admit() returned a request this generate() call "
                        "cannot serve (check Engine.admissible first)"
                    )
                    r_new = len(prompts)
                    prompts.append(list(tok))
                    per_req.append(sp)
                    req_stops.append(base_stops | set(sp.stop_tokens))
                    b_new = (
                        sp.max_new_tokens
                        if sp.max_new_tokens is not None
                        else max_new_tokens
                    )
                    if sp.choices:
                        b_new = max(b_new, max(len(c) for c in sp.choices))
                    assert b_new >= 1
                    req_budget.append(b_new)
                    a_new = -1 if ad is None else int(ad)
                    assert -1 <= a_new < max(self.num_adapters, 1), (
                        f"adapter index {a_new} out of range "
                        f"[0, {self.num_adapters})"
                    )
                    req_adapter.append(a_new)
                    results.append(None)
                    queue.append(r_new)

            from collections import defaultdict

            pending = []  # (slot, request, prompt, bucket)
            for s in range(B):
                if slot_req[s] != -1:
                    continue
                r = None
                while queue:
                    cand = queue.pop(0)
                    # A request cancelled while still queued never
                    # prefills; complete it with nothing generated.
                    if cancel is not None and cancel(cand):
                        results[cand] = GenerationResult(
                            list(prompts[cand]), [], False
                        )
                        continue
                    r = cand
                    break
                if r is None:
                    break
                prompt = list(prompts[r])
                if len(prompt) == 0 or len(prompt) >= cfg.max_seq_len:
                    results[r] = GenerationResult(prompt, [], True)
                    continue
                slot_req[s] = r  # reserve the slot
                rem = prompt[prefix_len:]  # continuation past the prefix
                pending.append(
                    (s, r, prompt, min(_bucket(len(rem)), cfg.max_seq_len))
                )

            # Multi-LoRA: point each newly-assigned slot at its request's
            # adapter BEFORE the group prefills read ids[slots].  The ids
            # array rides the params bundle, so this is a tiny device
            # scatter, not a recompile.
            if self._bank is not None and pending:
                base, bank, ids = self.params
                ids = ids.at[
                    jnp.asarray([it[0] for it in pending], dtype=jnp.int32)
                ].set(
                    jnp.asarray(
                        [req_adapter[it[1]] for it in pending],
                        dtype=jnp.int32,
                    )
                )
                self.params = (base, bank, ids)

            groups = defaultdict(list)
            for item in pending:
                groups[item[3]].append(item)
            for bucket, items in groups.items():
                i = 0
                while i < len(items):
                    g = next(gg for gg in (4, 2, 1) if len(items) - i >= gg)
                    chunk = items[i : i + g]
                    i += g
                    toks = np.zeros((g, bucket), dtype=np.int32)
                    lens = np.zeros((g,), dtype=np.int32)
                    slots = np.zeros((g,), dtype=np.int32)
                    for j, (s, _r, prompt, _b) in enumerate(chunk):
                        rem = prompt[prefix_len:]
                        toks[j, : len(rem)] = rem
                        lens[j] = len(rem)
                        slots[j] = s
                    last_logits, cache = self._prefill_g(
                        self.params,
                        jnp.asarray(toks),
                        jnp.asarray(lens),
                        cache,
                        jnp.asarray(slots),
                        jnp.full((g,), prefix_len, dtype=jnp.int32),
                        bucket=bucket,
                    )
                    if draft_cache is not None:
                        # Draft cache prefills the FULL prompt (the target
                        # may continue a shared prefix; the draft keeps no
                        # prefix cache — it is small).
                        dparams, dcfg = self._draft
                        full = [p for _s, _r, p, _b in chunk]
                        dbucket = min(
                            _bucket(max(len(p) for p in full)),
                            dcfg.max_seq_len,
                        )
                        dtoks = np.zeros((g, dbucket), dtype=np.int32)
                        dlens = np.zeros((g,), dtype=np.int32)
                        for j, p in enumerate(full):
                            dtoks[j, : len(p)] = p
                            dlens[j] = len(p)
                        _dl, draft_cache = self._draft_prefill(
                            dparams,
                            jnp.asarray(dtoks),
                            jnp.asarray(dlens),
                            draft_cache,
                            jnp.asarray(slots),
                            jnp.zeros((g,), dtype=jnp.int32),
                            bucket=dbucket,
                        )
                        for (s_, _r3, p_, _b3) in chunk:
                            draft_pos[s_] = len(p_)
                    if per_req is None:
                        first = np.asarray(
                            self._sample(last_logits, sampling)
                        )
                    else:
                        for s_, r_, _p, _b in chunk:
                            slot_sp[s_] = per_req[r_]
                        chunk_sps = [
                            per_req[r_] for _s, r_, _p, _b in chunk
                        ]
                        chunk_bias = None
                        if slot_bias is not None:
                            chunk_reqs = [r_ for _s, r_, _p, _b in chunk]
                            chunk_bias = jnp.asarray(
                                np.stack(
                                    [
                                        _np_row(p_, r_, [])
                                        for p_, r_ in zip(
                                            chunk_sps, chunk_reqs
                                        )
                                    ]
                                )
                            )
                            slot_bias = slot_bias.at[
                                jnp.asarray(slots)
                            ].set(chunk_bias)
                            for (s_, _r2, _p2, _b2), p_ in zip(
                                chunk, chunk_sps
                            ):
                                slot_dynamic[s_] = _still_dynamic(p_, [])
                                slot_rowkey[s_] = _row_key(p_, [])
                        first = np.asarray(
                            self._sample_perreq(
                                last_logits,
                                chunk_sps,
                                logit_bias=chunk_bias,
                            )
                        )
                    if return_logprobs:
                        lps = np.asarray(_token_logprobs(last_logits, first))
                    if top_lp_k:
                        tv, ti = _top_logprobs_dev(last_logits, top_lp_k)
                        tv, ti = np.asarray(tv), np.asarray(ti)
                    for j, (s, _r, prompt, _b) in enumerate(chunk):
                        slot_pos[s] = len(prompt)
                        slot_generated[s] = [int(first[j])]
                        slot_toplp[s] = (
                            [list(zip(ti[j].tolist(), tv[j].tolist()))]
                            if top_lp_k
                            else []
                        )
                        if on_token is not None and (
                            int(first[j]) not in req_stops[_r]
                            or _sp_for(_r).choices
                        ):
                            on_token(_r, int(first[j]))
                        slot_logprobs[s] = (
                            [float(lps[j])] if return_logprobs else []
                        )
                        cur_token[s] = int(first[j])
                    if gen_mask is not None:
                        gen_mask = _mask_reset(
                            gen_mask, jnp.asarray(slots), jnp.asarray(first)
                        )

        refill(None)
        if use_bias:
            _refresh_rows()

        while any(r != -1 for r in slot_req) or queue:
            # Retire finished slots, then refill.
            for s in range(B):
                r = slot_req[s]
                if r == -1:
                    continue
                gen = slot_generated[s]
                # Guided choice disables stop-token termination entirely:
                # a stop id may BE part of a choice; the only finishers
                # are a full match (or budget/context).
                done_eos = (
                    bool(gen)
                    and gen[-1] in req_stops[r]
                    and not _sp_for(r).choices
                )
                done_len = len(gen) >= req_budget[r]
                done_ctx = slot_pos[s] >= cfg.max_seq_len - 1
                done_choice = bool(_sp_for(r).choices) and (
                    tuple(gen) in _sp_for(r).choices
                )
                done_cancel = cancel is not None and cancel(r)
                if (
                    done_eos or done_len or done_ctx or done_choice
                    or done_cancel
                ):
                    out = gen[:-1] if done_eos else gen
                    lp = slot_logprobs[s][: len(out)] if return_logprobs else None
                    k_r = _sp_for(r).top_logprobs
                    tlp = (
                        [row[:k_r] for row in slot_toplp[s][: len(out)]]
                        if k_r
                        else None
                    )
                    results[r] = GenerationResult(
                        list(prompts[r]),
                        out,
                        bool(done_eos or done_choice),
                        lp,
                        tlp,
                    )
                    slot_req[s] = -1
                    slot_generated[s] = []
                    slot_logprobs[s] = []
                    slot_toplp[s] = []
            refill(None)
            if use_bias:
                _refresh_rows()
            if not any(r != -1 for r in slot_req):
                break
            # Active-slot view for the chunked fast paths below: idle slots
            # (queue drained, early finishers) ride along FROZEN inside the
            # compiled chunks — decode is weight-bound, so a partially-idle
            # chunk costs what a full one does, and the tail of a wave
            # keeps chunk speed instead of collapsing to per-token syncs.
            act = np.asarray([r != -1 for r in slot_req])
            act_idx = [s for s in range(B) if act[s]]

            # Speculative fast path: draft spec_k tokens per slot by prompt
            # lookup, verify them all in ONE forward, emit the accepted
            # prefix + 1 — between 1 and spec_k+1 tokens per weight pass.
            # Greedy requests are token-identical to plain decode;
            # stochastic requests go through distribution-preserving
            # rejection sampling (spec_verify_sampled).  Only the
            # repetition penalty opts a call out (its token mask would
            # have to evolve across unaccepted draft positions).
            # Gate on the requests currently HOLDING slots (slot_req), not
            # the whole per_req history: with admit() the request list
            # grows across the wave, and a long-retired incompatible
            # request must not disable speculation for the remainder.
            active_sps = (
                [sampling]
                if per_req is None
                else [per_req[r] for r in slot_req if r != -1]
            )
            # Seeded requests also opt out: the rejection sampler's key
            # consumption depends on accept counts, which would break the
            # (seed, step) -> token reproducibility contract.  So do the
            # token-history penalties (their state would have to evolve
            # across unaccepted draft positions).
            spec_ok = all(
                p.repetition_penalty == 1.0
                and p.presence_penalty == 0.0
                and p.frequency_penalty == 0.0
                and not p.logit_bias
                and p.seed is None
                for p in active_sps
            )
            spec_greedy = all(p.temperature == 0.0 for p in active_sps)
            spec_eligible = (
                self.spec_k > 0
                and spec_ok
                and top_lp_k == 0
                and not any(slot_dynamic[s] for s in act_idx)
                and int(cfg.max_seq_len - 1 - slot_pos[act].max())
                >= self.spec_k + 1
            )
            if spec_eligible and self._spec_pause > 0:
                # Adaptive speculation is cooling down after a low-
                # acceptance probe: plain chunked decode serves the
                # cooldown.  The pause is measured in CHUNKS (the plain
                # paths below decrement it per consumed chunk/step and
                # break their pipelined loop on expiry to re-probe) —
                # counting scheduler rounds would let one pipelined
                # plain run swallow the whole cooldown unobserved.
                spec_eligible = False
            if spec_eligible:
                k = self.spec_k
                acc_samples: List[float] = []

                def _spec_adapt():
                    """After a spec round, pause speculation when the
                    measured mean acceptance fell below breakeven; back
                    off exponentially on consecutive failed probes."""
                    if not acc_samples:
                        return
                    mean_acc = sum(acc_samples) / len(acc_samples)
                    spec_confident[0] = mean_acc >= self.spec_min_accept
                    if mean_acc < self.spec_min_accept:
                        self._spec_backoff = min(
                            self.spec_cooldown_max,
                            (self._spec_backoff * 2) or self.spec_cooldown,
                        )
                        self._spec_pause = self._spec_backoff
                        self.spec_stats["pauses"] = (
                            self.spec_stats.get("pauses", 0) + 1
                        )
                    else:
                        self._spec_backoff = 0

                # CHAINED device chunks (greedy only): n verify steps with
                # DEVICE-side n-gram drafting per step — one host sync per
                # chunk, not per step.  Host-stepped spec pays a readback
                # every verify (the drafts needed the emitted tokens);
                # PERF_NOTES shows that sync erasing the speculative win
                # on small models.  Token-identical to plain greedy decode
                # (the greedy accept rule is draft-independent).
                n = self.decode_chunk
                # Re-probe after a FAILED probe with SHORT chunks: a probe
                # only needs an acceptance sample, so 2 verify steps per
                # chunk instead of decode_chunk makes probing ~n/2 times
                # cheaper (measured: full-length re-probes cost 0.97x ->
                # 0.85x of plain on a permanently-adversarial stream).
                # Only once the wave has history — acceptance develops
                # with generated tokens, so a cold slot (fresh wave or
                # fresh refill) gets the full-length probe, whose longer
                # mean is fair to warming-up workloads.  One extra
                # compiled program per (k, 2), cached.
                probing = self._spec_backoff > 0
                if (
                    self._draft is not None
                    and not spec_confident[0]
                    and self.spec_min_accept > 0.0
                ):
                    # Draft-model acceptance is model agreement, not
                    # history-dependent like prompt lookup — so a wave
                    # starts in the probing stance (short unpipelined
                    # chunks) until one round clears the threshold.
                    # Full-length cold probes cost ~24 rounds at ~1.6x a
                    # decode step each before the controller can pause
                    # (measured 0.71x plain with a useless draft; short
                    # probes restore the ~0.9x floor).
                    probing = True
                if probing and n > 2 and (
                    self._draft is not None
                    or min(len(slot_generated[s]) for s in act_idx)
                    >= 2 * n
                ):
                    n = 2

                def spec_room(ahead: int) -> bool:
                    """Context + budget room for a chunk launched ``ahead``
                    chunks past the current host state.  Context bounds
                    the WORST case (every chunk advances n*(k+1)
                    positions); budget mirrors the decode path's rule —
                    a speculative chunk that overshoots a budget is
                    simply discarded at consume time.  Idle slots are
                    frozen inside the chunk, so only active slots bound
                    context/budget."""
                    ctx_ok = int(
                        cfg.max_seq_len - 1 - int(slot_pos[act].max())
                    ) >= (ahead + 1) * n * (k + 1)
                    rem = min(
                        req_budget[slot_req[s]] - len(slot_generated[s])
                        for s in act_idx
                    ) - ahead * n
                    return ctx_ok and rem >= n

                if self._draft is not None:
                    # Restore the draft-KV lockstep before ANY propose
                    # (chunked or host-stepped): slots whose draft cache
                    # lags slot_pos (plain rounds during an adaptive
                    # pause) catch up via grouped continuation prefills.
                    draft_cache = self._draft_catchup(
                        draft_cache, draft_pos, act_idx, slot_pos,
                        prompts, slot_req, slot_generated,
                    )

                if n > 1 and spec_room(0):
                    act_dev = jnp.asarray(act)
                    draft_mode = self._draft is not None
                    if spec_greedy and draft_mode:
                        dparams, _dcfg = self._draft

                        def spec_launch(tok_d, dstate, cache_in, pos_d,
                                        key_d=None):
                            """One n-round draft-model spec chunk — the
                            draft cache rides the hist tuple slot, so the
                            relaunch/consume plumbing below is shared."""
                            return self._spec_chunk_draft(k, n)(
                                self.params, dparams, tok_d, dstate,
                                cache_in, pos_d, act_dev,
                            )
                    elif spec_greedy:

                        def spec_launch(tok_d, hist_d, cache_in, pos_d,
                                        key_d=None):
                            """Dispatch one n-step spec chunk (no readback)."""
                            return self._spec_chunk(k, n)(
                                self.params, tok_d, hist_d, cache_in, pos_d,
                                act_dev,
                            )
                    else:
                        # Stochastic waves chain the SAME way: the chunk
                        # carries the PRNG key (one split per step, accept-
                        # count-independent), rejection sampling per
                        # position — distribution-preserving and still one
                        # host sync per chunk.  bp is a traced pytree; it
                        # only changes at refill, which never happens
                        # inside the pipelined loop below.
                        bp_now = BatchedSampling.stack(
                            slot_sp if per_req is not None else [sampling] * B
                        )
                        if draft_mode:
                            dparams, _dcfg = self._draft

                            def spec_launch(tok_d, dstate, cache_in,
                                            pos_d, key_d):
                                return self._spec_chunk_draft_sampled(
                                    k, n
                                )(
                                    self.params, dparams, tok_d, dstate,
                                    cache_in, pos_d, key_d, bp_now,
                                    act_dev,
                                )
                        else:

                            def spec_launch(tok_d, hist_d, cache_in,
                                            pos_d, key_d):
                                return self._spec_chunk_sampled(k, n)(
                                    self.params, tok_d, hist_d, cache_in,
                                    pos_d, key_d, bp_now, act_dev,
                                )

                    def spec_relaunch(out):
                        """Launch the follow-up chunk from a finished
                        chunk's device handles (incl. the advanced key for
                        stochastic chunks)."""
                        return spec_launch(
                            out[5], out[4], out[3], out[6],
                            out[7] if len(out) > 7 else None,
                        )

                    def spec_consume(out) -> bool:
                        """Fold one finished spec chunk into host state;
                        True when any slot hit a stop/budget."""
                        nonlocal cache, draft_cache
                        targets_d, acc_d, lps_d, cache = out[:4]
                        if draft_mode:
                            draft_cache = out[4]  # lockstep draft KV
                        targets = np.asarray(targets_d)  # [n, B, k+1]
                        acc = np.asarray(acc_d)  # [n, B]
                        acc_samples.append(float(acc[:, act_idx].mean()))
                        if return_logprobs:
                            lps = np.asarray(lps_d)
                        self.spec_stats["steps"] += n
                        finished = False
                        for s in act_idx:
                            r = slot_req[s]
                            stop_hit = False
                            for i in range(n):
                                for j in range(int(acc[i, s]) + 1):
                                    t = int(targets[i, s, j])
                                    slot_generated[s].append(t)
                                    self.spec_stats["emitted"] += 1
                                    if return_logprobs:
                                        slot_logprobs[s].append(
                                            float(lps[i, s, j])
                                        )
                                    if (
                                        on_token is not None
                                        and t not in req_stops[r]
                                    ):
                                        on_token(r, t)
                                    if t in req_stops[r] or (
                                        len(slot_generated[s])
                                        >= req_budget[r]
                                    ):
                                        stop_hit = True
                                        break
                                if stop_hit:
                                    finished = True
                                    break
                            # Device position/token advanced through ALL
                            # n steps; mirror it exactly (same mid-chunk-
                            # stop invariant as the multi-step decode
                            # path: a finished slot's garbage state is
                            # never decoded again — retire/refill first).
                            slot_pos[s] += int((acc[:, s] + 1).sum())
                            cur_token[s] = int(
                                targets[n - 1, s, int(acc[n - 1, s])]
                            )
                            if draft_mode:
                                # The k+1-step propose keeps the draft KV
                                # covering every position < slot_pos.
                                draft_pos[s] = slot_pos[s]
                        return finished

                    def launch_from_host():
                        """Launch a chunk from CURRENT host state (initial
                        chunk, and unpipelined probe continuations)."""
                        if draft_mode:
                            dstate = draft_cache
                        else:
                            hist = np.zeros(
                                (B, cfg.max_seq_len), dtype=np.int32
                            )
                            for s in act_idx:
                                ctx = (
                                    list(prompts[slot_req[s]])
                                    + slot_generated[s]
                                )
                                hist[s, : len(ctx)] = ctx
                            dstate = jnp.asarray(hist)
                        if spec_greedy:
                            chunk_key = None
                        else:
                            self._key, chunk_key = jax.random.split(self._key)
                        return spec_launch(
                            jnp.asarray(cur_token),
                            dstate,
                            cache,
                            jnp.asarray(slot_pos),
                            chunk_key,
                        )

                    cur = launch_from_host()
                    def successor_safe() -> bool:
                        """The in-flight chunk cannot retire any slot on
                        budget, so its pipelined successor cannot be
                        discarded for budget reasons.  Spec chunks burn a
                        VARIABLE 1..k+1 tokens per step — gating the
                        successor on the worst case matters: at high
                        acceptance nearly every chunk finishes someone,
                        and a discarded successor is n verify steps of
                        pure waste (measured erasing the whole spec win
                        at b=8).  Stop tokens can still force a discard —
                        unpredictable, best effort."""
                        return all(
                            req_budget[slot_req[s]] - len(slot_generated[s])
                            > n * (k + 1)
                            for s in act_idx
                        )

                    # While probing (see the short-chunk note above) no
                    # pipelined successor launches — a failed probe then
                    # discards nothing; grace chunks still emit >= 1
                    # token/step, so an unpipelined probe costs ~the
                    # verify premium, not n wasted steps.  Acceptance
                    # still gets its grace: it develops with generated
                    # history, and a workload that warms up mid-probe
                    # must be rediscoverable.

                    # Pipeline spec chunks exactly like decode chunks:
                    # chunk c+1 launches from chunk c's device handles
                    # (token, history, cache, positions are all outputs)
                    # before c's readback; a chunk containing a stop
                    # discards the speculative successor rollback-free.
                    while True:
                        nxt = None
                        waiting = _admit_waiting()
                        if (
                            self.pipeline_decode
                            and spec_room(1)
                            and successor_safe()
                            and not probing
                            and not waiting
                        ):
                            nxt = spec_relaunch(cur)
                            self.pipeline_stats["launched"] += 1
                        finished = spec_consume(cur)
                        # Eager adaptation: when the RUNNING MEAN sits
                        # below breakeven, exit the spec loop NOW
                        # (discarding at most one in-flight successor)
                        # instead of riding the budget gate for several
                        # more wasted chunks.  One chunk of grace —
                        # prompt-lookup acceptance develops as generated
                        # history accumulates, so the first chunk alone
                        # must not condemn the wave.
                        low_acc = (
                            self.spec_min_accept > 0.0
                            and len(acc_samples) >= 2
                            and sum(acc_samples) / len(acc_samples)
                            < self.spec_min_accept
                        )
                        if nxt is None:
                            if (
                                probing
                                and not waiting
                                and not finished
                                and not low_acc
                                and len(acc_samples) < 2
                                and spec_room(0)
                                and not _cancel_hit()
                            ):
                                # Probe grace: continue UNPIPELINED (host-
                                # synced) so a failed probe discards
                                # nothing.  At most one continuation —
                                # after 2 chunks the running mean decides.
                                cur = launch_from_host()
                                continue
                            # A passed probe ends the round here;
                            # _spec_adapt resets the backoff and the NEXT
                            # scheduler round re-enters the spec path
                            # fully pipelined (cost: one extra host sync,
                            # once per recovery).
                            break
                        if finished or low_acc or _cancel_hit():
                            self.pipeline_stats["discarded"] += 1
                            break
                        cur = nxt
                    _spec_adapt()
                    continue

                if self._draft is not None:
                    # (Catch-up already ran before the chunk decision.)
                    drafts_d, draft_cache = self._draft_propose(k)(
                        self._draft[0],
                        jnp.asarray(cur_token),
                        draft_cache,
                        jnp.asarray(slot_pos),
                    )
                    drafts = np.asarray(drafts_d)
                else:
                    drafts = np.zeros((B, k), dtype=np.int32)
                    for s in act_idx:
                        ctx = list(prompts[slot_req[s]]) + slot_generated[s]
                        drafts[s] = propose_ngram(ctx, k, self.spec_ngram)
                if spec_greedy:
                    targets_d, acc_d, lps_d, cache = self._spec_verify(k)(
                        self.params,
                        jnp.asarray(cur_token),
                        jnp.asarray(drafts),
                        cache,
                        jnp.asarray(slot_pos),
                    )
                else:
                    sps_now = (
                        slot_sp if per_req is not None else [sampling] * B
                    )
                    self._key, sub = jax.random.split(self._key)
                    targets_d, acc_d, lps_d, cache = (
                        self._spec_verify_sampled(k)(
                            self.params,
                            jnp.asarray(cur_token),
                            jnp.asarray(drafts),
                            cache,
                            jnp.asarray(slot_pos),
                            sub,
                            BatchedSampling.stack(sps_now),
                        )
                    )
                targets = np.asarray(targets_d)  # [B, k+1]
                acc = np.asarray(acc_d)  # [B]
                acc_samples.append(float(acc[act].mean()))
                if return_logprobs:
                    lps = np.asarray(lps_d)
                self.spec_stats["steps"] += 1
                for s in act_idx:
                    r = slot_req[s]
                    n_emit = int(acc[s]) + 1
                    # Same mid-chunk invariant as the multi-step path: a
                    # stop or budget hit inside the emitted run leaves
                    # slot_pos/cur_token past the kept tokens, and the
                    # retirement check at the top of the loop MUST run
                    # before the slot decodes again.
                    for i in range(n_emit):
                        t = int(targets[s, i])
                        slot_generated[s].append(t)
                        self.spec_stats["emitted"] += 1
                        if return_logprobs:
                            slot_logprobs[s].append(float(lps[s, i]))
                        if on_token is not None and t not in req_stops[r]:
                            on_token(r, t)
                        if t in req_stops[r] or (
                            len(slot_generated[s]) >= req_budget[r]
                        ):
                            break
                    slot_pos[s] += n_emit
                    cur_token[s] = int(targets[s, n_emit - 1])
                    if self._draft is not None:
                        # The propose scan wrote draft KV for positions
                        # pos..pos+k-1; a fully-accepted run advances to
                        # pos+k+1, leaving position pos+k for the next
                        # catch-up (gap of one token).
                        draft_pos[s] = min(
                            slot_pos[s], slot_pos[s] - n_emit + k
                        )
                _spec_adapt()
                continue

            # Multi-step fast path: when every slot is busy and has >= 2
            # steps of budget, run a chunk of decode+sample steps entirely
            # on-device — ONE host sync per chunk instead of per token (the
            # readback dominates small-model decode latency).  Tokens after
            # a stop within the chunk are discarded host-side.
            #
            # PIPELINED (pipeline_decode=True): chunk c+1 is launched from
            # chunk c's DEVICE handles (last sampled token, output cache,
            # output gen_mask) BEFORE chunk c is read back, so the 15-20 ms
            # host readback + bookkeeping overlaps the next chunk's compute.
            # The engine is purely functional on device (each chunk returns
            # a NEW cache buffer; inputs are never mutated), so when chunk c
            # turns out to contain a stop, the speculative chunk c+1 is
            # discarded by simply dropping its handles — the consumed
            # chunk's outputs are already the authoritative state.  Costs
            # one extra in-flight KV-cache buffer while a speculative chunk
            # is live.
            if self.decode_chunk > 1:
                # Fixed chunk size only (each distinct n compiles its own
                # program); the tail of a budget single-steps.  Idle slots
                # ride along FROZEN (active mask into the chunk program):
                # decode is weight-bound, so a partially-idle chunk costs
                # what a full one does, and a wave whose slots finish at
                # different times keeps chunk speed instead of collapsing
                # to per-token host syncs.
                n = self.decode_chunk

                def chunk_ok(ahead: int) -> bool:
                    """Is a chunk launched ``ahead`` whole chunks past the
                    CURRENT host state guaranteed safe (enough budget and
                    context for every active slot, token bans static
                    across it)?"""
                    rem = min(
                        req_budget[slot_req[s]] - len(slot_generated[s])
                        for s in act_idx
                    ) - ahead * n
                    ctx_room = int(
                        cfg.max_seq_len - 1
                        - (int(slot_pos[act].max()) + ahead * n)
                    )
                    ban_static = all(
                        not slot_dynamic[s]
                        or (
                            not slot_sp[s].choices
                            and len(slot_generated[s]) + (ahead + 1) * n
                            <= slot_sp[s].min_new_tokens
                        )
                        for s in act_idx
                    )
                    return rem >= n and ctx_room >= n and ban_static

                if chunk_ok(0):
                    stoch = (
                        sampling.temperature != 0.0
                        if per_req is None
                        else any(
                            slot_sp[s].temperature != 0.0 for s in act_idx
                        )
                    )
                    act_dev = jnp.asarray(act)

                    def launch(tok_dev, cache_in, mask_in, ahead: int):
                        """Dispatch one n-step chunk; returns the device
                        handles untouched (no readback)."""
                        if stoch:
                            self._key, sub = jax.random.split(self._key)
                            keys = jax.random.split(sub, n)
                        else:
                            keys = jax.random.split(jax.random.PRNGKey(0), n)
                        pos_in = jnp.asarray(slot_pos + ahead * n * act)
                        if per_req is None:
                            return self._decode_multi(sampling, n, top_lp_k)(
                                self.params, tok_dev, cache_in, pos_in,
                                mask_in, keys, act_dev,
                            )
                        return self._decode_multi_b(n, top_lp_k)(
                            self.params, tok_dev, cache_in, pos_in, mask_in,
                            keys,
                            BatchedSampling.stack(slot_sp),
                            jnp.asarray(
                                [
                                    len(slot_generated[s]) + ahead * n
                                    for s in range(B)
                                ],
                                dtype=jnp.int32,
                            ),
                            slot_bias,
                            act_dev,
                        )

                    def consume(out) -> bool:
                        """Read one finished chunk back and fold it into the
                        host state; True when any slot hit a stop/budget (so
                        retire/refill must run before the next decode)."""
                        nonlocal cache, gen_mask, slot_pos
                        toks_d, lps_d, tops_d, cache, _pos_d, gen_mask = out
                        toks = np.asarray(toks_d)  # [n, B]
                        if top_lp_k:
                            ctv = np.asarray(tops_d[0])  # [n, B, k]
                            cti = np.asarray(tops_d[1])
                        if return_logprobs:
                            lps = np.asarray(lps_d)
                        # INVARIANT: a slot whose stop token lands mid-chunk
                        # still gets slot_pos advanced by n and cur_token set
                        # to toks[n-1] (post-stop garbage).  This is safe
                        # ONLY because the retirement check at the top of the
                        # while loop runs before the next decode touches the
                        # slot — keep that ordering if refactoring
                        # refill/retire.  (The pipelined path preserves it:
                        # a speculative chunk is adopted only when this
                        # function reports no slot finished.)
                        slot_pos[act] += n
                        finished = False
                        for s in act_idx:
                            r = slot_req[s]
                            for i in range(n):
                                t = int(toks[i, s])
                                slot_generated[s].append(t)
                                if top_lp_k:
                                    slot_toplp[s].append(
                                        list(
                                            zip(
                                                cti[i, s].tolist(),
                                                ctv[i, s].tolist(),
                                            )
                                        )
                                    )
                                if return_logprobs:
                                    slot_logprobs[s].append(float(lps[i, s]))
                                if on_token is not None and (
                                    t not in req_stops[r]
                                    or _sp_for(r).choices
                                ):
                                    on_token(r, t)
                                if t in req_stops[r] or (
                                    len(slot_generated[s]) >= req_budget[r]
                                ):
                                    finished = True
                                    break
                            cur_token[s] = int(toks[n - 1, s])
                        return finished

                    # Serving the spec cooldown: decrement it per consumed
                    # chunk and break on expiry so the scheduler re-probes
                    # speculation (costs one discarded successor, at the
                    # backed-off probe frequency).
                    reprobe = self.spec_k > 0 and self._spec_pause > 0

                    cur = launch(jnp.asarray(cur_token), cache, gen_mask, 0)
                    while True:
                        nxt = None
                        # When the spec cooldown expires at THIS consume,
                        # or a waiting request could take an idle slot,
                        # skip the successor launch so the break below
                        # discards nothing (a discarded chunk is n wasted
                        # decode steps — measured ~6% of an adversarial
                        # 512-token wave at the probe cadence).
                        expiring = reprobe and self._spec_pause <= 1
                        waiting = _admit_waiting()
                        if (
                            self.pipeline_decode
                            and chunk_ok(1)
                            and not expiring
                            and not waiting
                        ):
                            # cur = (toks_d, lps_d, tops_d, cache, pos, mask)
                            nxt = launch(cur[0][n - 1], cur[3], cur[5], 1)
                            self.pipeline_stats["launched"] += 1
                        finished = consume(cur)
                        if reprobe:
                            self._spec_pause -= 1
                            if self._spec_pause <= 0:
                                break  # nxt is None: nothing discarded
                        if nxt is None:
                            break  # incl. waiting admits: refill takes over
                        if finished or _cancel_hit():
                            # Drop the speculative chunk: nothing to roll
                            # back — its outputs were never adopted and the
                            # device state is the consumed chunk's buffers.
                            self.pipeline_stats["discarded"] += 1
                            break
                        cur = nxt
                    continue

            # One decode step for the whole batch (idle slots step harmlessly
            # at their frozen position and are ignored).
            if self._spec_pause > 0:
                self._spec_pause -= 1  # single steps serve the cooldown too
            logits, cache = self._decode(
                self.params,
                token=jnp.asarray(cur_token),
                cache=cache,
                positions=jnp.asarray(slot_pos),
            )
            if per_req is None:
                next_dev = self._sample(logits, sampling, gen_mask)
            else:
                next_dev = self._sample_perreq(
                    logits,
                    slot_sp,
                    gen_mask,
                    step_idx=[len(slot_generated[s]) for s in range(B)],
                    logit_bias=slot_bias,
                )
            next_tok = np.asarray(next_dev)
            if top_lp_k:
                stv, sti = _top_logprobs_dev(logits, top_lp_k)
                stv, sti = np.asarray(stv), np.asarray(sti)
            if return_logprobs:
                step_lps = np.asarray(_token_logprobs(logits, next_tok))
            active = np.asarray([r != -1 for r in slot_req])
            if gen_mask is not None:
                gen_mask = _mask_record(
                    gen_mask, next_dev, jnp.asarray(active)
                )
            slot_pos[active] += 1
            cur_token[active] = next_tok[active]

            for s in np.nonzero(active)[0]:
                r = slot_req[s]
                slot_generated[s].append(int(next_tok[s]))
                if top_lp_k:
                    slot_toplp[s].append(
                        list(zip(sti[s].tolist(), stv[s].tolist()))
                    )
                if return_logprobs:
                    slot_logprobs[s].append(float(step_lps[s]))
                if on_token is not None and (
                    int(next_tok[s]) not in req_stops[r]
                    or _sp_for(r).choices
                ):
                    on_token(r, int(next_tok[s]))

        return [r for r in results if r is not None]

    def score(self, prompts, batch_size: Optional[int] = None, adapter=None):
        """Teacher-forced per-token log-probabilities of given sequences
        (no generation): one list per prompt, entry i = log P(tok[i+1] |
        tok[:i+1]).  The scoring idiom behind OpenAI completions'
        ``echo=true, max_tokens=0``; the same fp32 math as eval.ppl.
        ``adapter`` (multi-LoRA engines): one bank index or None per
        prompt — scores run through the SAME adapter that would serve
        the request.  Single-device engines only (score a TP-served
        model through eval.ppl on a localized copy)."""
        assert self.mesh is None, "score() is single-device only"
        from ..eval.ppl import token_logprobs

        if self._bank is not None:
            params = self.params[0]
            ids = [
                -1 if (adapter is None or adapter[i] is None) else int(adapter[i])
                for i in range(len(prompts))
            ]
            if all(i == -1 for i in ids):
                # Provably-zero deltas: keep the cheap (and already
                # compiled) bank-free scoring graph.
                return token_logprobs(
                    params, self.cfg, prompts,
                    batch_size=batch_size or self.batch_size,
                )
            return token_logprobs(
                params, self.cfg, prompts,
                batch_size=batch_size or self.batch_size,
                lora=self._bank, adapter_ids=ids,
            )
        assert adapter is None, "adapter= needs Engine(lora_bank=...)"
        return token_logprobs(
            self.params, self.cfg, prompts,
            batch_size=batch_size or self.batch_size,
        )

    def _spec_fwd(self):
        if self.mesh is not None:
            return functools.partial(
                _tp_fwd_wrap,
                cfg=self.cfg,
                mesh=self.mesh,
                axis=self.tp_axis,
                data_axis=self.data_axis,
            )
        return functools.partial(_fwd_wrap, cfg=self.cfg)

    def _spec_verify(self, k: int):
        fn = self._spec_cache.get(k)
        if fn is None:
            from .speculative import spec_verify

            fn = jax.jit(
                functools.partial(spec_verify, fwd=self._spec_fwd(), k=k)
            )
            self._spec_cache[k] = fn
        return fn

    def _draft_catchup(
        self, draft_cache, draft_pos, act_idx, slot_pos, prompts,
        slot_req, slot_generated,
    ):
        """Catch up slots whose draft cache lags slot_pos (plain rounds
        during an adaptive pause advance the target without feeding the
        draft): one grouped continuation prefill of the gap tokens per
        {4, 2, 1} group, per-row start = the stale draft position.
        Mutates ``draft_pos``; returns the advanced draft cache."""
        dparams, dcfg = self._draft
        lag = [s for s in act_idx if draft_pos[s] < slot_pos[s]]
        i0 = 0
        while i0 < len(lag):
            g = next(gg for gg in (4, 2, 1) if len(lag) - i0 >= gg)
            grp = lag[i0 : i0 + g]
            i0 += g
            gaps = [int(slot_pos[s] - draft_pos[s]) for s in grp]
            dbucket = min(_bucket(max(gaps)), dcfg.max_seq_len)
            dtoks = np.zeros((g, dbucket), dtype=np.int32)
            starts = np.zeros((g,), dtype=np.int32)
            for j, s in enumerate(grp):
                ctx = list(prompts[slot_req[s]]) + slot_generated[s]
                gap = ctx[int(draft_pos[s]) : int(slot_pos[s])]
                dtoks[j, : len(gap)] = gap
                starts[j] = draft_pos[s]
            _dl, draft_cache = self._draft_prefill(
                dparams,
                jnp.asarray(dtoks),
                jnp.asarray(gaps, dtype=jnp.int32),
                draft_cache,
                jnp.asarray(grp, dtype=jnp.int32),
                jnp.asarray(starts),
                bucket=dbucket,
            )
            for s in grp:
                draft_pos[s] = slot_pos[s]
        return draft_cache

    def _draft_fwd(self):
        _dp, dcfg = self._draft
        return functools.partial(_draft_dec_wrap, cfg=dcfg)

    def _spec_chunk_draft(self, k: int, n_steps: int):
        fn = self._spec_chunk_draft_cache.get((k, n_steps))
        if fn is None:
            from .speculative import spec_chunk_draft

            fn = jax.jit(
                functools.partial(
                    spec_chunk_draft, fwd=self._spec_fwd(),
                    dfwd=self._draft_fwd(), k=k, n_steps=n_steps,
                )
            )
            self._spec_chunk_draft_cache[(k, n_steps)] = fn
        return fn

    def _spec_chunk_draft_sampled(self, k: int, n_steps: int):
        fn = self._spec_chunk_draft_sampled_cache.get((k, n_steps))
        if fn is None:
            from .speculative import spec_chunk_draft_sampled

            fn = jax.jit(
                functools.partial(
                    spec_chunk_draft_sampled, fwd=self._spec_fwd(),
                    dfwd=self._draft_fwd(), k=k, n_steps=n_steps,
                )
            )
            self._spec_chunk_draft_sampled_cache[(k, n_steps)] = fn
        return fn

    def _draft_propose(self, k: int):
        """Jitted draft-model proposal: ``k`` greedy decode steps of the
        draft LM from (token, cache, positions) — returns (drafts [B, k],
        cache).  The scan writes the draft's KV for ``token`` and the
        first k-1 drafts at positions pos..pos+k-1 (see the lockstep
        invariant in __init__)."""
        fn = self._draft_propose_cache.get(k)
        if fn is None:
            _dparams, dcfg = self._draft

            def propose(params, token, cache, positions):
                def body(carry, _):
                    tok, cache, pos = carry
                    logits, cache = decode_step(
                        params, token=tok, cache=cache, positions=pos,
                        cfg=dcfg,
                    )
                    nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                    return (nxt, cache, pos + 1), nxt

                (_t, cache, _p), drafts = jax.lax.scan(
                    body, (token, cache, positions), None, length=k
                )
                return jnp.moveaxis(drafts, 0, 1), cache

            fn = jax.jit(propose)
            self._draft_propose_cache[k] = fn
        return fn

    def _spec_chunk(self, k: int, n_steps: int):
        fn = self._spec_chunk_cache.get((k, n_steps))
        if fn is None:
            from .speculative import spec_chunk

            fn = jax.jit(
                functools.partial(
                    spec_chunk, fwd=self._spec_fwd(), k=k,
                    n_steps=n_steps, ngram=self.spec_ngram,
                )
            )
            self._spec_chunk_cache[(k, n_steps)] = fn
        return fn

    def _spec_chunk_sampled(self, k: int, n_steps: int):
        fn = self._spec_chunk_sampled_cache.get((k, n_steps))
        if fn is None:
            from .speculative import spec_chunk_sampled

            fn = jax.jit(
                functools.partial(
                    spec_chunk_sampled, fwd=self._spec_fwd(), k=k,
                    n_steps=n_steps, ngram=self.spec_ngram,
                )
            )
            self._spec_chunk_sampled_cache[(k, n_steps)] = fn
        return fn

    def _spec_verify_sampled(self, k: int):
        fn = self._spec_sampled_cache.get(k)
        if fn is None:
            from .speculative import spec_verify_sampled

            fn = jax.jit(
                functools.partial(
                    spec_verify_sampled, fwd=self._spec_fwd(), k=k
                )
            )
            self._spec_sampled_cache[k] = fn
        return fn

    def _decode_multi(self, sampling: SamplingParams, n_steps: int, top_lp_k=0):
        # Key on the device-relevant fields only: host-side scheduler
        # fields (stop_tokens, max_new_tokens) never enter the program.
        key = (
            sampling.temperature,
            sampling.top_k,
            sampling.top_p,
            sampling.min_p,
            sampling.repetition_penalty,
            n_steps,
            top_lp_k,
        )
        fn = self._decode_multi_cache.get(key)
        if fn is None:
            fn = jax.jit(
                functools.partial(
                    _decode_multi_impl,
                    step=self._decode,
                    sampling=sampling,
                    n_steps=n_steps,
                    top_lp_k=top_lp_k,
                )
            )
            self._decode_multi_cache[key] = fn
        return fn

    def _decode_multi_b(self, n_steps: int, top_lp_k=0):
        """Per-request multi-step decode: one compilation per chunk length
        (the BatchedSampling pytree is traced, not baked in)."""
        fn = self._decode_multi_b_cache.get((n_steps, top_lp_k))
        if fn is None:
            fn = jax.jit(
                functools.partial(
                    _decode_multi_impl_batched,
                    step=self._decode,
                    n_steps=n_steps,
                    top_lp_k=top_lp_k,
                )
            )
            self._decode_multi_b_cache[(n_steps, top_lp_k)] = fn
        return fn

    def _sample(
        self,
        logits: jax.Array,
        sampling: Optional[SamplingParams] = None,
        gen_mask=None,
    ):
        sampling = sampling or self.sampling
        mask = jnp.asarray(gen_mask) if gen_mask is not None else None
        if sampling.temperature == 0.0:
            return sample(logits, sampling, generated_mask=mask)
        self._key, sub = jax.random.split(self._key)
        return sample(logits, sampling, sub, generated_mask=mask)

    def _sample_perreq(
        self, logits, sps, gen_mask=None, step_idx=None, logit_bias=None
    ):
        """Sample [B] tokens with row-wise params; draws one key for the
        whole batch only when some row is stochastic.  ``step_idx`` [B]
        is each row's generated-token count (keys seeded rows)."""
        mask = jnp.asarray(gen_mask) if gen_mask is not None else None
        bp = BatchedSampling.stack(sps)
        sidx = (
            jnp.asarray(step_idx, jnp.int32)
            if step_idx is not None
            else jnp.zeros(logits.shape[0], jnp.int32)
        )
        if all(p.temperature == 0.0 for p in sps):
            return _sample_batched_jit(logits, bp, None, mask, sidx, logit_bias)
        self._key, sub = jax.random.split(self._key)
        return _sample_batched_jit(logits, bp, sub, mask, sidx, logit_bias)
