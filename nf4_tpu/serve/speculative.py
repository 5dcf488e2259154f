"""Speculative decoding via prompt-lookup (n-gram) drafting.

Decode on this engine is weight-stream-bound: a decode step reads every
packed weight byte to emit ONE token per slot (PERF_NOTES: the int8 path
runs AT the HBM roofline, so more tokens per step is the only remaining
lever).  Verifying K drafted tokens in a single forward reads the weights
once for K+1 positions, so every accepted draft is a nearly-free extra
token — the MXU work grows K+1-fold but decode is far from compute-bound.

Drafts come from *prompt lookup*: the longest n-gram suffix of a slot's
(prompt + generated) token history is matched against its own earlier
occurrences and the following tokens are proposed.  No draft model, no
extra weights in HBM.  This pays off on the workloads where it is known
to pay off (summarization, code editing, RAG — anything that re-emits
spans of its input); on text with no self-overlap the drafts are simply
rejected and the engine degrades to ~1 token per verify step.

Two accept rules, one per sampling regime:

* greedy (:func:`spec_verify`): accept a draft iff it equals the model's
  argmax — token-identical to plain greedy decode (tests assert it);
* stochastic (:func:`spec_verify_sampled`): distribution-preserving
  rejection sampling against the request's filtered sampling
  distribution.  Prompt-lookup drafts are deterministic (a point mass
  ``q = onehot(d)``), so the classic speculative-sampling rule reduces
  to: accept draft ``d`` with probability ``p(d)``; on rejection sample
  from the residual ``p`` with ``d`` removed (renormalized).  The
  emitted marginal is exactly ``p`` at every position (the standard
  speculative-sampling theorem; tests/test_spec_sampling.py checks the
  marginal empirically).  Only the repetition penalty is excluded (its
  token mask would have to evolve across unaccepted draft positions);
  the engine falls back to normal decode when any request uses it.

The reference package has no serving loop at all (its concurrency is
three CUDA streams in ``benchmark.py:68-84``); this subsystem exists to
beat the BASELINE serving target (Llama-3-8B tokens/s/chip), not to
mirror reference code.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "propose_ngram",
    "draft_ngram_device",
    "spec_verify",
    "spec_verify_sampled",
    "spec_chunk",
    "spec_chunk_sampled",
    "spec_chunk_draft",
    "spec_chunk_draft_sampled",
]


def propose_ngram(
    context: Sequence[int], k: int, max_ngram: int = 3
) -> np.ndarray:
    """Propose ``k`` continuation tokens for ``context`` by prompt lookup.

    Finds the LAST earlier occurrence of the longest matching suffix
    n-gram (n = max_ngram down to 1) and returns the ``k`` tokens that
    followed it.  Always returns exactly ``k`` int32 tokens: short
    continuations are padded by repeating their final token, and when no
    n-gram recurs the last context token is proposed k times (cheap to
    verify, almost always rejected — the step then emits 1 token, same
    as plain decode).
    """
    a = np.asarray(context, dtype=np.int64)
    length = int(a.size)
    out = None
    for n in range(min(max_ngram, length - 1), 0, -1):
        suf = a[length - n :]
        # Candidate starts i with a[i:i+n] == suf and at least one
        # continuation token (i + n <= length - 1).  The suffix's own
        # position (length - n) is excluded by the slice bound.
        starts = np.flatnonzero(a[: length - n] == suf[0])
        ok = np.ones(starts.size, dtype=bool)
        for j in range(1, n):
            ok &= a[starts + j] == suf[j]
        cand = starts[ok]
        if cand.size:
            i = int(cand[-1])
            out = a[i + n : i + n + k]
            break
    if out is None or out.size == 0:
        out = a[length - 1 :] if length else np.zeros(1, dtype=np.int64)
        out = out[:1]
    if out.size < k:
        out = np.concatenate(
            [out, np.full(k - out.size, out[-1], dtype=np.int64)]
        )
    return out.astype(np.int32)


def draft_ngram_device(hist, hlen, k: int, max_ngram: int = 3):
    """Device-side prompt-lookup drafting (the jit-able counterpart of
    :func:`propose_ngram`, so speculative steps can CHAIN on device).

    ``hist [B, S]`` int32 — each slot's token history (prompt + emitted);
    entries at positions >= ``hlen[b]`` are stale and ignored.
    ``hlen [B]`` int32 — valid history length per slot.

    Returns drafts ``[B, k]`` int32.  Matching rule mirrors the host
    drafter: the longest suffix n-gram (n = max_ngram..1) is matched
    against its most recent earlier occurrence and the following tokens
    proposed; short/absent continuations pad by clamping into the valid
    history (the host version pads with the continuation's final token —
    an immaterial difference: greedy spec output is token-identical
    REGARDLESS of drafts, which only set the acceptance rate).

    Cost: O(B * S * max_ngram) vector compares per call — noise next to
    a forward pass.
    """
    b_sz, s_len = hist.shape
    j = jnp.arange(s_len, dtype=jnp.int32)[None, :]  # candidate starts

    best_start = jnp.full((b_sz,), -1, dtype=jnp.int32)
    found = jnp.zeros((b_sz,), dtype=bool)
    for n in range(max_ngram, 0, -1):
        # match[b, j]: hist[b, j:j+n] == suffix (the last n valid tokens),
        # with a continuation available (j + n <= hlen - 1) and the
        # suffix's own occurrence excluded by the same bound.
        match = jnp.ones((b_sz, s_len), dtype=bool)
        for i in range(n):
            # suffix token i = hist[b, hlen - n + i]
            suf_i = jnp.take_along_axis(
                hist, jnp.maximum(hlen - n + i, 0)[:, None], axis=1
            )
            # hist[b, j + i], shifted with a static offset (stale pad).
            shifted = jnp.pad(hist[:, i:], ((0, 0), (0, i)))
            match &= shifted == suf_i
        valid = (j <= (hlen - n - 1)[:, None]) & ((hlen >= n + 1)[:, None])
        cand = jnp.where(match & valid, j, -1).max(axis=1)  # most recent
        hit = cand >= 0
        # Longest n wins: only rows still unmatched take a shorter n.
        best_start = jnp.where(~found & hit, cand + n, best_start)
        found = found | hit
    start = jnp.where(found, best_start, hlen - 1)
    idx = jnp.minimum(
        start[:, None] + jnp.arange(k, dtype=jnp.int32)[None, :],
        (hlen - 1)[:, None],
    )
    return jnp.take_along_axis(hist, idx, axis=1).astype(jnp.int32)


def _chunk_scan(
    params, cur_token, hist, cache, slot_pos, extra, verify, active,
    *, k, n_steps, ngram,
):
    """Shared scan body for the device-chained spec chunks: per step,
    draft on device, run ``verify`` (greedy or rejection-sampling — it
    owns any extra carried state, e.g. the PRNG key), write all k+1
    emitted-or-stale tokens after the consumed prefix, advance.

    ``hist [B, S]`` carries each slot's full token context with
    ``slot_pos + 1`` valid entries (``hist[b, slot_pos[b]]`` IS
    ``cur_token[b]``).  Stale-tail contract matches :func:`spec_verify`:
    all k+1 tokens of a step are written to history/cache; only
    ``accepted + 1`` advance the lengths, and the next step's writes
    cover the stale region.

    ``active [B]`` bool (None = all): idle slots ride along FROZEN —
    token and position held, their verify writes garbage KV at a fixed
    already-stale window (invisible to attention: it sits at/above the
    retired content's seq_len and any refill prefill overwrites below) —
    so a wave keeps chunk speed after early slots retire.
    """

    def body(carry, _):
        tok, hist, cache, pos, extra = carry
        drafts = draft_ngram_device(hist, pos + 1, k, ngram)
        targets, accepted, lps, cache, extra = verify(
            params, tok, drafts, cache, pos, extra
        )
        b_idx = jnp.arange(tok.shape[0], dtype=jnp.int32)
        widx = (pos + 1)[:, None] + jnp.arange(k + 1, dtype=jnp.int32)[None, :]
        widx = jnp.minimum(widx, hist.shape[1] - 1)
        hist = hist.at[b_idx[:, None], widx].set(targets)
        nxt = targets[b_idx, accepted]
        adv = accepted + 1
        if active is not None:
            nxt = jnp.where(active, nxt, tok)
            adv = adv * active.astype(adv.dtype)
        return (nxt, hist, cache, pos + adv, extra), (
            targets, accepted, lps,
        )

    (tok, hist, cache, pos, extra), (targets, accepted, lps) = jax.lax.scan(
        body,
        (cur_token, hist, cache, slot_pos, extra),
        None,
        length=n_steps,
    )
    return targets, accepted, lps, cache, hist, tok, pos, extra


def spec_chunk(
    params, cur_token, hist, cache, slot_pos, active=None,
    *, fwd, k, n_steps, ngram=3,
):
    """``n_steps`` chained GREEDY spec-verify steps fully on device (jit
    this): draft on device (:func:`draft_ngram_device`), verify
    (:func:`spec_verify`), append the emitted run to the history, repeat —
    ONE host sync per chunk instead of per verify step.  The host-stepped
    spec path pays a host readback per step (the n-gram drafts needed the
    emitted tokens); on rigs where that sync rivals the step time (see
    PERF_NOTES) it erases the speculative win — this chunk restores it.

    History/cache stale-tail contract: see :func:`_chunk_scan`.

    Returns (targets [n, B, k+1], accepted [n, B], logprobs [n, B, k+1],
    cache, hist, cur_token [B], slot_pos [B]) — the trailing device
    handles let a follow-up chunk launch without a readback.
    """

    def verify(params, tok, drafts, cache, pos, extra):
        targets, accepted, lps, cache = spec_verify(
            params, tok, drafts, cache, pos, fwd=fwd, k=k
        )
        return targets, accepted, lps, cache, extra

    return _chunk_scan(
        params, cur_token, hist, cache, slot_pos, None, verify, active,
        k=k, n_steps=n_steps, ngram=ngram,
    )[:7]


def spec_chunk_sampled(
    params, cur_token, hist, cache, slot_pos, key, bp, active=None,
    *, fwd, k, n_steps, ngram=3,
):
    """Stochastic counterpart of :func:`spec_chunk` (jit this): ``n_steps``
    chained draft + rejection-sampling verify steps fully on device — one
    host sync per chunk instead of per verify step.

    Each step splits the carried PRNG key, drafts on device
    (:func:`draft_ngram_device`) and verifies via
    :func:`spec_verify_sampled` — so the emitted marginal at every
    position is exactly the row's filtered sampling distribution (greedy
    rows reduce to the argmax rule; mixed batches are fine).  Key
    consumption is per STEP (one split each), independent of accept
    counts, so chaining is deterministic given the chunk's input key.

    History/cache stale-tail contract: see :func:`_chunk_scan`.

    Returns (targets [n, B, k+1], accepted [n, B], logprobs [n, B, k+1],
    cache, hist, cur_token [B], slot_pos [B], key) — the trailing device
    handles (INCLUDING the advanced key) let a pipelined follow-up chunk
    launch without a readback.
    """

    def verify(params, tok, drafts, cache, pos, key):
        key, sub = jax.random.split(key)
        targets, accepted, lps, cache = spec_verify_sampled(
            params, tok, drafts, cache, pos, sub, bp, fwd=fwd, k=k
        )
        return targets, accepted, lps, cache, key

    return _chunk_scan(
        params, cur_token, hist, cache, slot_pos, key, verify, active,
        k=k, n_steps=n_steps, ngram=ngram,
    )


def _draft_chunk_scan(
    params, dparams, cur_token, dcache, cache, slot_pos, extra, verify,
    active, *, dfwd, k, n_steps,
):
    """Shared scan for the DRAFT-MODEL device-chained chunks: per round,
    the draft LM proposes greedily on device (an inner scan of k+1
    decode steps — one extra so a fully-accepted round leaves the draft
    KV covering every position below the advanced ``slot_pos``), the
    target verifies, and both caches advance in lockstep.

    Draft-KV invariant (mirrors the host-stepped path,
    serve/engine.py): accepted positions hold the accepted tokens'
    draft KV (the accepted token IS the draft token on the same
    accepted prefix); rejected/stale positions are overwritten by the
    next round's propose before they are ever attended (write-before-
    read, positionwise).  ``active`` freezes idle slots exactly like
    :func:`_chunk_scan` — their propose/verify writes land in stale
    windows a refill prefill later overwrites.

    Returns (targets [n, B, k+1], accepted [n, B], logprobs, cache,
    dcache, cur_token, slot_pos, extra) — note the draft cache rides in
    the tuple slot the prompt-lookup chunks use for ``hist``, so the
    engine's pipelined relaunch plumbing is shared verbatim.
    """
    b_idx = jnp.arange(cur_token.shape[0], dtype=jnp.int32)

    def body(carry, _):
        tok, dcache, cache, pos, extra = carry

        def dstep(c, _):
            t, dc, p = c
            lg, dc = dfwd(dparams, t, dc, p)
            nxt = jnp.argmax(lg, axis=-1).astype(jnp.int32)
            return (nxt, dc, p + 1), nxt

        (_t, dcache, _p), ds = jax.lax.scan(
            dstep, (tok, dcache, pos), None, length=k + 1
        )
        drafts = jnp.moveaxis(ds, 0, 1)[:, :k]
        targets, accepted, lps, cache, extra = verify(
            params, tok, drafts, cache, pos, extra
        )
        nxt = targets[b_idx, accepted]
        adv = accepted + 1
        if active is not None:
            nxt = jnp.where(active, nxt, tok)
            adv = adv * active.astype(adv.dtype)
        return (nxt, dcache, cache, pos + adv, extra), (
            targets, accepted, lps,
        )

    (tok, dcache, cache, pos, extra), (targets, accepted, lps) = (
        jax.lax.scan(
            body,
            (cur_token, dcache, cache, slot_pos, extra),
            None,
            length=n_steps,
        )
    )
    return targets, accepted, lps, cache, dcache, tok, pos, extra


def spec_chunk_draft(
    params, dparams, cur_token, dcache, cache, slot_pos, active=None,
    *, fwd, dfwd, k, n_steps,
):
    """``n_steps`` chained GREEDY draft-model propose+verify rounds fully
    on device (jit this) — one host sync per chunk instead of per round.
    See :func:`_draft_chunk_scan` for the draft-KV lockstep contract.

    Returns (targets [n, B, k+1], accepted [n, B], logprobs, cache,
    dcache, cur_token [B], slot_pos [B])."""

    def verify(params, tok, drafts, cache, pos, extra):
        targets, accepted, lps, cache = spec_verify(
            params, tok, drafts, cache, pos, fwd=fwd, k=k
        )
        return targets, accepted, lps, cache, extra

    return _draft_chunk_scan(
        params, dparams, cur_token, dcache, cache, slot_pos, None,
        verify, active, dfwd=dfwd, k=k, n_steps=n_steps,
    )[:7]


def spec_chunk_draft_sampled(
    params, dparams, cur_token, dcache, cache, slot_pos, key, bp,
    active=None, *, fwd, dfwd, k, n_steps,
):
    """Stochastic counterpart of :func:`spec_chunk_draft` (jit this):
    rejection-sampling verify per round, the chunk carries the PRNG key
    (one split per round, accept-count-independent — pipelined
    successors launch from the advanced key handle).  The draft proposal
    stays greedy (a deterministic proposal, the same q the host-stepped
    path uses).  Returns the greedy tuple plus the advanced key."""

    def verify(params, tok, drafts, cache, pos, key):
        key, sub = jax.random.split(key)
        targets, accepted, lps, cache = spec_verify_sampled(
            params, tok, drafts, cache, pos, sub, bp, fwd=fwd, k=k
        )
        return targets, accepted, lps, cache, key

    return _draft_chunk_scan(
        params, dparams, cur_token, dcache, cache, slot_pos, key,
        verify, active, dfwd=dfwd, k=k, n_steps=n_steps,
    )


def spec_verify(params, cur_token, drafts, cache, slot_pos, *, fwd, k):
    """Verify ``k`` drafted tokens per slot in ONE forward (jit this).

    cur_token [B] int32 — last emitted (not yet consumed) token per slot.
    drafts [B, k] int32 — proposed continuations of cur_token.
    slot_pos [B] int32 — cache position cur_token will be written at.
    fwd(params, tokens, cache, positions, seq_lens) -> (logits [B,S,V],
    cache) — the model forward (single-device or shard_mapped TP).

    Returns (targets [B, k+1], accepted [B], logprobs [B, k+1], cache):
    ``targets[:, i]`` is the greedy token after consuming position i;
    ``accepted[s]`` counts the matched draft prefix, so slot ``s`` emits
    ``targets[s, : accepted[s] + 1]`` — between 1 and k+1 tokens, and
    exactly the plain-greedy-decode tokens (the accept rule only keeps
    drafts the model itself would have emitted).

    Cache contract: all k+1 positions (slot_pos .. slot_pos+k) are
    written, including rejected drafts.  That stale tail is safe: the
    next step for the slot starts writing at slot_pos + accepted + 1,
    and since accepted + 1 <= k + 1 its write window always covers the
    stale region; attention masks by (positions, seq_lens) besides.
    """
    toks = jnp.concatenate([cur_token[:, None], drafts], axis=1)  # [B,k+1]
    pos = slot_pos[:, None] + jnp.arange(k + 1, dtype=jnp.int32)[None, :]
    seq_lens = slot_pos + (k + 1)
    logits, cache = fwd(params, toks, cache, pos, seq_lens)
    lg = logits.astype(jnp.float32)
    targets = jnp.argmax(lg, axis=-1).astype(jnp.int32)  # [B, k+1]
    match = (drafts == targets[:, :-1]).astype(jnp.int32)
    accepted = jnp.cumprod(match, axis=1).sum(axis=1)  # [B] in 0..k
    lps = jnp.take_along_axis(
        jax.nn.log_softmax(lg, axis=-1), targets[..., None], axis=-1
    )[..., 0]
    return targets, accepted, lps, cache


def spec_verify_sampled(
    params, cur_token, drafts, cache, slot_pos, key, bp, *, fwd, k
):
    """Stochastic counterpart of :func:`spec_verify` (jit this).

    ``bp`` is a :class:`sampling.BatchedSampling` pytree (one row per
    slot).  Deterministic drafts make the speculative-sampling accept
    rule ``u < p_i(d_i)`` with ``p_i`` the row's FILTERED sampling
    distribution at position ``i`` (temperature / top-k / min-p / top-p
    — :func:`sampling.filter_logits_batched`, the same pipeline the
    engine samples from).  On the first rejection the emitted token is
    drawn from the residual ``p_i`` with the draft removed; after k
    accepts a bonus token is drawn from ``p_k``.  Greedy rows
    (temperature 0) reduce exactly to :func:`spec_verify`'s rule, so
    mixed batches are fine.

    Same return/cache contract as :func:`spec_verify`: slot ``s`` emits
    ``targets[s, : accepted[s] + 1]``; positions past ``accepted`` hold
    unemitted draft tokens.
    """
    from .sampling import BatchedSampling, filter_logits_batched

    b_sz = cur_token.shape[0]
    toks = jnp.concatenate([cur_token[:, None], drafts], axis=1)  # [B,k+1]
    pos = slot_pos[:, None] + jnp.arange(k + 1, dtype=jnp.int32)[None, :]
    seq_lens = slot_pos + (k + 1)
    logits, cache = fwd(params, toks, cache, pos, seq_lens)
    lg = logits.astype(jnp.float32)  # [B, k+1, V]
    v = lg.shape[-1]
    argmax_tok = jnp.argmax(lg, axis=-1).astype(jnp.int32)  # [B, k+1]
    greedy = bp.temperature == 0.0  # [B]

    # Filter every position with its row's parameters ([B*(k+1), V] with
    # each row's params repeated k+1 times, matching C-order reshape).
    bp_rep = BatchedSampling(*(jnp.repeat(f, k + 1) for f in bp))
    filt = filter_logits_batched(lg.reshape(b_sz * (k + 1), v), bp_rep)
    filt = filt.reshape(b_sz, k + 1, v)
    p = jax.nn.softmax(filt, axis=-1)

    u_key, res_key, bonus_key = jax.random.split(key, 3)
    # Accept rule per draft position.
    pd = jnp.take_along_axis(p[:, :k], drafts[..., None], axis=-1)[..., 0]
    u = jax.random.uniform(u_key, (b_sz, k))
    accept = jnp.where(
        greedy[:, None], drafts == argmax_tok[:, :k], u < pd
    )
    accepted = jnp.cumprod(accept.astype(jnp.int32), axis=1).sum(axis=1)

    # Residual draw for each draft position (only the first rejected one
    # is emitted) and the bonus draw after k accepts.  A fully-collapsed
    # row (p(d) == 1, all else -inf) can't reject, so the all--inf
    # residual row is never selected.
    res_logits = jnp.where(
        jax.nn.one_hot(drafts, v, dtype=bool), -jnp.inf, filt[:, :k]
    )
    res_tok = jax.random.categorical(
        res_key, res_logits.reshape(b_sz * k, v), axis=-1
    ).reshape(b_sz, k).astype(jnp.int32)
    bonus_tok = jax.random.categorical(
        bonus_key, filt[:, k], axis=-1
    ).astype(jnp.int32)

    chosen = jnp.where(
        greedy[:, None],
        argmax_tok,
        jnp.concatenate([res_tok, bonus_tok[:, None]], axis=1),
    )  # [B, k+1] — the token emitted IF the step ends at that position
    chosen_at = jnp.take_along_axis(chosen, accepted[:, None], axis=1)
    pos_idx = jnp.arange(k + 1, dtype=jnp.int32)[None, :]
    full = jnp.concatenate([drafts, chosen[:, k:]], axis=1)
    targets = jnp.where(pos_idx == accepted[:, None], chosen_at, full)

    lps = jnp.take_along_axis(
        jax.nn.log_softmax(lg, axis=-1), targets[..., None], axis=-1
    )[..., 0]
    return targets, accepted, lps, cache
