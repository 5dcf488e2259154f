"""Token sampling strategies (functional, jit-friendly)."""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp

__all__ = [
    "SamplingParams",
    "sample",
    "BatchedSampling",
    "sample_batched",
    "filter_logits_batched",
]


@dataclasses.dataclass(frozen=True)
class SamplingParams:
    temperature: float = 0.0  # 0 => greedy
    top_k: int = 0  # 0 => disabled
    top_p: float = 1.0  # 1 => disabled
    # min-p filtering: drop tokens whose probability is below
    # min_p * max_probability (0 => disabled).
    min_p: float = 0.0
    # Divide logits of already-generated tokens by this factor (> 1
    # discourages repeats; 1 => disabled).  Applied to positive logits as
    # division and negative as multiplication, the standard CTRL rule.
    repetition_penalty: float = 1.0
    # OpenAI-style additive penalties (0 => disabled), applied after the
    # repetition penalty: logits -= presence_penalty * (count > 0)
    #                              + frequency_penalty * count,
    # where count is how many times the token was generated this request.
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    # Per-token logit offsets ((token_id, bias) pairs; a tuple so the
    # dataclass stays hashable).  Added after the penalties and before
    # greedy argmax / filtering, so +-large values force / ban tokens in
    # every mode.  The engine densifies these to a device-resident [B, V]
    # row per slot.
    logit_bias: tuple = ()
    # Host-side per-request controls (checked by the engine's scheduler,
    # never traced into device programs):
    # extra end-of-sequence token ids on top of the engine's eos_token and
    # generate()'s stop_tokens argument.
    stop_tokens: tuple = ()
    # Generation budget override; None defers to generate()'s
    # max_new_tokens argument.
    max_new_tokens: Optional[int] = None
    # GUIDED CHOICE: constrain the output to be exactly one of these
    # token sequences (a tuple of int tuples).  The engine masks each
    # step's logits to the tokens consistent with some choice (within a
    # sampling mode: greedy picks the highest-logit allowed token,
    # stochastic samples among allowed) and finishes at the first full
    # match.  The request's budget is auto-extended to the longest
    # choice.  Host-side scheduler field.
    choices: tuple = ()
    # Suppress end-of-sequence until this many tokens are generated: the
    # engine bans its eos_token and this request's stop tokens (a -1e9
    # dense-bias row, lifted once the count is reached) so short prompts
    # cannot end instantly.  0 disables.
    min_new_tokens: int = 0
    # Record the top-N (token, logprob) alternatives of the model's raw
    # next-token distribution at every generated position (OpenAI
    # completions' integer ``logprobs`` / chat's ``top_logprobs``).
    # Host-side: the engine requests top-max(N) from the device once per
    # step and slices per request; 0 disables.
    top_logprobs: int = 0
    # Reproducible sampling: when set, this request's token stream depends
    # ONLY on (seed, tokens-generated-so-far) — identical across batch
    # compositions, decode chunk sizes, and engine restarts.  None (the
    # default) uses the engine's shared key stream.  Honored by the
    # engine; plain sample()/sample_batched() callers must pass the
    # per-row step index themselves (see sample_batched's step_idx).
    seed: Optional[int] = None


def apply_repetition_penalty(
    logits: jax.Array,  # [B, V] fp32
    generated_mask: jax.Array,  # [B, V] bool — True where a token was emitted
    penalty: float,
) -> jax.Array:
    """CTRL-style repetition penalty on previously generated tokens."""
    if penalty == 1.0:
        return logits
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(generated_mask, penalized, logits)


def sample(
    logits: jax.Array,  # [B, V] fp32
    params: SamplingParams,
    key: Optional[jax.Array] = None,
    generated_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Pick next tokens [B] from logits under the given strategy."""
    logits = logits.astype(jnp.float32)
    if generated_mask is not None and params.repetition_penalty != 1.0:
        logits = apply_repetition_penalty(
            logits, generated_mask, params.repetition_penalty
        )

    if params.temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    assert key is not None, "stochastic sampling requires a PRNG key"
    logits = logits / params.temperature

    if params.top_k > 0:
        kth = jnp.sort(logits, axis=-1)[:, -params.top_k][:, None]
        logits = jnp.where(logits < kth, -jnp.inf, logits)

    if params.min_p > 0.0:
        probs = jax.nn.softmax(logits, axis=-1)
        cutoff = params.min_p * probs.max(axis=-1, keepdims=True)
        logits = jnp.where(probs < cutoff, -jnp.inf, logits)

    if params.top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # Keep the smallest prefix with cumulative mass >= top_p (always
        # keep the top token).
        keep = cum - probs < params.top_p
        threshold = jnp.min(
            jnp.where(keep, sorted_logits, jnp.inf), axis=-1, keepdims=True
        )
        logits = jnp.where(logits < threshold, -jnp.inf, logits)

    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


class BatchedSampling(NamedTuple):
    """Per-row sampling parameters as device arrays (a jit-traceable
    pytree) — the engine's per-request sampling representation.  Field
    semantics match :class:`SamplingParams` row-wise; a disabled filter
    (top_k 0, top_p 1, min_p 0, penalty 1) leaves that row untouched."""

    temperature: jax.Array  # [B] fp32
    top_k: jax.Array  # [B] int32
    top_p: jax.Array  # [B] fp32
    min_p: jax.Array  # [B] fp32
    repetition_penalty: jax.Array  # [B] fp32
    presence_penalty: jax.Array  # [B] fp32
    frequency_penalty: jax.Array  # [B] fp32
    seed: jax.Array  # [B] int32 (0 when unseeded)
    has_seed: jax.Array  # [B] bool

    @staticmethod
    def stack(params: Sequence[SamplingParams]) -> "BatchedSampling":
        return BatchedSampling(
            temperature=jnp.asarray(
                [p.temperature for p in params], jnp.float32
            ),
            top_k=jnp.asarray([p.top_k for p in params], jnp.int32),
            top_p=jnp.asarray([p.top_p for p in params], jnp.float32),
            min_p=jnp.asarray([p.min_p for p in params], jnp.float32),
            repetition_penalty=jnp.asarray(
                [p.repetition_penalty for p in params], jnp.float32
            ),
            presence_penalty=jnp.asarray(
                [p.presence_penalty for p in params], jnp.float32
            ),
            frequency_penalty=jnp.asarray(
                [p.frequency_penalty for p in params], jnp.float32
            ),
            seed=jnp.asarray(
                [p.seed if p.seed is not None else 0 for p in params],
                jnp.int32,
            ),
            has_seed=jnp.asarray(
                [p.seed is not None for p in params], bool
            ),
        )


def filter_logits_batched(
    logits: jax.Array,  # [B, V] fp32 (repetition penalty already applied)
    bp: BatchedSampling,
) -> jax.Array:
    """Row-wise temperature scaling + top-k / min-p / top-p filtering.

    Returns logits with filtered-out entries at -inf; ``softmax`` of the
    result is each row's target sampling distribution (greedy rows are
    scaled by temperature 1 and left unfiltered — callers special-case
    them with argmax).  Factored out of :func:`sample_batched` so the
    speculative rejection sampler scores draft tokens against exactly
    the distribution the engine samples from.
    """
    v = logits.shape[-1]
    greedy = bp.temperature == 0.0  # [B]
    lg = logits / jnp.where(greedy, 1.0, bp.temperature)[:, None]

    k = jnp.clip(bp.top_k, 0, v)
    sorted_asc = jnp.sort(lg, axis=-1)
    kth = jnp.take_along_axis(
        sorted_asc, jnp.clip(v - k, 0, v - 1)[:, None], axis=-1
    )
    lg = jnp.where((k > 0)[:, None] & (lg < kth), -jnp.inf, lg)

    probs = jax.nn.softmax(lg, axis=-1)
    cutoff = bp.min_p[:, None] * probs.max(axis=-1, keepdims=True)
    lg = jnp.where(
        (bp.min_p > 0.0)[:, None] & (probs < cutoff), -jnp.inf, lg
    )

    sorted_desc = jnp.sort(lg, axis=-1)[:, ::-1]
    probs = jax.nn.softmax(sorted_desc, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    keep = cum - probs < bp.top_p[:, None]
    threshold = jnp.min(
        jnp.where(keep, sorted_desc, jnp.inf), axis=-1, keepdims=True
    )
    return jnp.where(
        (bp.top_p < 1.0)[:, None] & (lg < threshold), -jnp.inf, lg
    )


def sample_batched(
    logits: jax.Array,  # [B, V] fp32
    bp: BatchedSampling,
    key: Optional[jax.Array] = None,
    generated_mask: Optional[jax.Array] = None,
    step_idx: Optional[jax.Array] = None,
    logit_bias: Optional[jax.Array] = None,  # [B, V] fp32
) -> jax.Array:
    """Row-wise :func:`sample`: each row uses its own parameters.

    The math mirrors the scalar path op-for-op (disabled filters reduce
    to identity), so a batch of identical parameters produces exactly the
    tokens the scalar path would with the same key.  Greedy rows
    (temperature 0) take their argmax regardless of ``key``.

    ``step_idx`` [B] int32 — each row's tokens-generated-so-far count;
    required for rows with ``has_seed``: a seeded row draws with
    ``fold_in(PRNGKey(seed), step_idx)`` instead of the shared ``key``,
    making its stream a pure function of (seed, step) — independent of
    batchmates and decode chunking.  ``None`` ignores seeds.

    ``generated_mask`` is per-row emitted-token state: bool [B, V]
    (repetition penalty only) or int32 counts [B, V] (also enables the
    additive presence/frequency penalties — the engine keeps counts
    whenever a request uses them).
    """
    logits = logits.astype(jnp.float32)
    if generated_mask is not None:
        is_counts = generated_mask.dtype != jnp.bool_
        emitted = generated_mask > 0 if is_counts else generated_mask
        pen = bp.repetition_penalty[:, None]
        penalized = jnp.where(logits > 0, logits / pen, logits * pen)
        logits = jnp.where(emitted & (pen != 1.0), penalized, logits)
        if is_counts:
            cnt = generated_mask.astype(jnp.float32)
            logits = logits - (
                bp.presence_penalty[:, None] * emitted.astype(jnp.float32)
                + bp.frequency_penalty[:, None] * cnt
            )
    if logit_bias is not None:
        logits = logits + logit_bias

    greedy = bp.temperature == 0.0  # [B]
    greedy_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if key is None:
        # All-greedy fast path (the engine only omits the key then).
        return greedy_tok

    lg = filter_logits_batched(logits, bp)
    stoch_tok = jax.random.categorical(key, lg, axis=-1).astype(jnp.int32)
    if step_idx is not None:
        row_keys = jax.vmap(
            lambda s, t: jax.random.fold_in(jax.random.PRNGKey(s), t)
        )(bp.seed, jnp.asarray(step_idx, jnp.int32))
        seeded_tok = jax.vmap(jax.random.categorical)(row_keys, lg).astype(
            jnp.int32
        )
        stoch_tok = jnp.where(bp.has_seed, seeded_tok, stoch_tok)
    return jnp.where(greedy, greedy_tok, stoch_tok)
