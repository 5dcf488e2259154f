"""Perplexity evaluation for quantized Llama models.

End-to-end quality is a first-class target (BASELINE.md: <= 0.1 perplexity
delta vs bitsandbytes NF4); the reference package never measures model-level
quality — its strongest check is a dequant-tensor comparison at rtol=0.1
(reference ``benchmark.py:13-16,110-113``).  This module supplies the
teacher-forced cross-entropy / perplexity harness used to validate that the
quantized serving stack preserves model quality.

All log-probabilities are computed in fp32 regardless of the model compute
dtype (the logits head already runs in fp32).
"""

from __future__ import annotations

import functools
from typing import Iterable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.llama import LlamaConfig, LlamaParams, forward, init_kv_cache

__all__ = ["sequence_nll", "perplexity", "perplexity_report", "token_logprobs"]


@functools.partial(jax.jit, static_argnames=("cfg",))
def _batch_nll(params, tokens, seq_lens, cache, cfg: LlamaConfig):
    """Summed next-token NLL and token count for a padded batch.

    tokens: [B, T] int32; positions t predicts t+1; positions >= seq_len-1
    are masked out.  Returns (sum_nll fp32, n_tokens int32).  ``cache`` is
    the full KVCache pytree (including scale leaves when ``cfg.kv_quant``).
    """
    B, T = tokens.shape
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
    logits, _ = forward(params, cfg, tokens, cache, positions, seq_lens)
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits[:, :-1, :], axis=-1)  # predicts t+1
    targets = tokens[:, 1:]
    tok_logp = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    mask = (
        jnp.arange(T - 1, dtype=jnp.int32)[None, :] < (seq_lens[:, None] - 1)
    ).astype(jnp.float32)
    return -(tok_logp * mask).sum(), mask.sum().astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _batch_token_logp(
    params, tokens, seq_lens, cache, cfg: LlamaConfig,
    lora=None, adapter_ids=None,
):
    """Per-position log P(token_t | prefix) for a padded batch: [B, T-1]
    fp32 (position t-1 predicts t; padding rows are left as-is — the host
    slices by true length).  ``lora``/``adapter_ids``: optional multi-LoRA
    bank + per-row selection (serve.Engine.score with adapters)."""
    B, T = tokens.shape
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
    logits, _ = forward(
        params, cfg, tokens, cache, positions, seq_lens,
        lora=lora, adapter_ids=adapter_ids,
    )
    logp = jax.nn.log_softmax(logits.astype(jnp.float32)[:, :-1, :], axis=-1)
    targets = tokens[:, 1:]
    return jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]


def _bucket_len(n: int, cap: int) -> int:
    """Pad a sequence length to a power-of-two bucket (min 16, capped) —
    the same buckets the serving engine uses (utils.shapes.bucket_len),
    so scoring and prefill share compiled shapes."""
    from ..utils.shapes import bucket_len

    return min(bucket_len(n), cap)


def token_logprobs(
    params: LlamaParams, cfg: LlamaConfig, sequences: Sequence[Sequence[int]],
    batch_size: int = 8, lora=None, adapter_ids=None,
) -> list:
    """Teacher-forced per-token log-probabilities for each sequence.

    Returns one list per sequence of length ``len(seq) - 1``: entry ``i``
    is log P(seq[i+1] | seq[:i+1]).  (The first token of a sequence has no
    conditional probability — OpenAI's completions API reports it as
    null; callers prepend that themselves.)  Sequences are truncated to
    ``cfg.max_seq_len``; length-0/1 sequences yield [].
    """
    out = [[] for _ in sequences]
    todo = [
        (i, list(s)[: cfg.max_seq_len])
        for i, s in enumerate(sequences)
        if len(s) >= 2
    ]
    for i0 in range(0, len(todo), batch_size):
        chunk = todo[i0 : i0 + batch_size]
        B = len(chunk)
        T = _bucket_len(max(len(s) for _, s in chunk), cfg.max_seq_len)
        toks = np.zeros((B, T), dtype=np.int32)
        lens = np.zeros((B,), dtype=np.int32)
        for j, (_, s) in enumerate(chunk):
            toks[j, : len(s)] = s
            lens[j] = len(s)
        cache = init_kv_cache(cfg, B)
        ids = None
        if adapter_ids is not None:
            ids = jnp.asarray(
                [adapter_ids[i] for i, _ in chunk], dtype=jnp.int32
            )
        lp = np.asarray(
            _batch_token_logp(
                params, jnp.asarray(toks), jnp.asarray(lens), cache, cfg,
                lora=lora, adapter_ids=ids,
            )
        )
        for j, (i, s) in enumerate(chunk):
            out[i] = [float(v) for v in lp[j, : len(s) - 1]]
    return out


def sequence_nll(
    params: LlamaParams, cfg: LlamaConfig, sequences: Sequence[Sequence[int]],
    batch_size: int = 8,
) -> tuple:
    """Total next-token negative log likelihood over token sequences.

    Sequences longer than ``cfg.max_seq_len`` are truncated; returns
    (total_nll, total_predicted_tokens).
    """
    seqs = [list(s)[: cfg.max_seq_len] for s in sequences if len(s) >= 2]
    if not seqs:
        return 0.0, 0
    total_nll, total_tok = 0.0, 0
    for i in range(0, len(seqs), batch_size):
        chunk = seqs[i : i + batch_size]
        B = len(chunk)
        T = max(len(s) for s in chunk)
        toks = np.zeros((B, T), dtype=np.int32)
        lens = np.zeros((B,), dtype=np.int32)
        for j, s in enumerate(chunk):
            toks[j, : len(s)] = s
            lens[j] = len(s)
        cache = init_kv_cache(cfg, B)
        nll, ntok = _batch_nll(
            params, jnp.asarray(toks), jnp.asarray(lens), cache, cfg
        )
        total_nll += float(nll)
        total_tok += int(ntok)
    return total_nll, total_tok


def perplexity(
    params: LlamaParams, cfg: LlamaConfig, sequences: Sequence[Sequence[int]],
    batch_size: int = 8,
) -> float:
    """exp(mean next-token NLL) over all predicted tokens."""
    nll, ntok = sequence_nll(params, cfg, sequences, batch_size=batch_size)
    if ntok == 0:
        return float("nan")
    return float(np.exp(nll / ntok))


def perplexity_report(
    params: LlamaParams, cfg: LlamaConfig, sequences: Sequence[Sequence[int]],
    baseline_ppl: float | None = None, gate: float = 0.1,
    batch_size: int = 8,
) -> dict:
    """Perplexity plus the BASELINE.md <= 0.1-delta gate when a baseline
    (e.g. bitsandbytes NF4 on GPU, or the fp16 model) is supplied."""
    ppl = perplexity(params, cfg, sequences, batch_size=batch_size)
    report = {"perplexity": ppl}
    if baseline_ppl is not None:
        report["baseline_perplexity"] = baseline_ppl
        report["delta"] = ppl - baseline_ppl
        report["within_gate"] = bool(abs(ppl - baseline_ppl) <= gate)
    return report
