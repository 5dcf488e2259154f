"""Token sampling strategies (functional, jit-friendly)."""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["SamplingParams", "sample"]


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
