"""Shared shape-bucketing: bounded compiled-program counts.

Every novel (batch, length) shape reaching a jitted full-model program
costs a fresh compile (10-40s through this rig's remote-compile helper —
CLAUDE.md), so serving and scoring paths round lengths up to power-of-two
buckets.  One definition keeps prefill and scoring buckets in sync.
"""

from __future__ import annotations

__all__ = ["bucket_len"]


def bucket_len(n: int, minimum: int = 16) -> int:
    """The smallest power-of-two >= max(n, minimum)."""
    b = minimum
    while b < n:
        b *= 2
    return b
