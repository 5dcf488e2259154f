"""Timing harness: the TPU analog of the reference's CUDA-event timing
(reference ``benchmark.py:117-126``) — dispatch once, block on the final
result, so per-iteration host overhead stays out of the measurement."""

from __future__ import annotations

import time
from typing import Callable

import jax

__all__ = ["measure_s", "measure_chained_s", "Stats"]


class Stats:
    def __init__(self, times):
        import numpy as np

        t = np.asarray(times)
        self.mean = float(t.mean())
        self.std = float(t.std())
        self.min = float(t.min())
        self.max = float(t.max())
        self.median = float(np.median(t))

    def __repr__(self):
        return (
            f"mean {self.mean * 1e3:.3f} ms ± {self.std * 1e3:.3f} "
            f"(min {self.min * 1e3:.3f}, median {self.median * 1e3:.3f}, "
            f"max {self.max * 1e3:.3f})"
        )


def measure_s(fn: Callable, iters: int = 50, warmup: int = 5, repeats: int = 5) -> Stats:
    """Run fn() `iters` times per repeat; returns per-call seconds stats.

    fn must return a jax array (or pytree); only the last result is blocked
    on, letting the dispatch queue pipeline the whole batch like a stream of
    decode steps would.
    """
    for _ in range(warmup):
        out = fn()
    jax.block_until_ready(out)

    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / iters)
    return Stats(times)


def measure_chained_s(step: Callable, x0, n1: int = 10, n2: int = 50, repeats: int = 5) -> Stats:
    """Marginal per-call seconds of ``x = step(x)`` chains (robust timing).

    Chains calls through a data dependency and reads back ONE element to
    force completion, then takes the marginal time between chains of ``n1``
    and ``n2`` calls.  This measures true device time even on runtimes where
    ``block_until_ready`` returns early (e.g. proxied/tunneled devices) and
    subtracts fixed dispatch+readback overhead — the TPU analog of CUDA-event
    deltas (reference ``benchmark.py:117-126``).

    ``step`` must map an array to a same-shaped array that *depends on* the
    computation under test (fold a scaled output element into the carry; use
    a tiny nonzero factor, never ``* 0`` — XLA dead-code-eliminates that).
    """
    import numpy as np

    def run(n):
        x = x0
        t0 = time.perf_counter()
        for _ in range(n):
            x = step(x)
        np.asarray(jax.device_get(x[(0,) * x.ndim]))  # force completion
        return time.perf_counter() - t0

    run(3)  # warmup / compile
    return Stats([(run(n2) - run(n1)) / (n2 - n1) for _ in range(repeats)])
