"""MLP dequantization benchmark — TPU equivalent of reference protocol A.

Mirrors the reference's ``benchmark.py`` contract (SURVEY.md §3.3): a
Llama-style gated MLP of three NF4-quantized linears, correctness gates
before any timing, a timed dequant loop over the same three shape configs,
a speedup report with the 1.15x gate, and a matplotlib chart.

TPU translation of each piece:

* ``Linear4bit`` modules (reference ``benchmark.py:38-50``) -> three
  :class:`PackedNF4` weights (gate/up/down).
* Unsloth ``fast_dequantize`` baseline (reference ``benchmark.py:52-59``) ->
  the jnp/XLA reference backend (``NF4TPU_BACKEND=jnp``) — an independent,
  known-good dequant the optimized Pallas path must beat.
* matmul-level parity vs bnb's own forward (reference ``benchmark.py:105``)
  -> fused ``nf4_matmul`` forward vs dense matmul on oracle-dequantized
  weights.
* tensor-level parity vs Unsloth (reference ``benchmark.py:110-113``) ->
  BIT-EXACT comparison vs the NumPy oracle (the reference settles for
  rtol=0.1; we assert equality).
* 3-CUDA-stream concurrent dequant (reference ``benchmark.py:68-84``) ->
  all three dequants dispatched in one jitted computation — XLA schedules
  them on the chip back-to-back with no host round-trips.
* CUDA-event timing (reference ``benchmark.py:117-126``) -> chained-marginal
  timing (``measure_chained_s``), which survives runtimes where
  ``block_until_ready`` lies.

Usage: python benchmarks/benchmark_mlp.py [--iterations N] [--small] [--no-plot]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from nf4_tpu import dequantize, nf4_matmul
from nf4_tpu.nf4.reference import dequantize_nf4, quantize_nf4
from nf4_tpu.utils.timing import measure_chained_s


def oracle_np_dtype(jnp_dtype):
    """The NumPy dtype matching a jnp output dtype (bf16 via ml_dtypes)."""
    if jnp.dtype(jnp_dtype) == jnp.bfloat16:
        import ml_dtypes

        return np.dtype(ml_dtypes.bfloat16)
    return np.dtype(np.float16)

# Reference configs (benchmark.py:88-92): (bsz, qlen, hd, m, dtype).
CONFIGS = [
    (2, 3333, 2048, 8192, jnp.float16),
    (5, 777, 1024, 4096, jnp.bfloat16),
    (3, 2048, 4096, 14336, jnp.bfloat16),
]
SMALL_CONFIGS = [
    (2, 33, 256, 1024, jnp.float16),
    (3, 64, 512, 1024, jnp.bfloat16),
]


class MLP:
    """Gated MLP of three NF4 weights (reference benchmark.py:38-50)."""

    def __init__(self, hd: int, m: int, dtype, seed: int = 0):
        rng = np.random.default_rng(seed)
        self.dtype = dtype
        # Match the reference's init scale (normal / sqrt fan-in-ish).
        self.state_gate = quantize_nf4(
            (rng.standard_normal((m, hd)) * 0.02).astype(np.float32)
        )
        self.state_up = quantize_nf4(
            (rng.standard_normal((m, hd)) * 0.02).astype(np.float32)
        )
        self.state_down = quantize_nf4(
            (rng.standard_normal((hd, m)) * 0.02).astype(np.float32)
        )
        from nf4_tpu import pack_for_tpu

        self.gate = pack_for_tpu(self.state_gate, dtype=dtype)
        self.up = pack_for_tpu(self.state_up, dtype=dtype)
        self.down = pack_for_tpu(self.state_down, dtype=dtype)

    def forward_fused(self, x):
        """Forward with fused dequant-matmul (weights stay packed in HBM)."""
        g = nf4_matmul(x, self.gate)
        u = nf4_matmul(x, self.up)
        return nf4_matmul(jax.nn.silu(g.astype(jnp.float32)).astype(x.dtype) * u, self.down)

    def forward_dense(self, x):
        """Oracle forward: dense matmul on oracle-dequantized weights."""
        wg = _oracle_dense(self.state_gate, self.dtype)
        wu = _oracle_dense(self.state_up, self.dtype)
        wd = _oracle_dense(self.state_down, self.dtype)
        xf = x.astype(jnp.float32)
        g = xf @ wg.astype(jnp.float32).T
        u = xf @ wu.astype(jnp.float32).T
        h = jax.nn.silu(g) * u
        return (h @ wd.astype(jnp.float32).T).astype(self.dtype)

    def dequantize_all(self):
        """Dequantize the three weights (the reference's timed op,
        benchmark.py:62-65)."""
        return dequantize(self.gate), dequantize(self.up), dequantize(self.down)

    def forward_jnp_backend(self, x):
        """Baseline arm: the XLA-reference backend end to end (dequant in
        XLA + fp32 matmul) — the 'Unsloth fast_dequantize' analog."""
        return self.forward_fused(x)  # dispatched by NF4TPU_BACKEND=jnp

    def forward_dequant_dense(self, x):
        """The reference package's own architecture: materialize the bf16
        weight (fast dequant kernel), then a separate dense XLA matmul
        (reference benchmark.py:62-65 always materializes then matmuls)."""
        from nf4_tpu.ops.dequant import dequantize_t_fast

        def mm(xv, pw):
            wt = dequantize_t_fast(pw)  # [n_pad, m_pad] bf16
            n, m = pw.in_features, pw.out_features
            xp = jnp.pad(xv, [(0, 0)] * (xv.ndim - 1) + [(0, wt.shape[0] - n)])
            return (xp.astype(jnp.bfloat16) @ wt)[..., :m].astype(xv.dtype)

        g = mm(x, self.gate)
        u = mm(x, self.up)
        return mm(jax.nn.silu(g.astype(jnp.float32)).astype(x.dtype) * u, self.down)

    def make_int8(self):
        from nf4_tpu.ops.int8_serve import recode_int8_weight

        self.gate8 = recode_int8_weight(self.gate)
        self.up8 = recode_int8_weight(self.up)
        self.down8 = recode_int8_weight(self.down)

    def forward_int8(self, x):
        """int8-recode serving arm (2x weight bytes, decode-free stream)."""
        from nf4_tpu.ops.int8_serve import int8_matmul

        g = int8_matmul(x, self.gate8)
        u = int8_matmul(x, self.up8)
        return int8_matmul(
            jax.nn.silu(g.astype(jnp.float32)).astype(x.dtype) * u, self.down8
        )


def _oracle_dense(state, dtype):
    out = dequantize_nf4(state, dtype=oracle_np_dtype(dtype))  # numpy, bnb-exact
    return jnp.asarray(np.asarray(out, dtype=np.float32)).astype(dtype)


def assert_bit_exact(mlp: MLP) -> None:
    """Tensor-level parity: Pallas dequant vs the NumPy oracle, bit-exact.

    The reference asserts vs Unsloth at rtol=0.1 (benchmark.py:13-16,110-113);
    the TPU build holds itself to equality of every bit.
    """
    for name, pw, state in (
        ("gate", mlp.gate, mlp.state_gate),
        ("up", mlp.up, mlp.state_up),
        ("down", mlp.down, mlp.state_down),
    ):
        ours = np.asarray(dequantize(pw)).astype(np.float32)
        want = np.asarray(dequantize_nf4(state, dtype=oracle_np_dtype(mlp.dtype))).astype(
            np.float32
        )
        if not np.array_equal(ours, want):
            bad = int((ours != want).sum())
            raise AssertionError(f"{name}: {bad} mismatched elements vs oracle")


def assert_forward_close(mlp: MLP, x) -> None:
    """Matmul-level parity of the fused path vs the oracle dense forward
    (analog of reference benchmark.py:105)."""
    got = np.asarray(mlp.forward_fused(x), dtype=np.float32)
    want = np.asarray(mlp.forward_dense(x), dtype=np.float32)
    scale = max(1e-6, float(np.abs(want).max()))
    err = float(np.abs(got - want).max()) / scale
    tol = 1.5e-2 if mlp.dtype == jnp.bfloat16 else 5e-3
    assert err < tol, f"fused forward rel err {err:.3e} >= {tol}"


def time_dequant(mlp: MLP, backend: str, iters_hint: int):
    """Time one 'dequantize all three projections' step under a backend."""
    os.environ["NF4TPU_BACKEND"] = backend

    @jax.jit
    def step(carry):
        g, u, d = mlp.dequantize_all()
        # Chain through one element of each output so nothing is dead code.
        probe = (
            g[0, 0].astype(jnp.float32)
            + u[0, 0].astype(jnp.float32)
            + d[0, 0].astype(jnp.float32)
        )
        return carry + probe * jnp.float32(1e-30)

    x0 = jnp.zeros((), jnp.float32)
    n2 = max(10, min(50, iters_hint))
    stats = measure_chained_s(step, x0, n1=max(3, n2 // 5), n2=n2, repeats=3)
    return stats


def time_forward(fn, x, backend: str, iters_hint: int):
    """Time one MLP forward under an implementation arm.

    The chain folds ``jnp.max`` of the output back into the carry — XLA
    SHRINKS a dot whose output is only sliced and reassociates sums, so max
    is the only safe probe for the XLA-dot arms (see CLAUDE.md traps).
    """
    os.environ["NF4TPU_BACKEND"] = backend

    @jax.jit
    def step(xc):
        out = fn(xc)
        return xc + (jnp.max(out.astype(jnp.float32)) * 1e-30).astype(xc.dtype)

    n2 = max(10, min(50, iters_hint))
    return measure_chained_s(step, x, n1=max(3, n2 // 5), n2=n2, repeats=3)


# The four comparison arms (reference benchmark.py:149-162 compares three:
# Unsloth, PEFT, and its own Triton path; we add the int8 serving arm):
#   xla-ref       — jnp/XLA backend end to end (the Unsloth-baseline analog)
#   fused         — Pallas fused dequant-matmul (weights never leave HBM packed)
#   dequant+dense — materialize bf16 weights, then dense XLA matmul (the
#                   reference package's own two-step architecture)
#   int8-recode   — serving mode: decode-free int8 stream, 2x weight bytes
ARMS = ("xla-ref", "fused", "dequant+dense", "int8-recode")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iterations", type=int, default=50, help="timed chain length")
    ap.add_argument("--small", action="store_true", help="tiny shapes (CI/CPU)")
    ap.add_argument("--no-plot", action="store_true")
    args = ap.parse_args()

    configs = SMALL_CONFIGS if args.small else CONFIGS
    default_backend = os.environ.get("NF4TPU_BACKEND", "auto")
    on_tpu = jax.default_backend() == "tpu"
    fast = "pallas" if on_tpu else "jnp"
    print(f"device: {jax.devices()[0].device_kind} ({jax.default_backend()})")

    rows = []  # (name, {arm: seconds})
    for bsz, qlen, hd, m, dtype in configs:
        name = f"hd={hd} m={m} {jnp.dtype(dtype).name}"
        print(f"\n=== {name} (bsz={bsz}, qlen={qlen}) ===")
        mlp = MLP(hd, m, dtype)
        mlp.make_int8()
        x = jax.random.normal(jax.random.PRNGKey(3), (bsz, qlen, hd)).astype(dtype)

        # Correctness gates BEFORE timing (reference benchmark.py:104-113).
        assert_bit_exact(mlp)
        print("  dequant vs oracle: BIT-EXACT ok")
        assert_forward_close(mlp, x[:1, :64])
        print("  fused forward vs oracle forward: ok")

        dq_base = time_dequant(mlp, "jnp", args.iterations)
        dq_opt = time_dequant(mlp, fast, args.iterations)
        print(f"  dequant-only: ref {dq_base.median * 1e3:.3f} ms, "
              f"pallas {dq_opt.median * 1e3:.3f} ms "
              f"({dq_base.median / max(dq_opt.median, 1e-12):.2f}x)")

        times = {}
        for arm, fn, backend in (
            ("xla-ref", mlp.forward_jnp_backend, "jnp"),
            ("fused", mlp.forward_fused, fast),
            ("dequant+dense", mlp.forward_dequant_dense, fast),
            ("int8-recode", mlp.forward_int8, fast),
        ):
            st = time_forward(fn, x, backend, args.iterations)
            times[arm] = st.median
            print(f"  {arm:14s} {st.median * 1e3:8.3f} ms/step "
                  f"({times['xla-ref'] / max(st.median, 1e-12):.2f}x vs xla-ref)")
        os.environ["NF4TPU_BACKEND"] = default_backend
        rows.append((name, times))

    totals = {arm: sum(r[1][arm] for r in rows) for arm in ARMS}
    total_speedup = totals["xla-ref"] / max(totals["fused"], 1e-12)
    print("\n===== Summary (MLP forward, total over configs) =====")
    for arm in ARMS:
        print(
            f"  {arm:14s} {totals[arm] * 1e3:9.3f} ms  "
            f"{totals['xla-ref'] / max(totals[arm], 1e-12):6.2f}x vs xla-ref"
        )
    gate = 1.15  # the reference's speedup gate (benchmark.py:174-177)
    status = "PASS" if total_speedup >= gate else "FAIL"
    print(f"  fused vs xla-ref baseline: {total_speedup:.3f}x "
          f"(gate {gate}x: {status})")

    if not args.no_plot:
        try:
            plot(rows, total_speedup)
            print("  plot saved to benchmark_results.png")
        except Exception as e:  # matplotlib optional, like tabulate in ref
            print(f"  (plot skipped: {e})")

    return 0 if status == "PASS" else 1


ARM_COLORS = {
    "xla-ref": "#9aa5b1",
    "fused": "#3c7fd0",
    "dequant+dense": "#7fb069",
    "int8-recode": "#d08a3c",
}


def plot(rows, total_speedup):
    """Grouped bars of per-config forward times across the four arms +
    fused-speedup line (analog of reference benchmark.py:187-232)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    names = [r[0] for r in rows]
    xs = np.arange(len(rows))
    width = 0.2
    fig, ax1 = plt.subplots(figsize=(10, 5))
    for i, arm in enumerate(ARMS):
        vals = [r[1][arm] * 1e3 for r in rows]
        ax1.bar(xs + (i - 1.5) * width, vals, width=width, label=arm,
                color=ARM_COLORS[arm])
    ax1.set_xticks(xs, names, rotation=10)
    ax1.set_ylabel("MLP forward time per step (ms)")
    ax1.legend(loc="upper left")
    ax2 = ax1.twinx()
    speedups = [r[1]["xla-ref"] / max(r[1]["fused"], 1e-12) for r in rows]
    ax2.plot(xs, speedups, "o-", color="#c0392b", label="fused speedup")
    ax2.axhline(1.15, color="#c0392b", linestyle="--", linewidth=1)
    ax2.set_ylabel("fused speedup vs xla-ref (x)")
    fig.suptitle(
        f"NF4 MLP forward: four arms (fused total {total_speedup:.2f}x vs XLA ref)"
    )
    fig.tight_layout()
    fig.savefig("benchmark_results.png", dpi=120)


if __name__ == "__main__":
    sys.exit(main())
