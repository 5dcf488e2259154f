"""Environment + kernel diagnostics — TPU equivalent of the reference's
``run_diagnostics.py`` (SURVEY.md §3.5).

Sections, mirroring the reference script top-to-bottom:

1. Environment report (versions, device, memory) — reference ``:17-31``.
2. Trivial Pallas add-kernel smoke test with first-call compile time vs
   steady-state time — reference's Triton add kernel, ``:37-77``.
3. 1024^2 dequant: Pallas vs the jnp/XLA reference backend, timing +
   bit-exact correctness — reference's Unsloth-vs-package check, ``:83-135``.
4. Backend fallback test (NF4TPU_BACKEND=jnp) — the reference tried to
   import a *nonexistent* fallback symbol here (``:146``, a latent crash);
   ours exercises the real one.
5. Triage summary — reference ``:177-199``.

Exit code 0 if all checks pass.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

PASS, FAIL, WARN = "[ok]", "[FAIL]", "[warn]"
failures = []


def section(title):
    print(f"\n=== {title} ===")


def check(ok: bool, msg: str, warn_only: bool = False):
    tag = PASS if ok else (WARN if warn_only else FAIL)
    print(f"  {tag} {msg}")
    if not ok and not warn_only:
        failures.append(msg)


def env_report():
    section("Environment")
    import jax
    import jaxlib

    print(f"  python:  {sys.version.split()[0]}")
    print(f"  jax:     {jax.__version__}")
    print(f"  jaxlib:  {jaxlib.__version__}")
    print(f"  backend: {jax.default_backend()}")
    for d in jax.devices():
        print(f"  device:  {d.device_kind} (id={d.id}, process={d.process_index})")
        try:
            stats = d.memory_stats()
            if stats:
                lim = stats.get("bytes_limit", 0)
                used = stats.get("bytes_in_use", 0)
                print(f"           memory {used / 2**30:.2f} / {lim / 2**30:.2f} GiB in use")
        except Exception:
            pass
    for var in ("NF4TPU_BACKEND", "NF4TPU_INTERPRET", "NF4TPU_LUT", "NF4TPU_MATMUL_TILE"):
        print(f"  {var} = {os.environ.get(var, '<unset>')}")
    check(True, "environment readable")


def pallas_smoke():
    """Trivial Pallas kernel; measures JIT compile vs steady-state (the
    reference's simple_add Triton smoke test, run_diagnostics.py:37-77)."""
    section("Pallas smoke test (add kernel)")
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def add_kernel(x_ref, y_ref, o_ref):
        o_ref[:] = x_ref[:] + y_ref[:]

    interpret = jax.default_backend() != "tpu"
    x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    y = jnp.ones_like(x)

    def run():
        return pl.pallas_call(
            add_kernel, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype), interpret=interpret
        )(x, y)

    t0 = time.perf_counter()
    out = jax.block_until_ready(run())
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(10):
        out = run()
    jax.block_until_ready(out)
    steady_s = (time.perf_counter() - t0) / 10

    ok = bool(np.array_equal(np.asarray(out), np.asarray(x) + 1))
    check(ok, f"add kernel correct (interpret={interpret})")
    print(f"  first call (incl. compile): {compile_s * 1e3:.1f} ms")
    print(f"  steady state:               {steady_s * 1e3:.3f} ms")
    # The reference flags >1000ms Triton compiles as T4-pathological
    # (run_diagnostics.py:71-74); Mosaic compiles are also reported.
    check(compile_s < 60, f"compile time sane ({compile_s:.1f}s)", warn_only=True)


def dequant_check():
    section("Dequant: Pallas vs XLA reference (1024x1024)")
    import jax
    import jax.numpy as jnp

    from nf4_tpu import dequantize, pack_for_tpu
    from nf4_tpu.nf4.reference import dequantize_nf4, quantize_nf4
    from nf4_tpu.utils.timing import measure_chained_s

    import ml_dtypes

    rng = np.random.default_rng(0)
    w = (rng.standard_normal((1024, 1024)) * 0.02).astype(np.float32)
    state = quantize_nf4(w)
    pw = pack_for_tpu(state, dtype=jnp.bfloat16)
    oracle = np.asarray(dequantize_nf4(state, dtype=ml_dtypes.bfloat16)).astype(np.float32)

    results = {}
    prev = os.environ.get("NF4TPU_BACKEND", "auto")
    for backend in ("jnp", "pallas" if jax.default_backend() == "tpu" else "jnp"):
        os.environ["NF4TPU_BACKEND"] = backend

        got = np.asarray(dequantize(pw)).astype(np.float32)
        exact = bool(np.array_equal(got, oracle))
        check(exact, f"{backend}: bit-exact vs oracle")

        @jax.jit
        def step(c, pw=pw):
            out = dequantize(pw)
            return c + out[0, 0].astype(jnp.float32) * jnp.float32(1e-30)

        stats = measure_chained_s(step, jnp.zeros((), jnp.float32), n1=5, n2=25, repeats=3)
        results[backend] = stats.median
        print(f"  {backend}: {stats}")
    os.environ["NF4TPU_BACKEND"] = prev

    if len(results) == 2 and "pallas" in results:
        ratio = results["jnp"] / max(results["pallas"], 1e-12)
        # The reference triages "package >10x slower than Unsloth"
        # (run_diagnostics.py:137-146).
        check(ratio > 0.1, f"pallas within 10x of XLA reference ({ratio:.2f}x speedup)")

    # FP4 codebook (bnb's Linear4bit default): the same kernels with the
    # e2m1 table — bit-exact vs the fp4 oracle through the active backend.
    state4 = quantize_nf4(w, quant_type="fp4")
    pw4 = pack_for_tpu(state4, dtype=jnp.bfloat16)
    oracle4 = np.asarray(
        dequantize_nf4(state4, dtype=ml_dtypes.bfloat16)
    ).astype(np.float32)
    got4 = np.asarray(dequantize(pw4)).astype(np.float32)
    check(bool(np.array_equal(got4, oracle4)), "fp4: bit-exact vs fp4 oracle")

    # bf16 byte-table fast path: same decode as the fused matmul kernel;
    # contract is <= 1.1e-2 relative of the oracle (double bf16 rounding).
    from nf4_tpu import dequantize_fast

    got = np.asarray(dequantize_fast(pw)).astype(np.float32)
    rel = np.abs(got - oracle) / (np.abs(oracle) + 1e-12)
    rel[oracle == 0] = np.abs(got[oracle == 0])
    check(
        bool(rel.max() <= 1.1e-2),
        f"fast byte-table path within 1.1e-2 of oracle (max {rel.max():.2e})",
    )


def fallback_check():
    section("Backend fallback (NF4TPU_BACKEND=jnp)")
    import jax.numpy as jnp

    from nf4_tpu import dequantize, quantize_for_tpu
    from nf4_tpu.utils import env

    prev = os.environ.get("NF4TPU_BACKEND", "auto")
    os.environ["NF4TPU_BACKEND"] = "jnp"
    try:
        check(env.backend() == "jnp", "env.backend() honors NF4TPU_BACKEND")
        pw = quantize_for_tpu(np.eye(128, 128, dtype=np.float32), dtype=jnp.bfloat16)
        out = np.asarray(dequantize(pw), dtype=np.float32)
        check(
            bool(np.allclose(out, np.eye(128), atol=1e-6)),
            "jnp fallback dequantizes identity correctly",
        )
    finally:
        os.environ["NF4TPU_BACKEND"] = prev
    try:
        os.environ["NF4TPU_BACKEND"] = "bogus"
        env.backend()
        check(False, "invalid NF4TPU_BACKEND rejected")
    except ValueError:
        check(True, "invalid NF4TPU_BACKEND rejected")
    finally:
        os.environ["NF4TPU_BACKEND"] = prev


def triage():
    section("Triage summary")
    if not failures:
        print("  all checks passed — the package is healthy on this host.")
        return
    print(f"  {len(failures)} failure(s):")
    for f in failures:
        print(f"   - {f}")
    print(
        "  advice:\n"
        "   * not on TPU? set NF4TPU_BACKEND=jnp (pure-XLA path) or\n"
        "     NF4TPU_INTERPRET=1 (Pallas interpreter) — both are exact.\n"
        "   * kernel miscompiles after a jax upgrade: NF4TPU_LUT=tree picks\n"
        "     the portable select-tree over the hardware gather.\n"
        "   * report with the full output of this script."
    )


def main():
    env_report()
    pallas_smoke()
    dequant_check()
    fallback_check()
    triage()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
