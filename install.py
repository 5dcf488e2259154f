"""Guided installer — TPU equivalent of the reference's
``install_optimized.py`` (SURVEY.md §2 component #10).

The reference detects the GPU generation to recommend a backend (T4/older ->
"pytorch backend", newer -> "triton"; reference ``install_optimized.py:25-47``),
runs ``pip install -e .``, and finishes with an import + 32x32 smoke test
(``:99-114``).  The TPU analog detects the accelerator platform to recommend
``NF4TPU_BACKEND``, installs, and smoke-tests a small quantize/dequantize
round trip through the public API.

Usage: python install.py [--skip-install]
"""

from __future__ import annotations

import argparse
import subprocess
import sys


def detect_platform() -> str:
    """Inspect the accelerator and recommend a backend setting."""
    print("=== Platform detection ===")
    try:
        import jax

        backend = jax.default_backend()
        kind = jax.devices()[0].device_kind
        print(f"  jax backend: {backend}")
        print(f"  device:      {kind} x{jax.device_count()}")
        if backend == "tpu":
            print("  -> TPU detected: Pallas kernels will be used (NF4TPU_BACKEND=auto).")
            return "pallas"
        print(
            "  -> no TPU: the pure-XLA reference path will be used\n"
            "     (NF4TPU_BACKEND=auto resolves to 'jnp' here; set\n"
            "     NF4TPU_INTERPRET=1 to exercise the Pallas kernels in\n"
            "     interpreter mode for debugging)."
        )
        return "jnp"
    except Exception as e:  # pragma: no cover - jax import problems
        print(f"  jax unavailable ({e}); install jax first.")
        return "none"


def run_install() -> bool:
    print("\n=== Installing (pip install -e .) ===")
    proc = subprocess.run(
        # --no-build-isolation: use the host's setuptools instead of
        # fetching build deps from PyPI — TPU pods are often air-gapped.
        [
            sys.executable, "-m", "pip", "install", "-e", ".",
            "--no-deps", "--no-build-isolation",
        ],
        capture_output=True,
        text=True,
    )
    tail = (proc.stdout + proc.stderr).strip().splitlines()[-3:]
    for line in tail:
        print(f"  {line}")
    return proc.returncode == 0


def smoke_test() -> bool:
    """Import + tiny end-to-end round trip (reference install_optimized.py's
    32x32 check, ``:104-114``; NF4 blocks are 64 wide so we use 64x64)."""
    print("\n=== Smoke test ===")
    try:
        import numpy as np

        import jax.numpy as jnp

        import nf4_tpu

        import ml_dtypes

        w = np.linspace(-1, 1, 64 * 64, dtype=np.float32).reshape(64, 64)
        pw = nf4_tpu.quantize_for_tpu(w, dtype=jnp.bfloat16)
        out = np.asarray(nf4_tpu.dequantize(pw), dtype=np.float32)
        from nf4_tpu.nf4.reference import dequantize_nf4, quantize_nf4

        want = np.asarray(
            dequantize_nf4(quantize_nf4(w), dtype=ml_dtypes.bfloat16)
        ).astype(np.float32)
        assert out.shape == (64, 64)
        assert np.array_equal(out, want), "dequant not bit-exact vs oracle"
        err = float(np.abs(out - w).max())
        print(f"  import ok, 64x64 round trip ok (max quantization err {err:.4f})")
        return True
    except Exception as e:
        print(f"  FAILED: {e}")
        return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-install", action="store_true")
    args = ap.parse_args()

    detect_platform()
    if not args.skip_install:
        if not run_install():
            print("install failed")
            return 1
    if not smoke_test():
        return 1
    print("\nnf4-tpu is ready.  Next steps:")
    print("  python run_diagnostics.py            # environment health check")
    print("  python benchmarks/benchmark_mlp.py   # protocol-A benchmark")
    print("  python benchmarks/benchmark_layers.py# protocol-B benchmark")
    return 0


if __name__ == "__main__":
    sys.exit(main())
