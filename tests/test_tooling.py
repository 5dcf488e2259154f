"""Smoke tests for the tooling layer (benchmarks, diagnostics, installer).

The reference's tooling *is* its test suite (SURVEY.md §4); here the tooling
itself is under test.  Everything runs in-process on the CPU platform set up
by conftest.py, with tiny shapes/iteration counts.
"""

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "benchmarks"))


@pytest.fixture(autouse=True)
def _restore_backend_env():
    prev = os.environ.get("NF4TPU_BACKEND")
    yield
    if prev is None:
        os.environ.pop("NF4TPU_BACKEND", None)
    else:
        os.environ["NF4TPU_BACKEND"] = prev


def test_benchmark_mlp_small(monkeypatch, capsys):
    import benchmark_mlp

    monkeypatch.setattr(
        sys, "argv", ["benchmark_mlp.py", "--small", "--no-plot", "--iterations", "6"]
    )
    rc = benchmark_mlp.main()
    out = capsys.readouterr().out
    assert "BIT-EXACT ok" in out
    # All four comparison arms must report (reference benchmark.py:149-162
    # compares three implementations; we add the int8 serving arm).
    for arm in ("xla-ref", "fused", "dequant+dense", "int8-recode"):
        assert arm in out, f"missing arm {arm}"
    assert "fused vs xla-ref baseline" in out
    assert rc in (0, 1)  # the 1.15x gate is hardware-dependent; CPU may fail it


def test_benchmark_layers_small(monkeypatch, capsys):
    import benchmark_layers

    monkeypatch.setattr(
        sys, "argv", ["benchmark_layers.py", "--sizes", "256", "--iterations", "6"]
    )
    rc = benchmark_layers.main()
    out = capsys.readouterr().out
    assert "correctness vs oracle: exact=True" in out
    assert "Summary" in out
    assert rc in (0, 1)


def test_benchmark_training_small(capsys):
    import benchmark_training

    line = benchmark_training.main(["--small"])
    out = capsys.readouterr().out
    assert line["metric"] == "qlora_train_tokens_per_s"
    assert line["value"] > 0 and line["step_s"] > 0
    assert '"qlora_train_tokens_per_s"' in out


def test_diagnostics_checks(capsys):
    import run_diagnostics

    # Reset module-level failure accumulator for in-process reuse.
    run_diagnostics.failures.clear()
    run_diagnostics.env_report()
    run_diagnostics.pallas_smoke()
    run_diagnostics.fallback_check()
    out = capsys.readouterr().out
    assert "[FAIL]" not in out
    assert run_diagnostics.failures == []


def test_installer_smoke():
    import install

    assert install.detect_platform() in ("pallas", "jnp")
    assert install.smoke_test()


def test_benchmark_http_load():
    """Poisson-arrival HTTP load harness end-to-end over real sockets:
    every request completes, token counts match the budget, TTFT/E2E
    percentiles are sane and ordered."""
    from benchmark_http import run_load
    from nf4_tpu.models.configs import TINY_TEST
    from nf4_tpu.models.llama import init_params
    from nf4_tpu.serve.api import CompletionServer
    from nf4_tpu.serve.engine import Engine

    engine = Engine(
        init_params(TINY_TEST, seed=0), TINY_TEST, batch_size=2, eos_token=-1
    )
    server = CompletionServer(engine)
    port = server.start(port=0)
    try:
        stats = run_load(
            port, rate=50.0, n_requests=5, prompt_len=4, max_tokens=6,
            vocab=TINY_TEST.vocab_size,
        )
    finally:
        server.stop()
    assert stats["errors"] == []
    assert stats["completed"] == 5
    assert stats["tokens"] == 5 * 6
    assert 0 < stats["ttft_p50_s"] <= stats["e2e_p50_s"]
    assert stats["e2e_p50_s"] <= stats["e2e_max_s"]


def test_measure_chained_s():
    import jax.numpy as jnp

    from nf4_tpu.utils.timing import measure_chained_s

    stats = measure_chained_s(lambda x: x + 1.0, jnp.zeros((4,)), n1=2, n2=6, repeats=2)
    assert stats.median < 1.0  # sanity: adds are not seconds-slow
