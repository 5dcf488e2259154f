"""HTTP serving load benchmark: Poisson arrivals against the OpenAI endpoint.

The reference package has no serving loop at all (SURVEY.md §2.2 — its only
concurrency is three CUDA streams inside its own benchmark); this harness
measures what a production deployment of THIS framework actually delivers:
sustained request throughput and client-observed latency through the full
stack — HTTP parsing, wave dispatch, cross-request continuous batching
(``admit``), SSE streaming — not just the jitted decode loop.

Protocol: ``--requests`` completions arrive with exponential inter-arrival
gaps at ``--rate`` req/s (seeded, so runs are comparable), each a
``stream=True`` POST so the client can timestamp its FIRST token (TTFT)
separately from completion.  Reported per run:

* achieved request rate and generated tokens/s (wall-clock, all clients)
* TTFT p50 / p95 / max — queue wait + prefill + first decode chunk
* end-to-end latency p50 / p95 / max
* server counters (waves, mid-wave admissions) — how much work continuous
  batching did vs wave-boundary dispatch

Usage (real chip):
    python benchmarks/benchmark_http.py --model tinyllama-1.1b --synthetic \
        --rate 4 --requests 32 --max-tokens 64 [--int8 --kv8 --spec-k 7]

The in-process variant (``run_load(engine, ...)``) is smoke-tested on CPU
in tests/test_tooling.py.
"""

from __future__ import annotations

import argparse
import dataclasses
import http.client
import json
import os
import random
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _percentile(xs, q):
    if not xs:
        return float("nan")
    s = sorted(xs)
    i = min(len(s) - 1, max(0, int(round(q / 100 * (len(s) - 1)))))
    return s[i]


def _one_request(host, port, body, rec):
    """POST a streaming completion; record TTFT and completion time."""
    t0 = time.perf_counter()
    conn = http.client.HTTPConnection(host, port, timeout=600)
    try:
        conn.request(
            "POST",
            "/v1/completions",
            body=json.dumps(body),
            headers={"Content-Type": "application/json"},
        )
        resp = conn.getresponse()
        ttft = None
        ntok = 0
        buf = b""
        while True:
            chunk = resp.read1(4096) if hasattr(resp, "read1") else resp.read(4096)
            if not chunk:
                break
            buf += chunk
            while b"\n\n" in buf:
                line, buf = buf.split(b"\n\n", 1)
                if not line.startswith(b"data: "):
                    continue
                payload = line[6:]
                if payload == b"[DONE]":
                    continue
                try:
                    obj = json.loads(payload)
                except json.JSONDecodeError:
                    continue
                if "error" in obj:
                    rec["error"] = obj["error"]
                    continue
                if ttft is None:
                    ttft = time.perf_counter() - t0
                ntok += 1
        rec["ttft"] = ttft
        rec["e2e"] = time.perf_counter() - t0
        # The [DONE] line and any error line are not tokens.
        rec["ntok"] = max(0, ntok)
    except Exception as e:  # noqa: BLE001 — record, don't kill the run
        rec["error"] = f"{type(e).__name__}: {e}"
    finally:
        conn.close()


def run_load(
    server_port,
    *,
    rate: float,
    n_requests: int,
    prompt_len: int = 16,
    max_tokens: int = 64,
    vocab: int = 256,
    temperature: float = 0.0,
    seed: int = 0,
    host: str = "127.0.0.1",
    shared_prefix=(),
):
    """Drive a running CompletionServer with Poisson arrivals; returns the
    stats dict (also used by the CLI below and the smoke test)."""
    rng = random.Random(seed)
    gaps = [rng.expovariate(rate) for _ in range(n_requests)]
    prompts = [
        list(shared_prefix)
        + [rng.randrange(1, vocab) for _ in range(prompt_len)]
        for _ in range(n_requests)
    ]
    records = [dict() for _ in range(n_requests)]
    threads = []
    t_start = time.perf_counter()
    for i in range(n_requests):
        time.sleep(gaps[i])
        body = {
            "prompt": prompts[i],
            "max_tokens": max_tokens,
            "stream": True,
        }
        if temperature:
            body["temperature"] = temperature
        th = threading.Thread(
            target=_one_request, args=(host, server_port, body, records[i])
        )
        th.start()
        threads.append(th)
    for th in threads:
        th.join()
    wall = time.perf_counter() - t_start

    errs = [r["error"] for r in records if "error" in r]
    ok = [r for r in records if "error" not in r]
    ttfts = [r["ttft"] for r in ok if r["ttft"] is not None]
    e2es = [r["e2e"] for r in ok]
    toks = sum(r["ntok"] for r in ok)
    return {
        "wall_s": wall,
        "completed": len(ok),
        "errors": errs,
        "req_per_s": len(ok) / wall if wall else 0.0,
        "tok_per_s": toks / wall if wall else 0.0,
        "tokens": toks,
        "ttft_p50_s": _percentile(ttfts, 50),
        "ttft_p95_s": _percentile(ttfts, 95),
        "ttft_max_s": max(ttfts) if ttfts else float("nan"),
        "e2e_p50_s": _percentile(e2es, 50),
        "e2e_p95_s": _percentile(e2es, 95),
        "e2e_max_s": max(e2es) if e2es else float("nan"),
    }


def main(argv=None):
    from nf4_tpu.models import configs
    from nf4_tpu.models.llama import init_params
    from nf4_tpu.serve.api import CompletionServer
    from nf4_tpu.serve.engine import Engine

    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="tinyllama-1.1b")
    ap.add_argument("--synthetic", action="store_true",
                    help="structurally-exact random weights (no checkpoint)")
    ap.add_argument("--batch-size", type=int, default=8,
                    help="engine decode slots")
    ap.add_argument("--max-seq-len", type=int, default=1024)
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--kv8", action="store_true")
    ap.add_argument("--spec-k", type=int, default=0)
    ap.add_argument("--rate", type=float, default=4.0, help="arrivals/s")
    ap.add_argument("--requests", type=int, default=32)
    ap.add_argument("--prompt-len", type=int, default=16)
    ap.add_argument("--shared-prefix-len", type=int, default=0,
                    help="tokens of a COMMON prefix prepended to every "
                    "prompt (few-shot / system-prompt workload); pair "
                    "with --prefix-cache to measure shared-prefix reuse")
    ap.add_argument("--batch-window", type=float, default=0.05,
                    help="dispatcher dynamic-batching grace (s): wait this "
                    "long after a fresh wave's first request for more to "
                    "arrive (bigger window -> fuller initial waves and "
                    "prefix-cache engagement; costs that much TTFT when "
                    "traffic is sparse)")
    ap.add_argument("--prefix-cache", action="store_true",
                    help="Engine(prefix_cache=True): prefill the shared "
                    "prefix once per wave and broadcast its KV")
    ap.add_argument("--max-tokens", type=int, default=64)
    ap.add_argument("--temperature", type=float, default=0.0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    cfg = configs.get_config(args.model)
    cfg = dataclasses.replace(cfg, max_seq_len=args.max_seq_len)
    if args.kv8:
        cfg = dataclasses.replace(cfg, kv_quant=True)
    from benchmark_serving import synthetic_params  # same dir

    t0 = time.perf_counter()
    params = (
        synthetic_params(cfg) if args.synthetic else init_params(cfg, seed=0)
    )
    print(f"params: {time.perf_counter() - t0:.1f}s")
    if args.int8:
        import jax

        from nf4_tpu.models.llama import recode_params_int8

        params = jax.block_until_ready(recode_params_int8(params))
        print("weights: int8-recode")

    engine = Engine(
        params, cfg, batch_size=args.batch_size, eos_token=-1,
        spec_k=args.spec_k, prefix_cache=args.prefix_cache,
    )
    shared_prefix = tuple(
        random.Random(7).randrange(1, cfg.vocab_size)
        for _ in range(args.shared_prefix_len)
    )
    server = CompletionServer(engine, batch_window=args.batch_window)
    port = server.start(port=0)
    try:
        # Warm the compile caches so measured TTFT is serving latency,
        # not XLA compilation.  The bursts replay the measured run's
        # program shapes exactly — full-wave burst at the REAL token
        # budget (budget changes the chunk/tail mix), then 2- and
        # 1-request bursts for the smaller refill prefill groups that
        # mid-wave admissions compile ({4, 2, 1}); a cold program would
        # otherwise stall the whole queue mid-measurement (measured:
        # 21.8 -> 557 tok/s on an 8-burst once every shape is warm).
        for nburst in (args.batch_size, 2, 1):
            warm = run_load(
                port, rate=1000.0, n_requests=nburst,
                prompt_len=args.prompt_len, max_tokens=args.max_tokens,
                vocab=cfg.vocab_size, temperature=args.temperature, seed=99,
                shared_prefix=shared_prefix,
            )
            assert not warm["errors"], warm["errors"]
        for key in ("waves", "admitted"):
            server.stats[key] = 0
        stats = run_load(
            port, rate=args.rate, n_requests=args.requests,
            prompt_len=args.prompt_len, max_tokens=args.max_tokens,
            vocab=cfg.vocab_size, temperature=args.temperature,
            seed=args.seed, shared_prefix=shared_prefix,
        )
    finally:
        server.stop()

    if stats["errors"]:
        print(f"ERRORS ({len(stats['errors'])}): {stats['errors'][:3]}")
    print(
        f"\n--- HTTP load: {args.requests} reqs @ {args.rate}/s "
        f"(prompt {args.prompt_len}, gen {args.max_tokens}, "
        f"slots {args.batch_size}, spec_k {args.spec_k}) ---"
    )
    print(
        f"completed {stats['completed']}/{args.requests} in "
        f"{stats['wall_s']:.1f}s -> {stats['req_per_s']:.2f} req/s, "
        f"{stats['tok_per_s']:.1f} tok/s"
    )
    print(
        f"TTFT  p50 {stats['ttft_p50_s'] * 1e3:7.0f} ms   "
        f"p95 {stats['ttft_p95_s'] * 1e3:7.0f} ms   "
        f"max {stats['ttft_max_s'] * 1e3:7.0f} ms"
    )
    print(
        f"E2E   p50 {stats['e2e_p50_s'] * 1e3:7.0f} ms   "
        f"p95 {stats['e2e_p95_s'] * 1e3:7.0f} ms   "
        f"max {stats['e2e_max_s'] * 1e3:7.0f} ms"
    )
    print(
        f"server: {server.stats['waves']} waves, "
        f"{server.stats['admitted']} mid-wave admissions, "
        f"{server.stats['tokens_out']} tokens out"
    )
    if args.prefix_cache:
        print(
            f"prefix cache: len {engine.prefix_stats['prefix_len']}, "
            f"{engine.prefix_stats['tokens_saved']} prefill tokens saved"
        )
    return 0 if not stats["errors"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
