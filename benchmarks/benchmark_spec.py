"""Speculative-decoding benchmark: verify-step cost and engine speedup.

Decode on this engine is weight-stream-bound (PERF_NOTES: the int8 path
runs AT the HBM roofline), so the only remaining decode lever is tokens
per weight pass.  ``Engine(spec_k=K)`` verifies K prompt-lookup drafts in
one forward (serve/speculative.py); this harness measures what that
costs and what it buys on the real chip:

1. t_verify(K) vs t_decode for the full model — chained-marginal timing
   (the axon runtime's ``block_until_ready`` lies; see utils/timing.py).
   While weight-bound, t_verify(K) ~ t_decode, and the implied speedup at
   mean acceptance ``a`` is (1 + a) * t_decode / t_verify(K).
2. Engine end-to-end tok/s, plain vs spec_k, on a self-repetitive greedy
   workload (randomly initialized LMs collapse into repeating cycles under
   greedy decode, which prompt lookup drafts perfectly — so this is the
   BEST-CASE acceptance regime; ``spec_stats`` is printed for honesty).

The reference package has no serving loop at all (its concurrency is the
3-stream trick in ``/root/reference/benchmark.py:68-84``); this subsystem
targets the BASELINE tokens/s/chip serving rows instead.

Usage:
  python benchmarks/benchmark_spec.py --model llama3-8b --synthetic \
      --int8 --kv8 --batch-sizes 1,8 --ks 3,7
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from benchmark_serving import model_weight_bytes, synthetic_params
from nf4_tpu.models import configs
from nf4_tpu.models.llama import forward, init_kv_cache, init_params
from nf4_tpu.serve.speculative import spec_verify
from nf4_tpu.utils.timing import Stats


def measure_verify_chain(params, cfg, batch: int, k: int, n1=20, n2=60, repeats=3):
    """Chained spec-verify steps: cur_token_{t+1} = targets_t[:, 0], the
    real autoregressive dependency, advancing the cache one position per
    step (acceptance does not change the verify cost — every step reads
    the full weight stream for k+1 positions)."""
    cache0 = init_kv_cache(cfg, batch)

    def fwd(p, tokens, cache, positions, seq_lens):
        return forward(p, cfg, tokens, cache, positions, seq_lens)

    @jax.jit
    def step(p, token, pos, cache):
        drafts = jnp.broadcast_to(token[:, None], (batch, k))
        targets, _acc, _lps, cache = spec_verify(
            p, token, drafts, cache, pos, fwd=fwd, k=k
        )
        return targets[:, 0], pos + 1, cache

    tok0 = jnp.zeros((batch,), jnp.int32)
    pos0 = jnp.zeros((batch,), jnp.int32)

    def run(n):
        tok, pos, cache = tok0, pos0, cache0
        t0 = time.perf_counter()
        for _ in range(n):
            tok, pos, cache = step(params, tok, pos, cache)
        np.asarray(jax.device_get(tok[0]))
        return time.perf_counter() - t0

    run(3)
    vals = [(run(n2) - run(n1)) / (n2 - n1) for _ in range(repeats)]
    return Stats(vals)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="tinyllama-1.1b")
    ap.add_argument("--batch-sizes", default="1,8")
    ap.add_argument("--ks", default="3,7", help="spec_k values to measure")
    ap.add_argument("--max-seq-len", type=int, default=1024)
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--kv8", action="store_true")
    ap.add_argument("--synthetic", action="store_true",
                    help="random packed codes built on device (seconds; "
                    "identical compute/memory behavior)")
    ap.add_argument("--engine", action="store_true",
                    help="also measure engine end-to-end plain vs spec on "
                    "the best-case (self-repetitive) greedy workload")
    ap.add_argument("--temperature", type=float, default=0.0,
                    help="engine-arm sampling temperature (>0 exercises "
                    "the device-chained stochastic rejection-sampling "
                    "chunks; acceptance drops with entropy)")
    ap.add_argument("--no-adaptive", action="store_true",
                    help="disable the adaptive controller on the spec arms "
                    "(spec_min_accept=0): the always-on comparison arm for "
                    "adversarial workloads")
    ap.add_argument("--draft", default=None,
                    help="registry config name of a DRAFT model for the "
                    "engine arm (synthetic weights, vocab matched to the "
                    "target, int8-recoded when --int8): draft-model "
                    "speculation instead of prompt lookup")
    ap.add_argument("--max-new-tokens", type=int, default=96,
                    help="engine-arm tokens per request (long runs, e.g. "
                    "512, expose the adaptive controller's backoff on "
                    "adversarial workloads)")
    args = ap.parse_args()

    cfg = configs.get_config(args.model)
    if args.max_seq_len:
        cfg = dataclasses.replace(cfg, max_seq_len=args.max_seq_len)
    if args.kv8:
        cfg = dataclasses.replace(cfg, kv_quant=True)
    print(f"device: {jax.devices()[0].device_kind} ({jax.default_backend()})")
    print(f"model: {args.model} ({cfg.num_layers} layers, hidden {cfg.hidden_size})")

    t0 = time.perf_counter()
    params = synthetic_params(cfg) if args.synthetic else init_params(cfg, seed=0)
    print(f"params: {time.perf_counter() - t0:.1f}s")
    wbytes = model_weight_bytes(cfg)
    if args.int8:
        from nf4_tpu.models.llama import recode_params_int8

        params = jax.block_until_ready(recode_params_int8(params))
        wbytes *= 2
        print("weights: int8-recode (2x stream bytes)")

    draft = None
    if args.draft:
        dcfg = dataclasses.replace(
            configs.get_config(args.draft),
            max_seq_len=cfg.max_seq_len,
            vocab_size=cfg.vocab_size,
        )
        t0 = time.perf_counter()
        dparams = (
            synthetic_params(dcfg) if args.synthetic
            else init_params(dcfg, seed=1)
        )
        if args.int8:
            from nf4_tpu.models.llama import recode_params_int8

            dparams = jax.block_until_ready(recode_params_int8(dparams))
        draft = (dparams, dcfg)
        print(f"draft: {args.draft} ({time.perf_counter() - t0:.1f}s)")

    batches = [int(s) for s in args.batch_sizes.split(",")]
    ks = [int(s) for s in args.ks.split(",")]

    print(f"\n--- verify cost (weight stream ~{wbytes / 2**20:.0f} MiB/step) ---")
    for b in batches:
        base = measure_verify_chain(params, cfg, b, k=0)
        line = [f"batch {b:3d}: decode {base.median * 1e3:7.3f} ms"]
        for k in ks:
            st = measure_verify_chain(params, cfg, b, k=k)
            ratio = st.median / base.median
            line.append(
                f"verify(k={k}) {st.median * 1e3:7.3f} ms ({ratio:.2f}x"
                f" -> breakeven acc {max(ratio - 1, 0.0):.2f})"
            )
        print("  " + " | ".join(line))
        for k in ks:
            st = measure_verify_chain(params, cfg, b, k=k)
            full = b * (k + 1) / st.median
            print(
                f"    k={k}: {full:8.1f} tok/s at FULL acceptance "
                f"(plain decode: {b / base.median:.1f} tok/s)"
            )

    if args.engine:
        from nf4_tpu.serve.engine import Engine

        from nf4_tpu.serve.sampling import SamplingParams

        sp = SamplingParams(temperature=args.temperature)
        mode = (
            "greedy" if args.temperature == 0.0
            else f"temperature={args.temperature}"
        )
        print(
            "\n--- engine end-to-end (best-case repetitive workload, "
            f"{mode}) ---"
        )
        for b in batches:
            prompts = [[1 + i, 2 + i, 3 + i] * 4 for i in range(b)]
            rows = []
            for k in [0] + ks:
                eng = Engine(params, cfg, batch_size=b, eos_token=-1,
                             spec_k=k, draft=draft if k else None)
                if args.no_adaptive:
                    eng.spec_min_accept = 0.0
                new = args.max_new_tokens
                eng.generate(prompts, max_new_tokens=new, sampling=sp)  # warm
                eng.spec_stats.update(steps=0, emitted=0, pauses=0)
                eng._spec_pause = 0  # measured run starts un-paused
                eng._spec_backoff = 0
                t0 = time.perf_counter()
                res = eng.generate(prompts, max_new_tokens=new, sampling=sp)
                dt = time.perf_counter() - t0
                ntok = sum(len(r.tokens) for r in res)
                s = eng.spec_stats
                # steps counts VERIFY STEPS (not slot-steps); emitted sums
                # over all B slots — normalize per slot for the mean.
                mean_acc = (
                    s["emitted"] / (s["steps"] * b) - 1 if s["steps"] else 0.0
                )
                rows.append((k, ntok / dt, mean_acc))
            base_tps = rows[0][1]
            for k, tps, acc in rows:
                tag = "plain" if k == 0 else f"spec_k={k} (mean acc {acc:.2f})"
                # Note: with adaptive speculation (engine default), a
                # low-acceptance run spends most rounds on plain chunks —
                # mean acc then reflects only the probe steps.
                print(
                    f"  batch {b:3d} {tag:28s}: {tps:8.1f} tok/s "
                    f"({tps / base_tps:.2f}x)"
                )


if __name__ == "__main__":
    main()
