"""QLoRA fine-tuning throughput: tokens/s/chip and estimated TFLOPs.

The reference package's ecosystem role is accelerating 4-bit LoRA
training (reference ``README.md:3`` — it feeds Unsloth's fine-tuning
loop), but it ships no trainer and publishes no training numbers.  This
harness measures the production train step (``nf4_tpu.train``) end to
end: frozen packed NF4 base, bf16 activations, rank-r adapters, optional
per-layer remat and gradient accumulation.

Timing uses the step's own carry chain (adapters + optimizer state feed
the next step), so no artificial data dependency is needed; the marginal
per-step time comes from two chain lengths, robust on runtimes where
``block_until_ready`` returns early (utils/timing.py methodology).

FLOPs model (reported as an estimate, matmul terms only): with B*S
tokens and P base matmul parameters per token-pass, one step costs
  forward        2*P*T
  backward dx    2*P*T      (base is frozen: no dW)
  remat re-fwd   2*P*T      (only with --remat)
plus adapter terms (~r/d of the base, negligible at r<=64).  Attention
score/value FLOPs are included via the standard 12*L*H*S^2*D/2 causal
term.  MFU is this estimate over the v5e bf16 peak (197 TFLOPs).

Usage: python benchmarks/benchmark_training.py [--model tinyllama-1.1b]
         [--batch 8] [--seq-len 1024] [--rank 16] [--accum 1] [--remat]
         [--small]  # tiny config, CPU-runnable smoke
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
import optax

from nf4_tpu.models import configs
from nf4_tpu.models.llama import init_params
from nf4_tpu.train import LoraConfig, init_lora, make_train_step

V5E_BF16_PEAK_TFLOPS = 197.0


def step_flops(cfg, batch: int, seq_len: int, remat: bool) -> float:
    """Matmul-only FLOPs for one optimizer step (estimate; see module doc)."""
    # Base linear params touched per token-pass.
    per_layer = (
        cfg.hidden_size * cfg.q_dim  # wqkv q part
        + 2 * cfg.hidden_size * cfg.num_kv_heads * cfg.head_dim  # k, v
        + cfg.q_dim * cfg.hidden_size  # wo
        + 3 * cfg.hidden_size * cfg.intermediate_size  # gate, up, down
    )
    # Embedding lookup is a gather (no matmul FLOPs, and frozen);
    # only the lm_head projection is a vocab-sized matmul.
    p = cfg.num_layers * per_layer + cfg.hidden_size * cfg.vocab_size
    tokens = batch * seq_len
    passes = 3.0 if remat else 2.0  # fwd + bwd-dx (+ remat re-fwd)
    linear = 2.0 * p * tokens * passes
    # Causal attention: QK^T + AV, fwd ~4*S^2/2 per head-dim-row; bwd ~2x.
    attn_fwd = 2.0 * 2.0 * cfg.num_layers * cfg.num_heads * (
        batch * seq_len * seq_len * cfg.head_dim
    ) / 2.0
    attn = attn_fwd * (passes)
    return linear + attn


def measure_train_chain(step, params, lora0, opt_state0, tokens, n1=3, n2=9, repeats=3):
    """Marginal per-step seconds over the (lora, opt_state) carry chain."""

    def run(n):
        lora, ost = lora0, opt_state0
        t0 = time.perf_counter()
        loss = None
        for _ in range(n):
            lora, ost, loss = step(params, lora, ost, tokens)
        float(jax.device_get(loss))  # one scalar readback closes the chain
        return time.perf_counter() - t0

    run(1)  # compile
    best = min((run(n2) - run(n1)) / (n2 - n1) for _ in range(repeats))
    return best


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="tinyllama-1.1b")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seq-len", type=int, default=1024)
    ap.add_argument("--rank", type=int, default=16)
    ap.add_argument("--accum", type=int, default=1)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--steps", type=int, default=9, help="long-chain length")
    ap.add_argument("--small", action="store_true", help="tiny CPU smoke")
    ap.add_argument("--json", action="store_true", help="one JSON line only")
    args = ap.parse_args(argv)

    if args.small:
        cfg = configs.TINY_TEST
        args.batch, args.seq_len, args.rank = 2, 32, 4
        n1, n2 = 2, 4
    else:
        cfg = configs.get_config(args.model)
        n1, n2 = max(2, args.steps // 3), args.steps
    import dataclasses

    cfg = dataclasses.replace(
        cfg, max_seq_len=max(cfg.max_seq_len, args.seq_len)
    )

    print(f"model={args.model if not args.small else 'tiny-test'} "
          f"batch={args.batch} seq={args.seq_len} rank={args.rank} "
          f"accum={args.accum} remat={args.remat} "
          f"backend={jax.default_backend()}", file=sys.stderr)

    params = init_params(cfg, seed=0)
    lora = init_lora(cfg, LoraConfig(rank=args.rank), seed=0)
    opt = optax.adamw(1e-4)
    step = make_train_step(cfg, opt, remat=args.remat, accum_steps=args.accum)
    rng = np.random.default_rng(0)
    toks = jnp.asarray(
        rng.integers(0, cfg.vocab_size, (args.batch, args.seq_len)), jnp.int32
    )

    sec = measure_train_chain(
        step, params, lora, opt.init(lora), toks, n1=n1, n2=n2
    )
    tokens_per_s = args.batch * args.seq_len / sec
    fl = step_flops(cfg, args.batch, args.seq_len, args.remat)
    tflops = fl / sec / 1e12
    mfu = tflops / V5E_BF16_PEAK_TFLOPS

    line = {
        "metric": "qlora_train_tokens_per_s",
        "value": round(tokens_per_s, 1),
        "unit": "tokens/s/chip",
        "step_s": round(sec, 4),
        "est_tflops": round(tflops, 1),
        "est_mfu_vs_v5e_bf16": round(mfu, 3),
    }
    print(json.dumps(line))
    return line


if __name__ == "__main__":
    main()
