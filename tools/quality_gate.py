"""End-to-end quality gate: NF4 perplexity delta on a TRAINED model.

BASELINE.md's quality row demands <= 0.1 perplexity delta for NF4 vs the
dense model.  This rig has no egress and no local checkpoints, so instead
of downloading TinyLlama this tool *trains* a small byte-level LM on the
repository's own source text (deterministic corpus), then evaluates
held-out perplexity with ``nf4_tpu.eval.ppl`` twice — dense weights vs the
same weights NF4-quantized through the production pipeline — and reports
the delta against the gate.

This exercises the entire quality chain with *structured* (trained)
weights — quantizer -> packed format -> fused kernels -> model forward ->
teacher-forced NLL — rather than random weights whose PPL is vacuous.

    python tools/quality_gate.py [--steps 600] [--gate 0.1]

Prints one JSON line: {"ppl_dense": ..., "ppl_nf4": ..., "delta": ...,
"within_gate": ...}.  With a real HF checkpoint directory available, use
``python -m nf4_tpu.eval --hf-dir ... --tokens ...`` instead.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def synthetic_corpus(n_bytes: int, seed: int = 7) -> np.ndarray:
    """Procedurally generated structured text (arithmetic ledger lines).

    Unlimited data -> the model cannot memorize its way to low loss, so the
    held-out NF4 delta measures genuine generalization sensitivity rather
    than perturbation of memorized lookups (the repo corpus is only ~430KB
    and overfits hard)."""
    rng = np.random.default_rng(seed)
    lines = []
    total = 0
    while total < n_bytes:
        a, b = rng.integers(0, 10000, size=2)
        op = rng.choice(["+", "-", "*"])
        r = {"+": a + b, "-": a - b, "*": a * b}[op]
        tag = rng.choice(["acct", "item", "txn", "ref"])
        line = f"{tag}:{a}{op}{b}={r};bal={r % 977}\n"
        lines.append(line)
        total += len(line)
    return np.frombuffer("".join(lines).encode(), dtype=np.uint8)[:n_bytes]


def load_corpus(root: str, max_bytes: int = 2_000_000) -> np.ndarray:
    """Deterministic byte corpus from the repo's tracked text files."""
    chunks = []
    total = 0
    for dirpath, dirnames, filenames in sorted(os.walk(root)):
        dirnames[:] = sorted(
            d for d in dirnames if d not in (".git", "__pycache__", ".claude")
        )
        for fn in sorted(filenames):
            if not fn.endswith((".py", ".md")):
                continue
            with open(os.path.join(dirpath, fn), "rb") as f:
                data = f.read()
            chunks.append(np.frombuffer(data, dtype=np.uint8))
            total += len(data)
            if total >= max_bytes:
                return np.concatenate(chunks)[:max_bytes]
    return np.concatenate(chunks)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--seq-len", type=int, default=256)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--gate", type=float, default=0.1)
    ap.add_argument("--eval-seqs", type=int, default=64)
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument(
        "--corpus", choices=["repo", "synthetic"], default="repo",
        help="repo = this repository's source text (~430KB, overfits); "
        "synthetic = unlimited procedurally generated structured text",
    )
    ap.add_argument("--corpus-bytes", type=int, default=8_000_000)
    args = ap.parse_args()

    import optax

    from nf4_tpu.eval.ppl import perplexity
    from nf4_tpu.models.llama import (
        LlamaConfig,
        forward,
        init_kv_cache,
        init_params,
    )
    from nf4_tpu.nf4.format import quantize_for_tpu

    cfg = LlamaConfig(
        vocab_size=256,
        hidden_size=args.hidden,
        intermediate_size=2 * args.hidden,
        num_layers=args.layers,
        num_heads=args.hidden // 32,
        num_kv_heads=args.hidden // 64,
        head_dim=32,
        max_seq_len=args.seq_len,
        quantize=False,  # train dense; quantize afterwards
        dtype=jnp.float32,
    )
    params = init_params(cfg, seed=0)

    if args.corpus == "synthetic":
        corpus = synthetic_corpus(args.corpus_bytes)
    else:
        corpus = load_corpus(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
    n_eval = args.eval_seqs * args.seq_len
    train_bytes, eval_bytes = corpus[:-n_eval], corpus[-n_eval:]
    print(
        f"corpus: {len(corpus)} bytes ({len(train_bytes)} train / "
        f"{len(eval_bytes)} eval)",
        file=sys.stderr,
    )

    S, B = args.seq_len, args.batch
    n_windows = (len(train_bytes) - 1) // S

    def batch_for(step: int, rng: np.random.Generator):
        idx = rng.integers(0, n_windows, size=B)
        toks = np.stack([train_bytes[i * S : i * S + S] for i in idx])
        return jnp.asarray(toks, jnp.int32)

    @functools.partial(jax.jit, static_argnames=())
    def loss_fn(p, toks):
        b, s = toks.shape
        cache = init_kv_cache(cfg, b)
        positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (b, s))
        seq_lens = jnp.full((b,), s, jnp.int32)
        logits, _ = forward(p, cfg, toks, cache, positions, seq_lens)
        logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
        tgt = toks[:, 1:]
        nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        return nll.mean()

    opt = optax.adamw(args.lr, weight_decay=0.01)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(p, o, toks):
        loss, grads = jax.value_and_grad(loss_fn)(p, toks)
        updates, o = opt.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    rng = np.random.default_rng(0)
    t0 = time.time()
    for step in range(args.steps):
        params, opt_state, loss = train_step(params, opt_state, batch_for(step, rng))
        if step % 100 == 0 or step == args.steps - 1:
            print(
                f"step {step}: loss {float(loss):.4f} "
                f"({time.time()-t0:.0f}s)",
                file=sys.stderr,
            )

    # Held-out sequences for both evaluations.
    eval_seqs = [
        [int(t) for t in eval_bytes[i * S : (i + 1) * S]]
        for i in range(len(eval_bytes) // S)
    ]

    ppl_dense = perplexity(params, cfg, eval_seqs)

    # Control: the same dense weights in bf16 (isolates bf16-activation
    # effects from NF4 quantization proper).
    import dataclasses

    bf16_cfg = dataclasses.replace(cfg, dtype=jnp.bfloat16)
    bf16_params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        params,
    )
    ppl_bf16 = perplexity(bf16_params, bf16_cfg, eval_seqs)

    # Quantize every linear through the production pipeline (per-layer,
    # restacked — weights are stored fused exactly as serving uses them).

    qcfg = dataclasses.replace(cfg, quantize=True, dtype=jnp.bfloat16)

    def quant_stacked(w):
        pws = [
            quantize_for_tpu(np.asarray(w[l], np.float32), dtype=qcfg.dtype)
            for l in range(cfg.num_layers)
        ]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *pws)

    lp = params.layers
    qlayers = lp.replace(
        wqkv=quant_stacked(lp.wqkv),
        wo=quant_stacked(lp.wo),
        w_gateup=quant_stacked(lp.w_gateup),
        w_down=quant_stacked(lp.w_down),
    )
    qparams = params.replace(
        layers=qlayers,
        embed=params.embed.astype(jnp.bfloat16),
        lm_head=params.lm_head.astype(jnp.bfloat16),
    )
    ppl_nf4 = perplexity(qparams, qcfg, eval_seqs)

    # The int8-recode serving representation (values stay on the NF4 grid
    # up to codebook rounding) — the production decode fast path.
    from nf4_tpu.models.llama import recode_params_int8

    ppl_int8 = perplexity(recode_params_int8(qparams), qcfg, eval_seqs)

    delta = ppl_nf4 - ppl_dense
    report = {
        "ppl_dense_fp32": round(float(ppl_dense), 4),
        "ppl_dense_bf16": round(float(ppl_bf16), 4),
        "ppl_nf4": round(float(ppl_nf4), 4),
        "ppl_nf4_int8_recode": round(float(ppl_int8), 4),
        "delta": round(float(delta), 4),
        "delta_int8_recode": round(float(ppl_int8 - ppl_dense), 4),
        "delta_nf4_vs_bf16": round(float(ppl_nf4 - ppl_bf16), 4),
        "gate": args.gate,
        "within_gate": bool(abs(delta) <= args.gate),
        "trained_steps": args.steps,
        "params_m": round(
            sum(int(np.prod(l.shape)) for l in jax.tree.leaves(params)) / 1e6, 1
        ),
        "eval_tokens": len(eval_seqs) * (S - 1),
    }
    print(json.dumps(report))
    return 0 if report["within_gate"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
