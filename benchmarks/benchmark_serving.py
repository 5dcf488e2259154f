"""Serving benchmark: decode tokens/s/chip for an NF4-quantized Llama.

The BASELINE.md serving target is tokens/s/chip for NF4 Llama models; the
reference package has no model or serving layer at all (SURVEY.md §2.2).
This harness builds a randomly initialized (but correctly shaped) quantized
model, measures the jitted decode step via chained-marginal timing (robust
on runtimes where ``block_until_ready`` lies), and reports decode tokens/s
per chip at several batch sizes plus prefill throughput.

Random weights give identical compute/memory behavior to trained ones, so
the throughput numbers are representative; quality metrics come from
``nf4_tpu.eval.ppl`` with real checkpoints instead.

Usage: python benchmarks/benchmark_serving.py [--model tinyllama-1.1b]
         [--batch-sizes 1,8,16] [--prefill-len 512]
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

from nf4_tpu.models import configs
from nf4_tpu.models.llama import (
    KVCache,
    decode_step,
    forward,
    init_kv_cache,
    init_params,
)
from nf4_tpu.utils.timing import Stats


def measure_decode_chain(params, cfg, batch: int, n1=20, n2=60, repeats=3, mesh=None):
    """Chained decode: token_{t+1} = argmax(logits_t); the real autoregressive
    dependency structure, so no artificial chaining is needed.

    With ``mesh``, params must already be localized + sharded and the step
    routes through the tensor-parallel layer."""
    if mesh is not None:
        from nf4_tpu.parallel.tp import init_sharded_kv_cache, tp_decode_step

        cache0 = init_sharded_kv_cache(cfg, batch, mesh)
    else:
        cache0 = init_kv_cache(cfg, batch)

    @jax.jit
    def step(p, token, pos, cache):
        # params must be an ARGUMENT: closing over them bakes ~1GB of
        # weights into the HLO as constants (and breaks remote compile).
        if mesh is not None:
            from nf4_tpu.parallel.tp import tp_decode_step

            logits, new_cache = tp_decode_step(p, cfg, mesh, token, cache, pos)
        else:
            logits, new_cache = decode_step(
                p, cfg, token=token, cache=cache, positions=pos
            )
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return nxt, pos + 1, new_cache

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


def measure_prefill(params, cfg, batch: int, seqlen: int, repeats=3, mesh=None):
    if mesh is not None:
        from nf4_tpu.parallel.tp import init_sharded_kv_cache

        cache = init_sharded_kv_cache(cfg, batch, mesh)
    else:
        cache = init_kv_cache(cfg, batch)
    toks = jnp.zeros((batch, seqlen), jnp.int32)
    positions = jnp.broadcast_to(jnp.arange(seqlen, dtype=jnp.int32), (batch, seqlen))
    seq_lens = jnp.full((batch,), seqlen, jnp.int32)

    @jax.jit
    def pf(p, t, c):
        if mesh is not None:
            from nf4_tpu.parallel.tp import tp_forward

            logits, _ = tp_forward(
                p, cfg, mesh, t, c, positions, seq_lens, last_only=True
            )
            return logits
        logits, _ = forward(p, cfg, t, c, positions, seq_lens, last_only=True)
        return logits

    def run(n):
        t = toks
        t0 = time.perf_counter()
        for _ in range(n):
            out = pf(params, t, cache)
            t = t.at[:, 0:1].set(jnp.argmax(out[:, :1], axis=-1, keepdims=True).astype(jnp.int32))
        np.asarray(jax.device_get(t[0, 0]))
        return time.perf_counter() - t0

    run(2)
    vals = [(run(8) - run(3)) / 5 for _ in range(repeats)]
    return Stats(vals)


def synthetic_params(cfg):
    """Structurally exact LlamaParams with random packed codes/scales built
    directly on device — same compute and memory traffic as a real model
    (logits are garbage; use only for throughput measurement)."""
    from nf4_tpu.models.llama import LayerParams, LlamaParams
    from nf4_tpu.nf4.format import PackedNF4, pad_to
    from nf4_tpu.nf4.reference import NF4_BLOCK

    key = jax.random.PRNGKey(0)

    def pw(m, n, shards=1):
        nonlocal key
        key, k1, k2 = jax.random.split(key, 3)
        m_pad = pad_to(m, 128)
        n_chunk_pad = pad_to(n // shards, 1024)
        n_pad = n_chunk_pad * shards
        packed = jax.random.randint(k1, (n_pad // 2, m_pad), 0, 256, jnp.int32)
        scales = jax.random.uniform(
            k2, (n_pad // NF4_BLOCK, m_pad), jnp.float32, 0.001, 0.02
        )
        return PackedNF4(
            packed=packed.astype(jnp.uint8),
            scales=scales,
            shape=(m, n),
            padded_shape=(m_pad, n_pad),
            dtype=jnp.dtype(cfg.dtype),
            shards=shards,
        )

    h, inter = cfg.hidden_size, cfg.intermediate_size
    g = cfg.tp_shards

    def layer():
        return LayerParams(
            wqkv=pw(cfg.q_dim + 2 * cfg.kv_dim, h),
            wo=pw(h, cfg.q_dim, shards=g),
            w_gateup=pw(2 * inter, h),
            w_down=pw(h, inter, shards=g),
            input_norm=jnp.ones((h,), jnp.float32),
            post_attn_norm=jnp.ones((h,), jnp.float32),
        )

    layers = [layer() for _ in range(cfg.num_layers)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    key, k3, k4 = jax.random.split(key, 3)
    lm_head = (
        pw(cfg.vocab_size, h)
        if cfg.quantize_lm_head
        else (
            jax.random.normal(k4, (cfg.vocab_size, h), jnp.float32) * h**-0.5
        ).astype(cfg.dtype)
    )
    return LlamaParams(
        embed=(jax.random.normal(k3, (cfg.vocab_size, h), jnp.float32) * 0.02).astype(
            cfg.dtype
        ),
        layers=stacked,
        final_norm=jnp.ones((h,), jnp.float32),
        lm_head=lm_head,
    )


def model_weight_bytes(cfg) -> int:
    """Packed NF4 weight-stream bytes touched per decode token."""
    per_layer = (
        cfg.hidden_size * cfg.num_heads * cfg.head_dim  # wq
        + 2 * cfg.hidden_size * cfg.num_kv_heads * cfg.head_dim  # wk, wv
        + cfg.num_heads * cfg.head_dim * cfg.hidden_size  # wo
        + 3 * cfg.hidden_size * cfg.intermediate_size  # gate, up, down
    )
    quant = cfg.num_layers * per_layer
    dense = cfg.vocab_size * cfg.hidden_size * 2  # embed + lm_head (bf16)
    return quant // 2 + quant // 16 * 4 // 4 + dense * 2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="tinyllama-1.1b")
    ap.add_argument("--batch-sizes", default="1,8,16")
    ap.add_argument("--prefill-len", type=int, default=512)
    ap.add_argument("--max-seq-len", type=int, default=1024,
                    help="cap context to bound KV memory in the benchmark")
    ap.add_argument("--int8", action="store_true",
                    help="serve via the int8-recode representation (2x weight "
                    "bytes, ~2.5x decode; values stay on the NF4 grid)")
    ap.add_argument("--kv8", action="store_true",
                    help="int8-quantize the KV cache (cfg.kv_quant)")
    ap.add_argument("--q-lm-head", action="store_true",
                    help="NF4-quantize the lm_head (cfg.quantize_lm_head)")
    ap.add_argument("--tp", type=int, default=1,
                    help="serve through the tensor-parallel layer over a "
                    "tp-device mesh (requires that many devices; on the "
                    "CPU backend set "
                    "XLA_FLAGS=--xla_force_host_platform_device_count=N)")
    ap.add_argument("--prefix", type=int, default=0,
                    help="also measure shared-prefix caching: generate() "
                    "over prompts sharing an N-token prefix, plain vs "
                    "Engine(prefix_cache=True)")
    ap.add_argument("--engine", action="store_true",
                    help="also measure END-TO-END engine throughput "
                    "(continuous batching + sampling + host loop), not just "
                    "the raw jitted decode chain")
    ap.add_argument("--synthetic", action="store_true",
                    help="build packed weights with random codes directly on "
                    "device (seconds instead of minutes; identical compute/"
                    "memory behavior, garbage logits) — for throughput "
                    "benchmarking of big models")
    args = ap.parse_args()

    cfg = configs.get_config(args.model)
    import dataclasses

    if args.max_seq_len:
        cfg = dataclasses.replace(cfg, max_seq_len=args.max_seq_len)
    if args.tp > 1:
        cfg = dataclasses.replace(cfg, tp_shards=args.tp)
    if args.kv8:
        cfg = dataclasses.replace(cfg, kv_quant=True)
        print("kv cache: int8 (per-token absmax scales)")
    if args.q_lm_head:
        cfg = dataclasses.replace(cfg, quantize_lm_head=True)
        print("lm_head: NF4-quantized")
    print(f"device: {jax.devices()[0].device_kind} ({jax.default_backend()})")
    print(f"model: {args.model} ({cfg.num_layers} layers, hidden {cfg.hidden_size})")

    t0 = time.perf_counter()
    if args.synthetic:
        params = synthetic_params(cfg)
        print(f"synthetic init (device): {time.perf_counter() - t0:.1f}s")
    else:
        params = init_params(cfg, seed=0)
        print(f"init+quantize: {time.perf_counter() - t0:.1f}s")
    wbytes = model_weight_bytes(cfg)
    if args.int8:
        from nf4_tpu.models.llama import recode_params_int8

        t0 = time.perf_counter()
        params = jax.block_until_ready(recode_params_int8(params))
        print(f"int8 recode: {time.perf_counter() - t0:.1f}s (2x weight bytes)")
        wbytes = wbytes * 2  # int8 stream is twice the packed-NF4 stream

    mesh = None
    n_chips = 1
    if args.tp > 1:
        from nf4_tpu.parallel.mesh import make_mesh
        from nf4_tpu.parallel.tp import localize_params, shard_params

        mesh = make_mesh(tp=args.tp, dp=1)
        params, _ = shard_params(
            localize_params(params, args.tp, cfg.moe_shard),
            mesh,
            moe_shard=cfg.moe_shard,
        )
        n_chips = args.tp
        print(f"tensor parallel: tp={args.tp} over {n_chips} devices")

    print(f"\n--- decode (weight stream ~{wbytes / 2**20:.0f} MiB/token-step) ---")
    for b in (int(s) for s in args.batch_sizes.split(",")):
        st = measure_decode_chain(params, cfg, b, mesh=mesh)
        tps = b / st.median
        eff = wbytes / st.median / 1e9
        print(
            f"  batch {b:3d}: {st.median * 1e3:7.3f} ms/step -> "
            f"{tps:8.1f} tok/s ({tps / n_chips:.1f} tok/s/chip, "
            f"{eff:.0f} GB/s aggregate weight stream)"
        )

    if args.engine and mesh is None:
        from nf4_tpu.serve.engine import Engine

        print("\n--- engine end-to-end (continuous batching) ---")
        print("  A/B: pipelined decode chunks (chunk c+1 launched from chunk "
              "c's device handles) vs serialized readback, interleaved reps")
        for b in (int(s) for s in args.batch_sizes.split(",")):
            prompts = [[1 + i, 2 + i, 3 + i] for i in range(b)]
            engines = {
                mode: Engine(
                    params, cfg, batch_size=b, eos_token=-1,
                    pipeline_decode=mode,
                )
                for mode in (False, True)
            }
            for eng in engines.values():
                eng.generate(prompts, max_new_tokens=96)  # warm/compile
            best = {False: float("inf"), True: float("inf")}
            ntok = {}
            for _ in range(3):  # interleave reps: shared-chip drift ~2x
                for mode, eng in engines.items():
                    t0 = time.perf_counter()
                    res = eng.generate(prompts, max_new_tokens=96)
                    dt = time.perf_counter() - t0
                    best[mode] = min(best[mode], dt)
                    ntok[mode] = sum(len(r.tokens) for r in res)
            for mode in (False, True):
                tag = "pipelined " if mode else "serialized"
                print(
                    f"  batch {b:3d} {tag}: {ntok[mode]} tokens in "
                    f"{best[mode]:.2f}s -> {ntok[mode] / best[mode]:8.1f} "
                    f"tok/s engine-level "
                    f"(decode_chunk={engines[mode].decode_chunk})"
                )
            print(
                f"  batch {b:3d} pipeline speedup: "
                f"{best[False] / best[True]:.2f}x"
            )

    if args.prefix and mesh is None:
        from nf4_tpu.serve.engine import Engine

        print(
            f"\n--- shared-prefix caching ({args.prefix}-token prefix, "
            "16-token tails, 8 new tokens) ---"
        )
        rng = np.random.default_rng(0)
        plen = min(args.prefix, cfg.max_seq_len - 32)  # room for tail+gen
        pref = rng.integers(1, cfg.vocab_size, plen).tolist()
        for b in (int(s) for s in args.batch_sizes.split(",")):
            prompts = [
                pref + rng.integers(1, cfg.vocab_size, 16).tolist()
                for _ in range(b)
            ]
            times = {}
            for mode in (False, True):
                eng = Engine(
                    params, cfg, batch_size=b, eos_token=-1,
                    prefix_cache=mode,
                )
                eng.generate(prompts, max_new_tokens=8)  # warm/compile
                t0 = time.perf_counter()
                eng.generate(prompts, max_new_tokens=8)
                times[mode] = time.perf_counter() - t0
            print(
                f"  batch {b:3d}: plain {times[False] * 1e3:8.1f} ms, "
                f"prefix-cached {times[True] * 1e3:8.1f} ms "
                f"({times[False] / times[True]:.2f}x)"
            )

    print("\n--- prefill ---")
    b = 1
    st = measure_prefill(params, cfg, b, args.prefill_len, mesh=mesh)
    tps = b * args.prefill_len / st.median
    print(
        f"  batch {b}, len {args.prefill_len}: {st.median * 1e3:.1f} ms -> "
        f"{tps:,.0f} tok/s ({tps / n_chips:,.0f} tok/s/chip)"
    )


if __name__ == "__main__":
    main()
