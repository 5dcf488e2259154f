"""Serving CLI: load a checkpoint and expose the OpenAI-compatible HTTP API.

    # packed artifact (self-describing; from python -m nf4_tpu.quantize)
    python -m nf4_tpu.serve --packed llama-nf4.safetensors --port 8000

    # HF checkpoint directory (dense -> streamed quantize-on-load; or a
    # pre-quantized "*-bnb-4bit" export -> pure repack)
    python -m nf4_tpu.serve --hf-dir /path/to/Llama-3-8B --int8 --kv8

    # registry config with random weights (load test / smoke)
    python -m nf4_tpu.serve --model tinyllama-1.1b --synthetic

Endpoints (serve/api.py): ``/v1/completions``, ``/v1/chat/completions``
(incl. ``"stream": true`` SSE), ``/v1/models``, ``/metrics`` (Prometheus).
A tokenizer directory (``--tokenizer``, defaults to ``--hf-dir``) enables
string prompts and chat templating; without one the API accepts token-id
lists.  The reference package has no server at all — serving is part of
this framework's BASELINE contract (tokens/s/chip targets, BASELINE.md).
"""

from __future__ import annotations

import argparse
import sys
import time


def build_engine(args):
    """Construct (engine, tokenizer) from parsed CLI args."""
    import dataclasses

    import jax

    from ..models import configs
    from ..models.loader import (
        hf_config_to_llama,
        load_hf_llama,
        load_packed_auto,
    )
    from ..serve.engine import Engine
    from ..serve.sampling import SamplingParams

    overrides = {}
    if args.kv8:
        overrides["kv_quant"] = True
    if args.max_seq_len:
        overrides["max_seq_len"] = args.max_seq_len

    if sum(map(bool, (args.packed, args.hf_dir, args.synthetic))) != 1:
        raise SystemExit(
            "pick exactly one weight source: --packed PATH, --hf-dir DIR, "
            "or --model NAME --synthetic"
        )

    mesh = None
    if args.tp > 1 or args.dp > 1:
        from ..parallel.mesh import make_mesh

        mesh = make_mesh(tp=args.tp, dp=args.dp)

    t0 = time.monotonic()
    if args.packed:
        if mesh is not None and not args.int8:
            # Shard-on-read: each host reads only its devices' slices.
            # Falls back to eager load + in-memory repack when the
            # checkpoint was packed for a different tp degree.
            from ..models.loader import load_packed_sharded

            try:
                params, cfg = load_packed_sharded(
                    args.packed, mesh, **overrides
                )
                src = f"{args.packed} (shard-on-read over the mesh)"
            except ValueError as e:
                if "tp_shards" not in str(e):
                    raise
                print(f"sharded load unavailable ({e}); loading eagerly",
                      file=sys.stderr)
                params, cfg = load_packed_auto(args.packed, **overrides)
                src = args.packed
        else:
            params, cfg = load_packed_auto(args.packed, **overrides)
            src = args.packed
        if args.tp > 1 and cfg.tp_shards != args.tp:
            from ..parallel.tp import repack_tp

            params, cfg = repack_tp(params, cfg, args.tp)
            print(f"repacked tp_shards -> {args.tp} (pure indexing)",
                  file=sys.stderr)
    elif args.hf_dir:
        import os

        # Dense checkpoints quantize on load: pack directly at the serving
        # tp degree (packed artifacts instead repack/shard-load above).
        if args.tp > 1:
            overrides["tp_shards"] = args.tp
        if args.model:
            cfg = dataclasses.replace(
                configs.get_config(args.model), **overrides
            )
        else:
            cfg = hf_config_to_llama(
                os.path.join(args.hf_dir, "config.json"), **overrides
            )
        params, cfg = load_hf_llama(args.hf_dir, cfg)
        src = args.hf_dir
    else:  # --synthetic: registry config, random quantized weights
        if not args.model:
            raise SystemExit("--synthetic requires --model NAME")
        if args.tp > 1:
            overrides["tp_shards"] = args.tp
        cfg = dataclasses.replace(configs.get_config(args.model), **overrides)
        from ..models.llama import init_params

        params = init_params(cfg, seed=0)
        src = f"synthetic:{args.model}"
    print(f"weights: {src} ({time.monotonic() - t0:.1f}s)", file=sys.stderr)

    if args.int8:
        from ..models.llama import recode_params_int8

        t0 = time.monotonic()
        params = jax.block_until_ready(recode_params_int8(params))
        print(
            f"int8 recode: {time.monotonic() - t0:.1f}s (2x weight HBM, "
            "~+55% decode tok/s; values stay on the NF4 grid)",
            file=sys.stderr,
        )

    tokenizer = None
    tok_dir = args.tokenizer or args.hf_dir
    if tok_dir:
        try:
            from transformers import AutoTokenizer

            tokenizer = AutoTokenizer.from_pretrained(tok_dir)
        except Exception as e:  # no tokenizer files / no transformers
            print(f"tokenizer unavailable ({e}); token-id API only",
                  file=sys.stderr)

    eos = args.eos
    if eos is None:
        eos = getattr(tokenizer, "eos_token_id", None)
    if eos is None:
        eos = 2  # Llama convention

    draft = None
    if args.draft_packed or args.draft_model:
        assert args.spec_k > 0, "--draft-* requires --spec-k > 0"
        assert mesh is None, "draft-model speculation is single-device"
        t0 = time.monotonic()
        if args.draft_packed:
            from ..models.loader import load_packed_auto

            dparams, dcfg = load_packed_auto(
                args.draft_packed, max_seq_len=cfg.max_seq_len
            )
            dsrc = args.draft_packed
        else:  # --draft-model NAME: synthetic draft weights (testing)
            from ..models.llama import init_params as _init

            dcfg = dataclasses.replace(
                configs.get_config(args.draft_model),
                max_seq_len=cfg.max_seq_len,
            )
            dparams = _init(dcfg, seed=0)
            dsrc = f"synthetic:{args.draft_model}"
        draft = (dparams, dcfg)
        print(f"draft model: {dsrc} ({time.monotonic() - t0:.1f}s)",
              file=sys.stderr)

    engine = Engine(
        params,
        cfg,
        batch_size=args.batch_size,
        eos_token=int(eos),
        sampling=SamplingParams(temperature=args.temperature),
        mesh=mesh,
        decode_chunk=args.decode_chunk,
        spec_k=args.spec_k,
        draft=draft,
        prefix_cache=args.prefix_cache,
    )
    return engine, tokenizer


def main(argv=None, block=True):
    ap = argparse.ArgumentParser(prog="python -m nf4_tpu.serve")
    src = ap.add_argument_group("weights (pick one)")
    src.add_argument("--packed", help="packed checkpoint (.npz/.safetensors) "
                     "from python -m nf4_tpu.quantize / save_packed")
    src.add_argument("--hf-dir", help="HF checkpoint dir (dense or "
                     "*-bnb-4bit; quantized/repacked on load)")
    src.add_argument("--synthetic", action="store_true",
                     help="random weights for --model (smoke/load test)")
    ap.add_argument("--model", default=None,
                    help="registry config name (models.configs); required "
                    "with --synthetic, optional override with --hf-dir")
    ap.add_argument("--tokenizer", default=None,
                    help="tokenizer dir (default: --hf-dir); enables string "
                    "prompts + chat templates")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--model-name", default="nf4-tpu",
                    help="model id reported by /v1/models")
    ap.add_argument("--batch-size", type=int, default=8,
                    help="continuous-batching slot count")
    ap.add_argument("--max-seq-len", type=int, default=None,
                    help="KV-cache length cap (defaults to the config's)")
    ap.add_argument("--int8", action="store_true",
                    help="int8-recode serving mode (2x weight HBM, ~+55% "
                    "decode tok/s; values stay on the NF4 grid)")
    ap.add_argument("--kv8", action="store_true",
                    help="int8 KV cache (halves KV memory)")
    ap.add_argument("--tp", type=int, default=1,
                    help="tensor-parallel degree (needs tp*dp devices)")
    ap.add_argument("--dp", type=int, default=1,
                    help="data-parallel degree: slots shard over dp")
    ap.add_argument("--decode-chunk", type=int, default=8,
                    help="decode steps per host sync")
    ap.add_argument("--spec-k", type=int, default=0,
                    help="speculative decoding: draft length (prompt-lookup "
                    "n-gram drafts unless --draft-* gives a draft model)")
    ap.add_argument("--draft-packed", default=None,
                    help="packed checkpoint of a small DRAFT model for "
                    "draft-model speculation (same vocab; implies "
                    "host-stepped verify; single-device only)")
    ap.add_argument("--draft-model", default=None,
                    help="registry config name for a synthetic draft model "
                    "(testing; real serving should use --draft-packed)")
    ap.add_argument("--prefix-cache", action="store_true",
                    help="prefill shared prompt prefixes once per wave")
    ap.add_argument("--batch-window", type=float, default=0.01,
                    help="dispatcher dynamic-batching grace (s): wait this "
                    "long after a fresh wave's first request for more "
                    "arrivals (fuller initial waves; lets --prefix-cache "
                    "engage on bursts; costs <= this much TTFT when "
                    "traffic is sparse)")
    ap.add_argument("--temperature", type=float, default=0.0,
                    help="default sampling temperature (0 = greedy)")
    ap.add_argument("--eos", type=int, default=None,
                    help="EOS token id (default: tokenizer's, else 2)")
    args = ap.parse_args(argv)

    engine, tokenizer = build_engine(args)

    from .api import CompletionServer

    server = CompletionServer(engine, tokenizer, model_name=args.model_name,
                              batch_window=args.batch_window)
    port = server.start(args.host, args.port)
    print(f"serving on http://{args.host}:{port} "
          f"(model={args.model_name}, slots={args.batch_size})",
          file=sys.stderr)
    if not block:
        return server
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        server.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
