"""One-shot checkpoint quantization CLI.

    python -m nf4_tpu.quantize --hf-dir /path/to/llama --out llama-nf4.npz \
        [--model llama3-8b] [--quant-type nf4|fp4] [--tp N] [--force-cpu]

Loads an HF safetensors checkpoint (dense — quantized on the fly, layer by
layer, bounded host memory; or a pre-quantized "*-bnb-4bit" checkpoint —
repacked without requantization), optionally re-degrees the packed weights
for tensor parallelism (``--tp``, pure index manipulation via
``parallel.tp.repack_tp``), and writes the packed TPU format
(``models.loader.save_packed``: .npz or .safetensors by extension).

The packed artifact reloads in seconds (``load_packed``) — quantize once,
serve many times.  The reference package has no offline path at all: it
re-dequantizes live bitsandbytes modules on every run.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="python -m nf4_tpu.quantize")
    ap.add_argument("--hf-dir", required=True, help="HF checkpoint directory")
    ap.add_argument(
        "--out", required=True,
        help="output path (.npz or .safetensors)",
    )
    ap.add_argument(
        "--model", default=None,
        help="config name (models.configs); default: derive from config.json",
    )
    ap.add_argument(
        "--quant-type", default=None, choices=("nf4", "fp4"),
        help="4-bit codebook (default: config.json quantization_config, "
        "else nf4)",
    )
    ap.add_argument(
        "--tp", type=int, default=1,
        help="re-pack for this tensor-parallel degree (pure indexing)",
    )
    ap.add_argument(
        "--force-cpu", action="store_true",
        help="quantize on CPU (native C++/oracle) even when a TPU is up",
    )
    args = ap.parse_args(argv)

    if args.force_cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from .models import configs
    from .models.loader import hf_config_to_llama, load_hf_llama, save_packed

    overrides = {}
    if args.quant_type:
        overrides["quant_type"] = args.quant_type
    if args.model:
        cfg = configs.get_config(args.model)
        if overrides:
            import dataclasses

            cfg = dataclasses.replace(cfg, **overrides)
    else:
        cfg = hf_config_to_llama(
            os.path.join(args.hf_dir, "config.json"), **overrides
        )

    t0 = time.monotonic()
    stats = {}
    params, cfg = load_hf_llama(args.hf_dir, cfg, stats=stats)
    t_load = time.monotonic() - t0

    if args.tp > 1:
        from .parallel.tp import repack_tp

        params, cfg = repack_tp(params, cfg, args.tp)

    t1 = time.monotonic()
    save_packed(args.out, params, cfg)
    t_save = time.monotonic() - t1

    out_bytes = os.path.getsize(args.out)
    print(
        json.dumps(
            {
                "out": args.out,
                "quant_type": cfg.quant_type,
                "tp_shards": cfg.tp_shards,
                "load_quantize_s": round(t_load, 1),
                "save_s": round(t_save, 1),
                "packed_bytes": out_bytes,
                "peak_dense_bytes": stats.get("peak_dense_bytes"),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
