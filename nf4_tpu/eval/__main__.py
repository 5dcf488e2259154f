"""Perplexity evaluation CLI.

    python -m nf4_tpu.eval --checkpoint packed.npz --model tinyllama-1.1b \
        --tokens tokens.npy [--baseline-ppl 7.95]

``tokens.npy`` holds either a 2D int array [n_seqs, seq_len] or a 1D stream
that is split into max_seq_len windows.  Reports perplexity and, when a
baseline is given, the BASELINE.md <= 0.1-delta gate.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="python -m nf4_tpu.eval")
    ap.add_argument("--model", required=True, help="config name (see models.configs)")
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--checkpoint", help="packed .npz from save_packed")
    src.add_argument("--hf-dir", help="HF checkpoint dir (quantizes on load)")
    ap.add_argument("--tokens", required=True, help=".npy token array")
    ap.add_argument("--baseline-ppl", type=float, default=None)
    ap.add_argument("--gate", type=float, default=0.1)
    ap.add_argument("--batch-size", type=int, default=8)
    args = ap.parse_args(argv)

    from ..models import configs
    from .ppl import perplexity_report

    cfg = configs.get_config(args.model)
    if args.checkpoint:
        from ..models.loader import load_packed

        params = load_packed(args.checkpoint, cfg)
    else:
        from ..models.loader import load_hf_llama

        params, cfg = load_hf_llama(args.hf_dir, cfg)

    toks = np.load(args.tokens)
    if toks.ndim == 1:
        n = (toks.shape[0] // cfg.max_seq_len) * cfg.max_seq_len
        toks = toks[:n].reshape(-1, cfg.max_seq_len)
    sequences = [list(map(int, row)) for row in toks]

    report = perplexity_report(
        params, cfg, sequences, baseline_ppl=args.baseline_ppl, gate=args.gate,
        batch_size=args.batch_size,
    )
    print(json.dumps(report))
    if "within_gate" in report and not report["within_gate"]:
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
