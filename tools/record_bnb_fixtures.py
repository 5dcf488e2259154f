"""Record golden NF4 fixtures from a REAL bitsandbytes installation.

Run this on any machine with bitsandbytes + CUDA (this TPU rig has
neither):

    python tools/record_bnb_fixtures.py [--out tests/fixtures/bnb_nf4.npz]

It quantizes seeded tensors with ``bitsandbytes.functional.quantize_4bit``
(the exact code path the reference package consumes,
``/root/reference/kernel_optimized.py:117-127``) and records everything a
byte-level differential test needs:

* the packed uint8 nibble stream
* ``absmax`` (uint8, double-quantized), ``state2.absmax`` (fp32),
  ``state2.code`` (fp32 256-entry dynamic table), ``offset``
* bnb's own ``dequantize_4bit`` output (fp16 and bf16 bit patterns)

``tests/test_bnb_fixtures.py`` then asserts, on any machine:

* our ``nf4.adapters`` import + ``dequantize_nf4`` reproduces bnb's
  dequantized bytes exactly;
* our quantizer (``quantize_nf4``) reproduces bnb's packed bytes and
  statistics exactly.

This is the external-ground-truth role Unsloth/PEFT play in the reference
benchmarks (``/root/reference/benchmark.py:104-113,149-162``), made
byte-exact instead of rtol=0.1.
"""

from __future__ import annotations

import argparse

import numpy as np


SHAPES = [(64, 64), (128, 256), (256, 1024), (100, 320)]
SEED = 1234


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="tests/fixtures/bnb_nf4.npz")
    args = ap.parse_args()

    import torch
    import bitsandbytes.functional as F

    assert torch.cuda.is_available(), "bitsandbytes quantize_4bit needs CUDA"
    rng = np.random.default_rng(SEED)
    arrays = {}
    # Record BOTH codebooks: nf4 and fp4 (bnb's default) — keys for fp4
    # fixtures carry a ".fp4" suffix; tests/test_bnb_fixtures.py checks
    # whichever flavors are present.
    for i, (m, n) in enumerate(SHAPES):
        w = (rng.standard_normal((m, n)) * 0.05).astype(np.float32)
        t = torch.from_numpy(w).cuda()
        for qt in ("nf4", "fp4"):
            suffix = "" if qt == "nf4" else ".fp4"
            packed, qs = F.quantize_4bit(
                t, blocksize=64, compress_statistics=True, quant_type=qt
            )
            dq16 = F.dequantize_4bit(packed, qs).to(torch.float16).cpu().numpy()
            arrays[f"{i}.input"] = w
            arrays[f"{i}{suffix}.packed"] = packed.cpu().numpy().reshape(-1)
            arrays[f"{i}{suffix}.absmax_u8"] = qs.absmax.cpu().numpy()
            arrays[f"{i}{suffix}.absmax32"] = qs.state2.absmax.cpu().numpy()
            arrays[f"{i}{suffix}.code2"] = qs.state2.code.cpu().numpy()
            arrays[f"{i}{suffix}.offset"] = np.float32(qs.offset.item())
            arrays[f"{i}{suffix}.dequant_fp16_bits"] = dq16.view(np.uint16)
            arrays[f"{i}{suffix}.shape"] = np.asarray([m, n])
    np.savez(args.out, **arrays)
    print(f"recorded {len(SHAPES)} fixtures -> {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
