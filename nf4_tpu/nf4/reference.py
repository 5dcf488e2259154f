"""Bit-exact NF4 quantization/dequantization oracle (CPU, NumPy).

This module is the golden reference for everything else in the framework.  It
reimplements the *bitsandbytes* NF4 storage format exactly — including the
parts the reference GPU package approximated away:

* the dynamic 256-entry codebook for double-quantized absmax
  (``quant_state.state2.code``), which the reference replaced with a linear
  ``absmax/127`` scale (reference ``kernel_optimized.py:45``);
* the fp32 ``offset`` added back to the dequantized absmax
  (asserted to exist at reference ``benchmark.py:23-24`` but ignored by the
  reference kernel);
* the *flat* block layout: absmax blocks of 64 run over the row-major
  flattened weight and absmax32 blocks of 256 over the flattened absmax
  stream, crossing row boundaries when ``n % 256 != 0`` (the reference
  re-derived a per-row layout with ``repeat()`` padding instead,
  ``kernel_optimized.py:174-186``).

Storage format (mirrors bitsandbytes ``quantize_4bit(..., quant_type="nf4",
compress_statistics=True)``):

* ``packed``: uint8, ``ceil(numel/2)`` bytes over the row-major flattened
  weight; element ``2i`` in the HIGH nibble, element ``2i+1`` in the LOW
  nibble (reference ``kernel_optimized.py:100-110`` — "high nibble first").
* ``absmax_u8``: uint8 codes, one per 64-element block, encoding
  ``absmax - offset`` through the dynamic codebook with per-256-block scaling.
* ``absmax32``: fp32, one per 256-entry block of the absmax stream.
* ``offset``: fp32 scalar, the mean of the raw fp32 absmax values.

Dequantization math contract (all in fp32, cast to target dtype at the end):

    absmax[b]  = dynamic_code[absmax_u8[b]] * absmax32[b // 256] + offset
    w_flat[i]  = NF4_CODE[nibble_i] * absmax[i // 64]   -> cast to dtype
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np

from .lut import NF4_CODE, code_midpoints, dynamic_code, get_code

__all__ = [
    "QuantState",
    "quantize_nf4",
    "dequantize_nf4",
    "dequantize_absmax",
    "quantize_to_code",
    "quantize_blockwise_u8",
    "pack_nibbles",
    "unpack_nibbles",
    "NF4_BLOCK",
    "ABSMAX_BLOCK",
]

NF4_BLOCK = 64  # inner blocksize: one absmax per 64 weight values
ABSMAX_BLOCK = 256  # outer blocksize: one fp32 absmax32 per 256 absmax codes


@dataclasses.dataclass
class QuantState:
    """Flat bitsandbytes-layout NF4 quantization state for one tensor."""

    packed: np.ndarray  # uint8 [ceil(numel/2)]
    absmax_u8: np.ndarray  # uint8 [ceil(numel/64)]
    absmax32: np.ndarray  # fp32  [ceil(ceil(numel/64)/256)]
    offset: np.float32  # fp32 scalar
    shape: Tuple[int, ...]  # logical tensor shape
    dtype: np.dtype  # output dtype (float16 / bfloat16-as-float32 proxy)
    blocksize: int = NF4_BLOCK
    blocksize2: int = ABSMAX_BLOCK
    # Optional override of the dynamic absmax codebook (e.g. carried over
    # verbatim from an imported bitsandbytes quant_state.state2.code).
    code2: np.ndarray | None = None
    # 4-bit codebook: "nf4" (normal-float) or "fp4" (e2m1 float — the
    # bitsandbytes Linear4bit DEFAULT).  Same storage format either way;
    # only the 16-entry value table differs.
    quant_type: str = "nf4"

    @property
    def numel(self) -> int:
        return int(np.prod(self.shape))


def quantize_to_code(x: np.ndarray, code: np.ndarray) -> np.ndarray:
    """Map fp32 values in [-1, 1] to nearest-codebook indices.

    Threshold semantics: a value goes to the higher index only when strictly
    greater than the midpoint, matching the ``x > mid`` comparisons of the
    bitsandbytes quantizer trees — i.e. ``idx = #{midpoints < x}``
    (``np.searchsorted(mids, x, side='left')``; the semantics are pinned by
    tests/test_reference.py, and a vectorized binary-search reimplementation
    measured SLOWER than numpy's C loop, so keep searchsorted).  For bulk
    quantization use the device path (``nf4.fast_quant``).

    Non-monotone SIGN-MAGNITUDE tables (fp4: ``code[8+i] == -code[i]``,
    ``code[:8] >= 0``) quantize as bnb's dQuantizeFP4 does: nearest
    non-negative magnitude by the same strict-greater midpoint rule, plus
    the sign bit when ``x < 0`` (so ``-0.0`` and ``0.0`` both take the
    positive branch, exactly like the CUDA ``x < 0.0f`` test).
    """
    x = np.asarray(x, dtype=np.float32)
    code = np.asarray(code, dtype=np.float32)
    if code.shape[0] != 16 or np.all(np.diff(code) >= 0):
        mids = code_midpoints(code)
        idx = np.searchsorted(mids, x, side="left")
        return idx.astype(np.uint8)
    from .lut import fp4_order_and_mids

    order, mids = fp4_order_and_mids(code)
    pos = np.searchsorted(mids, np.abs(x), side="left")
    idx = order[pos] + np.where(x < 0, 8, 0).astype(np.uint8)
    return idx.astype(np.uint8)


def _block_absmax(x_flat: np.ndarray, blocksize: int) -> np.ndarray:
    n = x_flat.shape[0]
    nblocks = -(-n // blocksize)
    pad = nblocks * blocksize - n
    if pad:
        x_flat = np.concatenate([x_flat, np.zeros(pad, dtype=x_flat.dtype)])
    return np.abs(x_flat.reshape(nblocks, blocksize)).max(axis=1).astype(np.float32)


def quantize_blockwise_u8(
    x_flat: np.ndarray, blocksize: int = ABSMAX_BLOCK
) -> Tuple[np.ndarray, np.ndarray]:
    """Blockwise 8-bit quantization with the dynamic codebook.

    Returns (uint8 codes, fp32 per-block absmax).  This is the inner
    ("state2") quantization bitsandbytes applies to the absmax stream when
    ``compress_statistics=True``.
    """
    x_flat = np.asarray(x_flat, dtype=np.float32).ravel()
    code = dynamic_code()
    absmax = _block_absmax(x_flat, blocksize)
    n = x_flat.shape[0]
    nblocks = absmax.shape[0]
    pad = nblocks * blocksize - n
    xp = np.concatenate([x_flat, np.zeros(pad, dtype=np.float32)]) if pad else x_flat
    scale = np.where(absmax > 0, absmax, np.float32(1.0))
    normalized = (xp.reshape(nblocks, blocksize) / scale[:, None]).astype(np.float32)
    codes = quantize_to_code(normalized, code).ravel()[:n]
    return codes, absmax


def pack_nibbles(idx_flat: np.ndarray) -> np.ndarray:
    """Pack 4-bit indices two-per-byte, first element in the HIGH nibble."""
    idx_flat = np.asarray(idx_flat, dtype=np.uint8).ravel()
    if idx_flat.shape[0] % 2:
        idx_flat = np.concatenate([idx_flat, np.zeros(1, dtype=np.uint8)])
    pairs = idx_flat.reshape(-1, 2)
    return ((pairs[:, 0] << 4) | (pairs[:, 1] & 0xF)).astype(np.uint8)


def unpack_nibbles(packed: np.ndarray, numel: int) -> np.ndarray:
    """Inverse of :func:`pack_nibbles`: uint8 bytes -> uint8 indices [numel]."""
    packed = np.asarray(packed, dtype=np.uint8).ravel()
    hi = (packed >> 4) & 0xF
    lo = packed & 0xF
    out = np.stack([hi, lo], axis=1).ravel()
    return out[:numel]


def quantize_nf4(
    w: np.ndarray,
    dtype: np.dtype | None = None,
    compress_statistics: bool = True,
    quant_type: str = "nf4",
) -> QuantState:
    """Quantize a tensor to flat-layout 4-bit with double-quantized
    statistics.  ``quant_type``: "nf4" (default) or "fp4" — the bnb
    ``quantize_4bit(..., quant_type=...)`` switch; storage is identical,
    only the 16-entry codebook differs."""
    w = np.asarray(w)
    if dtype is None:
        dtype = w.dtype if w.dtype in (np.float16,) else np.dtype(np.float32)
    shape = w.shape
    w_flat = w.astype(np.float32).ravel()
    n = w_flat.shape[0]

    absmax = _block_absmax(w_flat, NF4_BLOCK)
    nblocks = absmax.shape[0]
    pad = nblocks * NF4_BLOCK - n
    wp = np.concatenate([w_flat, np.zeros(pad, dtype=np.float32)]) if pad else w_flat
    scale = np.where(absmax > 0, absmax, np.float32(1.0))
    normalized = (wp.reshape(nblocks, NF4_BLOCK) / scale[:, None]).astype(np.float32)
    idx = quantize_to_code(normalized, get_code(quant_type)).ravel()[:n]
    packed = pack_nibbles(idx)

    if compress_statistics:
        offset = np.float32(absmax.mean(dtype=np.float64))
        absmax_u8, absmax32 = quantize_blockwise_u8(absmax - offset, ABSMAX_BLOCK)
    else:
        # Uncompressed statistics: store raw fp32 absmax in absmax32 with a
        # 1:1 mapping (absmax_u8 unused).  Kept for parity with
        # bitsandbytes(compress_statistics=False); the dispatcher analog of
        # the reference's non-uint8-absmax fallback (kernel_optimized.py:166).
        offset = np.float32(0.0)
        absmax_u8 = np.zeros(nblocks, dtype=np.uint8)
        absmax32 = absmax.astype(np.float32)

    return QuantState(
        packed=packed,
        absmax_u8=absmax_u8,
        absmax32=absmax32.astype(np.float32),
        offset=offset,
        shape=tuple(shape),
        dtype=np.dtype(dtype),
        blocksize=NF4_BLOCK,
        blocksize2=ABSMAX_BLOCK,
        quant_type=quant_type,
    )


def dequantize_absmax(state: QuantState) -> np.ndarray:
    """Recover the fp32 per-block absmax: code2[u8] * absmax32[blk] + offset."""
    if state.absmax_u8 is None or state.absmax32.shape[0] == state.absmax_u8.shape[0]:
        # Uncompressed statistics path.
        return state.absmax32.astype(np.float32)
    code2 = state.code2 if state.code2 is not None else dynamic_code()
    vals = code2[state.absmax_u8]
    blk = np.arange(vals.shape[0]) // state.blocksize2
    return (vals * state.absmax32[blk] + state.offset).astype(np.float32)


def dequantize_nf4(state: QuantState, dtype: np.dtype | None = None) -> np.ndarray:
    """Dequantize to the logical shape; fp32 math, cast at the end.

    Matches bitsandbytes semantics exactly: ``CODE[nibble] * absmax_blk``
    computed in fp32, then cast once to the output dtype (CODE is the
    state's quant_type codebook — NF4 or FP4).
    """
    out_dtype = np.dtype(dtype if dtype is not None else state.dtype)
    n = state.numel
    idx = unpack_nibbles(state.packed, n)
    absmax = dequantize_absmax(state)
    blk = np.arange(n) // state.blocksize
    vals = (get_code(state.quant_type)[idx] * absmax[blk]).astype(np.float32)
    return vals.astype(out_dtype).reshape(state.shape)
