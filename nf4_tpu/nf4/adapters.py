"""Adapters from external NF4 representations to the framework's QuantState.

Framework-agnostic by design: inputs may be torch tensors, numpy arrays, or
anything ``np.asarray`` understands; torch is never imported here.  The
expected attribute schema is the one the reference pins with its layout
assertions (reference ``benchmark.py:18-28``): uint8 packed weight, uint8
``quant_state.absmax``, fp32 ``state2.absmax`` / ``state2.code``, fp32
``offset``, blocksizes 64/256.
"""

from __future__ import annotations

import numpy as np

from .reference import ABSMAX_BLOCK, NF4_BLOCK, QuantState

__all__ = ["quant_state_from_module", "quant_state_from_arrays"]


def _to_numpy(x) -> np.ndarray:
    if hasattr(x, "detach"):  # torch tensor, without importing torch
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _np_out_dtype(dtype_obj) -> np.dtype:
    name = str(dtype_obj)
    if "bfloat16" in name:
        import ml_dtypes

        return np.dtype(ml_dtypes.bfloat16)
    if "float16" in name:
        return np.dtype(np.float16)
    return np.dtype(np.float32)


def quant_state_from_arrays(
    packed,
    absmax,
    shape,
    *,
    absmax32=None,
    offset=0.0,
    code2=None,
    dtype=np.float16,
    quant_type="nf4",
) -> QuantState:
    """Build a flat-layout QuantState from raw arrays.

    ``absmax`` may be uint8 (double-quantized; requires ``absmax32``) or
    fp32 (uncompressed statistics — the case where the reference's Triton
    path bails to its eager backend, ``kernel_optimized.py:166-167``; here it
    is just another storage flavor).
    """
    packed = _to_numpy(packed).astype(np.uint8).ravel()
    absmax = _to_numpy(absmax)
    shape = tuple(int(s) for s in shape)
    nblocks = -(-int(np.prod(shape)) // NF4_BLOCK)

    if absmax.dtype == np.uint8:
        assert absmax32 is not None, "uint8 absmax requires absmax32"
        return QuantState(
            packed=packed,
            absmax_u8=absmax.ravel()[:nblocks],
            absmax32=_to_numpy(absmax32).astype(np.float32).ravel(),
            offset=np.float32(offset),
            shape=shape,
            dtype=np.dtype(dtype),
            blocksize=NF4_BLOCK,
            blocksize2=ABSMAX_BLOCK,
            code2=None if code2 is None else _to_numpy(code2).astype(np.float32),
            quant_type=quant_type,
        )

    absmax_f = absmax.astype(np.float32).ravel()[:nblocks]
    return QuantState(
        packed=packed,
        absmax_u8=np.zeros(nblocks, dtype=np.uint8),
        absmax32=absmax_f,
        offset=np.float32(0.0),
        shape=shape,
        dtype=np.dtype(dtype),
        quant_type=quant_type,
    )


def quant_state_from_module(module) -> QuantState:
    """Extract a QuantState from a bitsandbytes-style ``Linear4bit`` module.

    Mirrors the attribute reads of the reference entry point
    (``kernel_optimized.py:117-127``).
    """
    weight = module.weight
    qs = weight.quant_state
    packed = weight.data if hasattr(weight, "data") else weight
    m = int(module.out_features)
    n = int(module.in_features)

    absmax = _to_numpy(qs.absmax)
    # bnb Linear4bit carries its codebook choice on quant_state.quant_type
    # ("fp4" is bnb's DEFAULT; the reference package silently assumed nf4).
    quant_type = str(getattr(qs, "quant_type", "nf4") or "nf4").lower()
    state2 = getattr(qs, "state2", None)
    absmax32 = _to_numpy(state2.absmax) if state2 is not None else None
    code2 = _to_numpy(state2.code) if state2 is not None and hasattr(state2, "code") else None
    offset = float(_to_numpy(qs.offset)) if getattr(qs, "offset", None) is not None else 0.0

    return quant_state_from_arrays(
        packed,
        absmax,
        (m, n),
        absmax32=absmax32,
        offset=offset,
        code2=code2,
        dtype=_np_out_dtype(getattr(qs, "dtype", np.float16)),
        quant_type=quant_type,
    )
