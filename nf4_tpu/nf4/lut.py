"""Code tables for NF4 and the bitsandbytes dynamic 8-bit absmax codebook.

The 16-entry NF4 (4-bit NormalFloat) table is a fixed constant: the quantiles
of a standard normal distribution, normalized to [-1, 1].  The values here are
the exact fp32 constants used by bitsandbytes (and mirrored by the reference
GPU package at ``kernel_optimized.py:234-239``).

The 256-entry *dynamic* codebook is what bitsandbytes uses to double-quantize
the per-block absmax statistics (``quant_state.state2.code``).  The reference
GPU package approximates this with a linear ``absmax/127`` scale
(``kernel_optimized.py:45``); we implement the real thing so dequantization is
bit-exact against bitsandbytes.
"""

from __future__ import annotations

import functools

import numpy as np

__all__ = [
    "NF4_CODE",
    "FP4_CODE",
    "nf4_code",
    "get_code",
    "fp4_order_and_mids",
    "dynamic_code",
    "code_midpoints",
]

# The fixed NF4 codebook, index 0..15 -> fp32 value.
NF4_CODE = np.array(
    [
        -1.0,
        -0.6961928009986877,
        -0.5250730514526367,
        -0.39491748809814453,
        -0.28444138169288635,
        -0.18477343022823334,
        -0.09105003625154495,
        0.0,
        0.07958029955625534,
        0.16093020141124725,
        0.24611230194568634,
        0.33791524171829224,
        0.44070982933044434,
        0.5626170039176941,
        0.7229568362236023,
        1.0,
    ],
    dtype=np.float32,
)


def nf4_code() -> np.ndarray:
    """Return the 16-entry NF4 codebook as fp32."""
    return NF4_CODE.copy()


# The fixed FP4 codebook (bitsandbytes ``quant_type="fp4"`` — ITS DEFAULT):
# a 4-bit e2m1 float, sign in bit 3.  The values are the EXACT decimal
# literals of bnb's dDequantizeFP4Tree (note 0.00520833f is ~7 ulps below
# fp32(1/192) — bnb's literal, kept verbatim for bit parity).  Index 0..7
# are the non-negative values, 8..15 their negations.  Unlike NF4 this
# table is NOT monotone in the index — nearest-code quantization and table
# lookups are index-order-agnostic, but anything assuming sorted codes
# must go through code_midpoints' argsort.
FP4_CODE = np.array(
    [
        0.0,
        0.00520833,  # e2m1 subnormal (0b0001); bnb's literal, not 1/192
        0.66666667,
        1.0,
        0.33333333,
        0.5,
        0.16666667,
        0.25,
        -0.0,
        -0.00520833,
        -0.66666667,
        -1.0,
        -0.33333333,
        -0.5,
        -0.16666667,
        -0.25,
    ],
    dtype=np.float32,
)

_CODES = {"nf4": NF4_CODE, "fp4": FP4_CODE}


def fp4_order_and_mids(code):
    """Sign-magnitude quantization constants for a 16-entry fp4-layout
    table: ``(order, mids)`` where ``order[p]`` is the table index of the
    p-th smallest non-negative magnitude and ``mids`` are the 7 decision
    midpoints between sorted magnitudes.  Quantize as
    ``order[#{mids < |x|}] + 8*(x < 0)`` — the single definition all
    three quantizer methods (oracle / native / device) share so their
    byte-identical contract cannot drift."""
    code = np.asarray(code, dtype=np.float32)
    mags = code[:8]
    assert np.array_equal(-mags, code[8:]) and (mags >= 0).all(), (
        "non-monotone codebooks must be sign-magnitude (fp4 layout)"
    )
    order = np.argsort(mags, kind="stable").astype(np.uint8)
    return order, code_midpoints(mags[order])


def get_code(quant_type: str) -> np.ndarray:
    """The 16-entry 4-bit codebook for ``quant_type`` ("nf4" | "fp4")."""
    try:
        return _CODES[quant_type]
    except KeyError:
        raise ValueError(
            f"quant_type={quant_type!r}; expected one of {sorted(_CODES)}"
        ) from None


@functools.lru_cache(maxsize=None)
def _dynamic_code_cached(signed: bool, max_exponent_bits: int, total_bits: int) -> bytes:
    """Build the bitsandbytes 'dynamic tree' codebook.

    Dynamic tree quantization: an indicator-bit exponent (number of leading
    sign-stream bits encodes a power-of-ten magnitude) followed by linear
    fraction bits.  For the default (signed, 7, 8) this yields the 256-entry
    fp32 table bitsandbytes stores as ``quant_state.state2.code``.
    """
    data: list[float] = []
    non_sign_bits = total_bits - 1
    additional_items = 2 ** (non_sign_bits - max_exponent_bits) - 1
    for i in range(max_exponent_bits):
        if signed:
            fraction_items = int(2 ** (i + non_sign_bits - max_exponent_bits) + 1)
        else:
            fraction_items = int(2 ** (i + non_sign_bits - max_exponent_bits + 1) + 1)
        boundaries = np.linspace(0.1, 1.0, fraction_items)
        means = (boundaries[:-1] + boundaries[1:]) / 2.0
        scale = 10 ** (-(max_exponent_bits - 1) + i)
        data += (scale * means).tolist()
        if signed:
            data += (-scale * means).tolist()

    if additional_items > 0:
        boundaries = np.linspace(0.1, 1.0, additional_items + 1)
        means = (boundaries[:-1] + boundaries[1:]) / 2.0
        scale = 10 ** (-(max_exponent_bits - 1) + max_exponent_bits - 1)
        data += (scale * means).tolist()
        if signed:
            data += (-scale * means).tolist()

    data.append(0.0)
    data.append(1.0)

    gap = 2**total_bits - len(data)
    assert gap >= 0, (len(data), total_bits)
    data += [0.0] * gap

    data.sort()
    return np.asarray(data, dtype=np.float32).tobytes()


def dynamic_code(
    signed: bool = True, max_exponent_bits: int = 7, total_bits: int = 8
) -> np.ndarray:
    """The 256-entry dynamic codebook used for absmax double quantization."""
    buf = _dynamic_code_cached(signed, max_exponent_bits, total_bits)
    return np.frombuffer(buf, dtype=np.float32).copy()


def code_midpoints(code: np.ndarray) -> np.ndarray:
    """Decision thresholds between adjacent codebook entries.

    Quantization maps ``x`` to index ``i`` iff ``mid[i-1] < x <= mid[i]``
    (strictly-greater semantics at the threshold, matching the comparison
    direction of the bitsandbytes quantizer trees; exact fp32 threshold
    literals may differ in the last ulp, which only affects inputs landing
    exactly on a midpoint).
    """
    code = np.asarray(code, dtype=np.float32)
    return ((code[:-1].astype(np.float64) + code[1:].astype(np.float64)) / 2.0).astype(
        np.float32
    )
