"""Vectorized 16-entry NF4 codebook evaluation for TPU vector units.

The reference GPU kernel evaluates the codebook with a linear 15-deep
``tl.where`` chain (reference ``kernel_optimized.py:63-94``).  A linear chain
serializes on the VPU; we use a *binary select tree* keyed on the nibble's
bits instead — the same 15 selects but at depth 4, so the VPU can overlap
them, and each select's operands at the leaf level are scalar constants
(broadcast for free).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..nf4.lut import NF4_CODE, get_code

__all__ = ["nf4_lookup", "nf4_lookup_gather", "nf4_table_row"]

def nf4_table_row(quant_type: str = "nf4") -> np.ndarray:
    """The 4-bit codebook (NF4 or FP4) padded into a (1, 128) fp32 row.

    Layout for the TPU's per-vreg dynamic-gather unit: entries 0..15 hold the
    codebook, the rest is zero (indices are always < 16).
    """
    row = np.zeros((1, 128), dtype=np.float32)
    row[0, :16] = get_code(quant_type)
    return row


def nf4_lookup_gather(nibble: jnp.ndarray, lut_row: jnp.ndarray) -> jnp.ndarray:
    """Hardware-gather codebook lookup (Mosaic ``tpu.dynamic_gather``).

    ``lut_row``: (1, 128) fp32 from :func:`nf4_table_row` (a kernel input —
    Pallas kernels cannot capture constants).  The gather unit permutes
    within one 128-lane vreg, so the lookup is applied per 128-lane chunk of
    the last dim; chunk slicing at 128 boundaries is vreg-aligned and free.
    """
    rows, cols = nibble.shape
    assert cols % 128 == 0, f"lane dim {cols} must be a multiple of 128"
    table = jnp.broadcast_to(lut_row[0:1, :], (rows, 128))
    if cols == 128:
        return jnp.take_along_axis(table, nibble, axis=1)
    chunks = [
        jnp.take_along_axis(table, nibble[:, c : c + 128], axis=1)
        for c in range(0, cols, 128)
    ]
    return jnp.concatenate(chunks, axis=1)


def nf4_lookup(nibble: jnp.ndarray, code=None) -> jnp.ndarray:
    """Map integer nibbles (0..15, any int dtype) to fp32 codebook values.

    ``code``: 16 Python floats (default: the NF4 table).  The operands are
    trace-time scalar constants, so the select tree works inside Pallas
    kernels and in plain jnp code for any 16-entry codebook.
    """
    _C = [float(v) for v in (NF4_CODE if code is None else code)]
    x = nibble.astype(jnp.int32)
    b0 = (x & 1) != 0
    b1 = (x & 2) != 0
    b2 = (x & 4) != 0
    b3 = (x & 8) != 0

    # Depth-1: select within adjacent code pairs (scalar operands).
    p0 = jnp.where(b0, _C[1], _C[0])
    p1 = jnp.where(b0, _C[3], _C[2])
    p2 = jnp.where(b0, _C[5], _C[4])
    p3 = jnp.where(b0, _C[7], _C[6])
    p4 = jnp.where(b0, _C[9], _C[8])
    p5 = jnp.where(b0, _C[11], _C[10])
    p6 = jnp.where(b0, _C[13], _C[12])
    p7 = jnp.where(b0, _C[15], _C[14])

    # Depth-2..4: merge up the tree.
    q0 = jnp.where(b1, p1, p0)
    q1 = jnp.where(b1, p3, p2)
    q2 = jnp.where(b1, p5, p4)
    q3 = jnp.where(b1, p7, p6)

    r0 = jnp.where(b2, q1, q0)
    r1 = jnp.where(b2, q3, q2)

    return jnp.where(b3, r1, r0).astype(jnp.float32)
