"""Vectorized 16-entry NF4 codebook evaluation for TPU vector units.

The reference GPU kernel evaluates the codebook with a linear 15-deep
``tl.where`` chain (reference ``kernel_optimized.py:63-94``).  A linear chain
serializes on the VPU; we use a *binary select tree* keyed on the nibble's
bits instead — the same 15 selects but at depth 4, so the VPU can overlap
them, and each select's operands at the leaf level are scalar constants
(broadcast for free).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..nf4.lut import NF4_CODE

__all__ = ["nf4_lookup"]

_C = [float(v) for v in NF4_CODE]


def nf4_lookup(nibble: jnp.ndarray) -> jnp.ndarray:
    """Map integer nibbles (0..15, any int dtype) to fp32 NF4 values.

    Works inside Pallas kernels and in plain jnp code.
    """
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
