"""Device-accelerated NF4 quantization (the production load path).

``nf4.reference.quantize_nf4`` is the bit-exact NumPy oracle; at ~25M
elements/s (np.searchsorted-bound) it takes minutes for billion-parameter
models.  This module runs the same math on the accelerator:

* per-64-block absmax: exact (max-reduce is exact in fp32);
* absmax statistics (offset, dynamic-codebook compression): computed on the
  HOST with the oracle's own helpers — the fp64 mean and the small
  searchsorted are cheap, and the resulting ``scales`` are **bit-identical**
  to the oracle's;
* code assignment ``#{midpoints < x/absmax}`` and the pair-layout packing:
  ONE fused jit per weight shape (op-by-op dispatch would trigger a
  compilation per eager op, which dwarfs the compute on remote-compile
  runtimes).  The fp32 divide on TPU is accurate to ~1 ulp but not
  guaranteed correctly rounded, so for roughly one weight in 10^6 whose
  normalized value lands within 1 ulp of a codebook midpoint the chosen
  code can differ from the oracle by one step (well inside NF4's own
  quantization error).  Tests bound this mismatch; use the oracle when
  byte-for-byte reproducibility of the packed codes matters more than load
  time.

``quantize_for_tpu(..., method="auto")`` in ``nf4.format`` dispatches here
for large tensors on an accelerator.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .lut import NF4_CODE, code_midpoints, get_code
from .reference import NF4_BLOCK, quantize_blockwise_u8

__all__ = ["quantize_for_tpu_device"]


@functools.partial(
    jax.jit, static_argnames=("m_pad", "n_chunk_pad", "shards", "quant_type")
)
def _pack_on_device(
    w, *, m_pad: int, n_chunk_pad: int, shards: int, quant_type: str = "nf4"
):
    """Fused absmax + code assignment + pair-layout packing.

    Returns (packed uint8 [shards * n_chunk_pad/2, m_pad], absmax fp32
    [numel/64] over the flat row-major stream — the bnb block order).
    """
    m, n = w.shape
    # Upcast INSIDE the jit: callers pass bf16/f16 checkpoints as-is so the
    # host->device transfer moves 2 bytes/element, not 4 (the upcast to
    # fp32 is exact, matching bnb's own from-half quantization).
    x_blocks = w.astype(jnp.float32).reshape(-1, NF4_BLOCK)
    absmax = jnp.abs(x_blocks).max(axis=1)
    scale = jnp.where(absmax > 0, absmax, jnp.float32(1.0))

    norm = x_blocks / scale[:, None]
    code_table = get_code(quant_type)
    if quant_type == "nf4":
        mids = code_midpoints(code_table)  # host constants
        codes = jnp.zeros(norm.shape, jnp.uint8)
        for mid in mids:  # 15 fused compare-adds, one pass
            codes = codes + (norm > np.float32(mid)).astype(jnp.uint8)
    else:
        # Sign-magnitude table (fp4): nearest non-negative magnitude by the
        # same strict-greater midpoint rule, remapped from sorted-magnitude
        # position to the table's index order, plus the sign bit for x < 0
        # (lut.fp4_order_and_mids — the single scheme the oracle and the
        # native quantizer share).
        from .lut import fp4_order_and_mids

        order, mids = fp4_order_and_mids(code_table)  # host constants
        a = jnp.abs(norm)
        pos = jnp.zeros(norm.shape, jnp.uint8)
        for mid in mids:
            pos = pos + (a > np.float32(mid)).astype(jnp.uint8)
        codes = jnp.asarray(order)[pos] + jnp.where(
            norm < 0, jnp.uint8(8), jnp.uint8(0)
        )
    codes = codes.reshape(m, n)

    n_chunk = n // shards
    packed_chunks = []
    for s in range(shards):
        idx_c = codes[:, s * n_chunk : (s + 1) * n_chunk]
        idx_c = jnp.pad(idx_c, ((0, m_pad - m), (0, n_chunk_pad - n_chunk)))
        idx_t = idx_c.T
        lo = idx_t[0::2]
        hi = idx_t[1::2]
        packed_chunks.append(((hi << 4) | (lo & 0xF)).astype(jnp.uint8))
    packed = (
        jnp.concatenate(packed_chunks, axis=0) if shards > 1 else packed_chunks[0]
    )
    return packed, absmax


def quantize_for_tpu_device(
    w, dtype=jnp.bfloat16, shards: int = 1, quant_type: str = "nf4"
):
    """Quantize a dense [m, n] weight to :class:`PackedNF4` on the device.

    Matches :func:`nf4.format.quantize_for_tpu` + the oracle semantics
    (flat bnb block streams, double-quantized statistics with dynamic
    codebook and offset); see the module docstring for the one documented
    deviation (rare 1-ulp code-boundary ties).
    """
    from .format import PackedNF4, pad_to
    from .reference import QuantState, dequantize_absmax

    w = jnp.asarray(w)  # keep compact float dtypes for the transfer
    if w.dtype not in (jnp.float32, jnp.bfloat16, jnp.float16):
        w = w.astype(jnp.float32)
    m, n = w.shape
    assert n % NF4_BLOCK == 0, f"in_features must be a multiple of 64, got {n}"
    assert n % (shards * NF4_BLOCK) == 0

    n_chunk = n // shards
    m_pad = pad_to(m, 128)
    n_chunk_pad = pad_to(n_chunk, 1024)
    n_pad = n_chunk_pad * shards

    packed, absmax = _pack_on_device(
        w, m_pad=m_pad, n_chunk_pad=n_chunk_pad, shards=shards,
        quant_type=quant_type,
    )

    # Statistics on host with the oracle's own code (bit-exact scales); the
    # absmax stream is numel/64 fp32 — small.
    absmax_np = np.asarray(jax.device_get(absmax), np.float32)
    offset = np.float32(absmax_np.mean(dtype=np.float64))
    absmax_u8, absmax32 = quantize_blockwise_u8(absmax_np - offset)
    state_for_scales = QuantState(
        packed=np.zeros(0, np.uint8),  # not used by dequantize_absmax
        absmax_u8=absmax_u8,
        absmax32=absmax32,
        offset=offset,
        shape=(m, n),
        dtype=np.dtype(np.float16),
    )
    scales_grid = dequantize_absmax(state_for_scales).reshape(m, n // NF4_BLOCK)

    # Scales array is m*n/16 bytes — pad/transpose on host, one transfer.
    scale_chunks = []
    for s in range(shards):
        sc = np.zeros((m_pad, n_chunk_pad // NF4_BLOCK), np.float32)
        sc[:m, : n_chunk // NF4_BLOCK] = scales_grid[
            :, s * (n_chunk // NF4_BLOCK) : (s + 1) * (n_chunk // NF4_BLOCK)
        ]
        scale_chunks.append(sc.T)
    scales = jnp.asarray(np.concatenate(scale_chunks, axis=0))

    return PackedNF4(
        packed=packed,
        scales=scales,
        shape=(m, n),
        padded_shape=(m_pad, n_pad),
        dtype=jnp.dtype(dtype),
        shards=shards,
        quant_type=quant_type,
    )
