"""NF4 dequantization kernels (Pallas TPU + jnp reference backend).

Equivalent of the reference's kernel layer (``_nf4_dequantize_kernel_final``,
reference ``kernel_optimized.py:11-110``) redesigned for TPU:

* grid over (K-tile, M-tile, nibble-plane) instead of one program per
  64-element block;
* the adjacent-pair K-major layout (see ``nf4.format``) stores ``W^T[2j]``
  in the low nibble and ``W^T[2j+1]`` in the high nibble of byte row ``j``;
  plane 0 decodes the low nibbles (even K rows), plane 1 the high nibbles
  (odd K rows), and XLA interleaves the two contiguous plane outputs with a
  single reshape outside the kernel;
* both K rows of a byte share the same 64-value scale block, so scales are
  broadcast per 32 byte rows on the sublane dimension;
* scales arrive fully double-dequantized (fp32): all value math is fp32 and
  casts once at the end — bit-exact against the NumPy oracle;
* native output is ``W^T`` — every consumer of the reference dequantizes and
  immediately transposes (reference ``benchmark.py:62-65``), so the TPU
  build makes the transposed form the fast path.

The jnp backend implements identical math as pure XLA ops; it is the
cross-check oracle on CPU (the analog of the reference's eager-PyTorch
backend, ``kernel_optimized.py:208-314``, minus its per-block host loops).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..nf4.format import PackedNF4
from ..nf4.reference import NF4_BLOCK
from ..utils import env
from .lut_eval import nf4_lookup, nf4_lookup_gather, nf4_table_row

__all__ = ["dequantize", "dequantize_t", "dequantize_t_fast", "dequantize_fast"]

# Each byte row covers two K rows, so a 64-value scale block spans 32 byte
# rows of either nibble plane.
PAIR_BLOCK = NF4_BLOCK // 2


def _pick_tile(size: int, candidates) -> int:
    for c in candidates:
        if size % c == 0:
            return c
    raise ValueError(f"no tile in {candidates} divides {size}")


def _expand_scales_sublane(s: jnp.ndarray, block: int, rows: int) -> jnp.ndarray:
    """[rows//block, cols] -> [rows, cols] by repeating each row `block` times.

    Expressed as broadcast + reshape (a sublane-major merge) rather than
    ``jnp.repeat``, which lowers to an unsupported scatter in Pallas TPU.
    """
    nb, cols = s.shape
    expanded = jnp.broadcast_to(s[:, None, :], (nb, block, cols))
    return expanded.reshape(rows, cols)


def _make_dequant_kernel(lut_mode: str, code):
    def kernel(p_ref, s_ref, lut_ref, o_ref):
        b = p_ref[:].astype(jnp.int32)
        rows = b.shape[0]
        if lut_mode == "gather":
            v_lo = nf4_lookup_gather(b & 0xF, lut_ref[:])
            v_hi = nf4_lookup_gather((b >> 4) & 0xF, lut_ref[:])
        else:
            v_lo = nf4_lookup(b & 0xF, code)
            v_hi = nf4_lookup((b >> 4) & 0xF, code)
        sexp = _expand_scales_sublane(s_ref[:], PAIR_BLOCK, rows)
        # Interleave the planes on sublanes: K row 2j+h <- plane h row j.
        pair = jnp.stack([v_lo * sexp, v_hi * sexp], axis=1)
        o_ref[:] = pair.reshape(2 * rows, -1).astype(o_ref.dtype)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("dtype", "interpret", "lut_mode", "quant_type")
)
def _dequant_t_pallas(packed, scales, dtype, interpret, lut_mode, quant_type="nf4"):
    # Mosaic has no f16 storage type; emit fp32 from the kernel and let XLA
    # cast outside (bit-identical: fp32->fp16 is round-to-nearest-even in
    # both).  bf16 is TPU-native and written directly.
    kernel_dtype = jnp.float32 if dtype == jnp.float16 else dtype
    khalf, m_pad = packed.shape
    # Tile budget: the kernel's fp32 intermediates (nibbles/values/scales)
    # are 3 x 4B per element, so (512, 256) blocks stay well under the 16MB
    # scoped-VMEM limit with double buffering; (1024, 512) blows it.
    bks = _pick_tile(khalf, (512,))
    bo = _pick_tile(m_pad, (256, 128))
    grid = (khalf // bks, m_pad // bo)

    from ..nf4.lut import get_code

    out = pl.pallas_call(
        _make_dequant_kernel(lut_mode, tuple(float(v) for v in get_code(quant_type))),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bks, bo), lambda j, o: (j, o), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (bks // PAIR_BLOCK, bo), lambda j, o: (j, o), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, 128), lambda j, o: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (2 * bks, bo), lambda j, o: (j, o), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((2 * khalf, m_pad), kernel_dtype),
        interpret=interpret,
    )(packed, scales, jnp.asarray(nf4_table_row(quant_type)))
    return out.astype(dtype) if kernel_dtype != dtype else out


def _make_bytetable_dequant_kernel(nchunks: int):
    """bf16 fast dequant: one 256-entry byte->packed-bf16-pair word table
    (two 128-lane gathers + select), ``pltpu.bitcast`` expanding word row j
    into K rows 2j/2j+1 — the same decode as the fused matmul's fast path
    (`ops.matmul._make_bytetable_kernel`) minus the contraction."""

    def kernel(p_ref, s_ref, tlo_ref, thi_ref, o_ref):
        b = p_ref[:].astype(jnp.int32)  # (bks, bo)
        rows = b.shape[0]
        idx = b & 127
        sel_hi = b >= 128
        s_all = s_ref[:].astype(jnp.bfloat16)  # (2*bks/64, bo)
        nb = 2 * rows // NF4_BLOCK
        for c in range(nchunks):
            sl = slice(c * 128, (c + 1) * 128)
            g_lo = jnp.take_along_axis(tlo_ref[:], idx[:, sl], axis=1)
            g_hi = jnp.take_along_axis(thi_ref[:], idx[:, sl], axis=1)
            word = jnp.where(sel_hi[:, sl], g_hi, g_lo)
            wv = pltpu.bitcast(word, jnp.bfloat16)  # (2*bks, 128)
            o_ref[:, sl] = (
                wv.reshape(nb, NF4_BLOCK, 128) * s_all[:, sl][:, None, :]
            ).reshape(2 * rows, 128)

    return kernel


@functools.partial(jax.jit, static_argnames=("tiles", "interpret", "quant_type"))
def _dequant_t_pallas_fast(packed, scales, tiles, interpret, quant_type="nf4"):
    from .matmul import _byte_word_tables

    bks, bo = tiles
    khalf, m_pad = packed.shape
    grid = (khalf // bks, m_pad // bo)
    tlo, thi = _byte_word_tables(quant_type)
    tlo = jnp.broadcast_to(jnp.asarray(tlo), (bks, 128))
    thi = jnp.broadcast_to(jnp.asarray(thi), (bks, 128))

    return pl.pallas_call(
        _make_bytetable_dequant_kernel(bo // 128),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bks, bo), lambda j, o: (j, o), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (2 * bks // NF4_BLOCK, bo), lambda j, o: (j, o), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((bks, 128), lambda j, o: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bks, 128), lambda j, o: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (2 * bks, bo), lambda j, o: (j, o), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((2 * khalf, m_pad), jnp.bfloat16),
        interpret=interpret,
    )(packed, scales, tlo, thi)


def dequantize_t_fast(pw: PackedNF4) -> jax.Array:
    """Fast bf16 dequantize to ``W^T`` via the byte-table decode.

    NOT bit-exact vs the oracle: the NF4 code values and scales each round to
    bf16 before the multiply (double rounding, rel err <= ~2^-8 — an order of
    magnitude below NF4's own quantization cell).  Use :func:`dequantize_t`
    for the bit-exact contract; this path exists for bandwidth (the byte
    table decodes a whole byte per lane instead of evaluating two fp32
    select trees).  Output dtype is always bf16.
    """
    if pw.shards > 1:
        from ..nf4.format import chunk_views

        return jnp.concatenate(
            [dequantize_t_fast(v) for v in chunk_views(pw)], axis=0
        )
    if env.backend() != "pallas" or env.use_interpret():
        # The bitcast row-pair expansion is a Mosaic hardware semantic;
        # interpret/jnp modes route through the exact path (cast to bf16).
        out = _dequant_t_jnp(pw.packed, pw.scales, jnp.bfloat16, pw.quant_type)
    else:
        khalf, m_pad = pw.packed.shape
        # Swept on v5e (8192^2, interleaved best-of-rounds): (2048, 512) is
        # the most consistent winner at ~800+ GB/s output-effective; smaller
        # tiles only for shapes the big ones don't divide.
        bks = _pick_tile(khalf, (2048, 1024, 512))
        bo = _pick_tile(m_pad, (512, 256, 128))
        out = _dequant_t_pallas_fast(
            pw.packed, pw.scales, (bks, bo), env.use_interpret(), pw.quant_type
        )
    m, n = pw.shape
    m_pad, n_pad = pw.padded_shape
    if (m, n) != (m_pad, n_pad):
        out = out[:n, :m]
    return out


def dequantize_fast(pw: PackedNF4) -> jax.Array:
    """Fast bf16 dequantize to the logical [m, n] weight (see
    :func:`dequantize_t_fast` for the accuracy contract)."""
    return dequantize_t_fast(pw).T


@functools.partial(jax.jit, static_argnames=("dtype", "quant_type"))
def _dequant_t_jnp(packed, scales, dtype, quant_type="nf4"):
    from ..nf4.lut import get_code

    b = packed.astype(jnp.int32)
    khalf, m_pad = b.shape
    idx_t = jnp.stack([b & 0xF, (b >> 4) & 0xF], axis=1).reshape(2 * khalf, m_pad)
    vals = nf4_lookup(idx_t, tuple(float(v) for v in get_code(quant_type)))
    sexp = _expand_scales_sublane(scales, NF4_BLOCK, vals.shape[0])
    return (vals * sexp).astype(dtype)


# Below this many packed elements the XLA-fused path wins (kernel launch +
# grid overhead dominate); measured crossover ~2048^2 on v5e.  The size
# dispatch is the TPU analog of the reference's hardware dispatch
# (reference kernel_optimized.py:130-136 routes T4 to a different backend).
_PALLAS_MIN_ELEMS = 4 * 1024 * 1024


def dequantize_t(pw: PackedNF4, dtype=None) -> jax.Array:
    """Dequantize to ``W^T`` of logical shape [n, m] (the native fast path)."""
    if pw.shards > 1:
        from ..nf4.format import chunk_views

        return jnp.concatenate(
            [dequantize_t(v, dtype=dtype) for v in chunk_views(pw)], axis=0
        )
    dtype = jnp.dtype(dtype) if dtype is not None else pw.dtype
    use_pallas = env.backend() == "pallas" and (
        env.backend_choice() == "pallas" or pw.packed.size >= _PALLAS_MIN_ELEMS
    )
    if use_pallas:
        out = _dequant_t_pallas(
            pw.packed, pw.scales, dtype, env.use_interpret(), env.lut_mode(),
            pw.quant_type,
        )
    else:
        out = _dequant_t_jnp(pw.packed, pw.scales, dtype, pw.quant_type)
    m, n = pw.shape
    m_pad, n_pad = pw.padded_shape
    if (m, n) != (m_pad, n_pad):
        out = out[:n, :m]
    return out


def dequantize(pw: PackedNF4, dtype=None) -> jax.Array:
    """Dequantize to the logical [m, n] weight (reference-parity orientation).

    Mirrors the reference entry point's output contract
    (``triton_dequantize_nf4 -> Tensor[m, n]``, reference
    ``kernel_optimized.py:189``); the transpose is a plain XLA op on top of
    the native transposed kernel.
    """
    return dequantize_t(pw, dtype=dtype).T
