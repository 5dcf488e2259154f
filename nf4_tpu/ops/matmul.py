"""Fused NF4 dequant-matmul: ``y = x @ W^T`` with W staying packed in HBM.

This is the north-star kernel the reference package never had (it always
materialized the fp16 weight to global memory and then ran a separate
matmul, reference ``benchmark.py:62-65``).  Here the packed uint8 bytes are
DMA'd HBM->VMEM, dequantized inside the kernel, and fed straight to the MXU
— the dequantized weight never round-trips to HBM, so the memory traffic per
step is the 4-bit weight stream plus scales instead of the fp16 tensor (a 4x
reduction on the dominant stream).

Two kernels share the adjacent-pair K-major layout (see ``nf4.format``):

* **bf16 fast path** (``_make_bytetable_kernel``): dequantizes a whole byte
  per lane with ONE pair of 128-lane table gathers — the 256-entry table
  holds, for every byte value, a 32-bit word packing both nibbles'
  dequantized bf16 bit patterns; ``pltpu.bitcast`` then expands word row
  ``j`` to value rows ``2j``/``2j+1``, which is exactly the layout's K
  order.  No nibble shifts (Mosaic cannot shift i8/i16 vectors), no
  interleave, one MXU contraction per tile.  Weight values round through
  bf16 before the multiply — within the 2e-2 contract of the bf16 path and
  ~10x smaller than NF4's own quantization cell.
* **exact path** (fp32/fp16 activations): evaluates the codebook as an fp32
  select tree per nibble plane and multiplies by fp32 scales, bit-matching
  the jnp reference; activations are pre-split into even/odd K columns by
  XLA so each plane contracts contiguously.

Grid: (batch-tile, out-tile, K-tile) with K innermost; a fp32 VMEM scratch
accumulates partial products across K-tiles (standard Pallas matmul
pipelining).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..nf4.format import PackedNF4, pad_to
from ..nf4.lut import NF4_CODE, get_code
from ..nf4.reference import NF4_BLOCK
from ..utils import env
from .dequant import PAIR_BLOCK, _dequant_t_jnp, _expand_scales_sublane, _pick_tile
from .lut_eval import nf4_lookup

__all__ = ["nf4_matmul"]


@functools.lru_cache(maxsize=None)
def _byte_word_tables(quant_type: str = "nf4"):
    """The 256-entry byte -> packed-bf16-pair word table, split into two
    (1, 128) i32 rows for the per-vreg gather unit (indices must be < 128).

    T[byte] = bits(LUT[hi_nibble]) << 16 | bits(LUT[lo_nibble]); the bitcast
    of the gathered word yields the low half at even K rows and the high
    half at odd K rows, matching the pair layout.  ``quant_type`` picks the
    codebook (NF4 or FP4) the nibbles index.
    """
    import ml_dtypes

    bits = (
        np.asarray(get_code(quant_type), np.float32)
        .astype(ml_dtypes.bfloat16)
        .view(np.uint16)
    )
    t = np.zeros(256, np.uint32)
    for byte in range(256):
        t[byte] = (np.uint32(bits[byte >> 4]) << 16) | np.uint32(bits[byte & 0xF])
    t = t.view(np.int32)
    return t[:128].reshape(1, 128), t[128:].reshape(1, 128)


def _make_bytetable_kernel(nchunks: int):
    def kernel(x_ref, p_ref, s_ref, tlo_ref, thi_ref, o_ref, acc_ref):
        ik = pl.program_id(2)
        nk = pl.num_programs(2)

        @pl.when(ik == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        b = p_ref[:].astype(jnp.int32)  # (bks, bo)
        rows = b.shape[0]
        idx = b & 127
        sel_hi = b >= 128
        xt = x_ref[:]  # (bm, 2*bks)
        s_all = s_ref[:].astype(jnp.bfloat16)  # (2*bks/64, bo)
        nb = 2 * rows // NF4_BLOCK
        for c in range(nchunks):
            sl = slice(c * 128, (c + 1) * 128)
            g_lo = jnp.take_along_axis(tlo_ref[:], idx[:, sl], axis=1)
            g_hi = jnp.take_along_axis(thi_ref[:], idx[:, sl], axis=1)
            word = jnp.where(sel_hi[:, sl], g_hi, g_lo)
            wv = pltpu.bitcast(word, jnp.bfloat16)  # (2*bks, 128)
            # Per-64-row scale as a 3D broadcast (no materialized expansion).
            wv = (
                wv.reshape(nb, NF4_BLOCK, 128) * s_all[:, sl][:, None, :]
            ).reshape(2 * rows, 128)
            acc_ref[:, sl] += jnp.dot(xt, wv, preferred_element_type=jnp.float32)

        @pl.when(ik == nk - 1)
        def _store():
            o_ref[:] = acc_ref[:].astype(o_ref.dtype)

    return kernel


def _make_exact_kernel(code=None):
    def kernel(xe_ref, xo_ref, p_ref, s_ref, o_ref, acc_ref):
        ik = pl.program_id(2)
        nk = pl.num_programs(2)

        @pl.when(ik == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        b = p_ref[:].astype(jnp.int32)
        rows = b.shape[0]
        v_lo = nf4_lookup(b & 0xF, code)  # even K rows, fp32
        v_hi = nf4_lookup((b >> 4) & 0xF, code)  # odd K rows, fp32
        sexp = _expand_scales_sublane(s_ref[:], PAIR_BLOCK, rows)
        acc_ref[:] += jnp.dot(
            xe_ref[:],
            v_lo * sexp,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        acc_ref[:] += jnp.dot(
            xo_ref[:],
            v_hi * sexp,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

        @pl.when(ik == nk - 1)
        def _store():
            o_ref[:] = acc_ref[:].astype(o_ref.dtype)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("out_dtype", "tiles", "interpret", "quant_type")
)
def _matmul_pallas_bf16(
    x_pad, packed, scales, out_dtype, tiles, interpret, quant_type="nf4"
):
    """Byte-table fast path: bf16 activations; fp32 accumulation stored as
    bf16 or fp32 (fp16 rides fp32 — Mosaic has no f16 type)."""
    bm, bks, bo = tiles
    b_pad = x_pad.shape[0]
    khalf, m_pad = packed.shape
    nb, no, nk = b_pad // bm, m_pad // bo, khalf // bks
    kernel_out = jnp.float32 if out_dtype == jnp.float16 else out_dtype

    tlo, thi = _byte_word_tables(quant_type)
    tlo = jnp.broadcast_to(jnp.asarray(tlo), (bks, 128))
    thi = jnp.broadcast_to(jnp.asarray(thi), (bks, 128))

    out = pl.pallas_call(
        _make_bytetable_kernel(bo // 128),
        grid=(nb, no, nk),
        in_specs=[
            pl.BlockSpec((bm, 2 * bks), lambda b, o, k: (b, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bks, bo), lambda b, o, k: (k, o), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (2 * bks // NF4_BLOCK, bo), lambda b, o, k: (k, o), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((bks, 128), lambda b, o, k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bks, 128), lambda b, o, k: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bo), lambda b, o, k: (b, o), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, m_pad), kernel_out),
        scratch_shapes=[pltpu.VMEM((bm, bo), jnp.float32)],
        interpret=interpret,
    )(x_pad, packed, scales, tlo, thi)
    return out.astype(out_dtype) if kernel_out != out_dtype else out


@functools.partial(
    jax.jit, static_argnames=("out_dtype", "tiles", "interpret", "quant_type")
)
def _matmul_pallas_exact(
    x_pad, packed, scales, out_dtype, tiles, interpret, quant_type="nf4"
):
    """Exact path: fp32 dequant math, fp32 accumulation (f16 rides fp32 —
    Mosaic has no f16 type)."""
    bm, bks, bo = tiles
    b_pad = x_pad.shape[0]
    khalf, m_pad = packed.shape
    nb, no, nk = b_pad // bm, m_pad // bo, khalf // bks

    kernel_out = jnp.float32 if out_dtype == jnp.float16 else out_dtype
    if x_pad.dtype in (jnp.float16, jnp.bfloat16):
        # Exact path always contracts in fp32 (lossless upcast).
        x_pad = x_pad.astype(jnp.float32)
    x_even = x_pad[:, 0::2]  # XLA-side split; activations are small
    x_odd = x_pad[:, 1::2]

    out = pl.pallas_call(
        _make_exact_kernel(tuple(float(v) for v in get_code(quant_type))),
        grid=(nb, no, nk),
        in_specs=[
            pl.BlockSpec((bm, bks), lambda b, o, k: (b, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, bks), lambda b, o, k: (b, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bks, bo), lambda b, o, k: (k, o), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (bks // PAIR_BLOCK, bo), lambda b, o, k: (k, o), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((bm, bo), lambda b, o, k: (b, o), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, m_pad), kernel_out),
        scratch_shapes=[pltpu.VMEM((bm, bo), jnp.float32)],
        interpret=interpret,
    )(x_even, x_odd, packed, scales)
    return out.astype(out_dtype) if kernel_out != out_dtype else out


def _pick_bm(b_pad: int) -> int:
    """Batch-tile size balancing redundant decode against padding waste.

    The kernel re-decodes every weight tile once per batch tile, so large
    batches want tall bm (prefill: bm=512 measured 2.9x faster than bm=128
    at B=2048 on v5e); but a tall tile over-pads small batches with zero
    rows of MXU work.  One full-weight decode costs about as much VPU time
    as ~384 rows of MXU work at the shapes that matter, so minimize
    ``nb * 384 + nb * bm`` (both in row-equivalents).
    """
    best = None
    for c in (512, 256, 128, 64, 32, 16, 8):
        nb = -(-b_pad // c)
        cost = nb * 384 + nb * c
        if best is None or cost < best[0]:
            best = (cost, c)
    return best[1]


@functools.partial(jax.jit, static_argnames=("out_dtype", "quant_type"))
def _matmul_jnp(x_pad, packed, scales, out_dtype, quant_type="nf4"):
    wt = _dequant_t_jnp(packed, scales, jnp.float32, quant_type)
    return jnp.dot(
        x_pad.astype(jnp.float32),
        wt,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # accuracy-reference path
    ).astype(out_dtype)


def nf4_matmul(x: jax.Array, pw: PackedNF4, out_dtype=None) -> jax.Array:
    """Compute ``x @ W^T`` for packed NF4 ``W`` of logical shape [m, n].

    ``x`` may have any leading batch shape with trailing dim ``n``; the
    result has the same leading shape with trailing dim ``m``.

    Differentiable with respect to ``x`` (the packed weight is frozen —
    the QLoRA contract): the backward pass dequantizes ``W`` once and
    computes ``dx = g @ W`` in fp32.  The Pallas forward kernels have no
    VJP of their own, so this is routed through :func:`jax.custom_vjp`.
    """
    m, n = pw.shape
    if pw.shards > 1:
        from ..nf4.format import chunk_views

        n_chunk = n // pw.shards
        parts = [
            nf4_matmul(
                x[..., s * n_chunk : (s + 1) * n_chunk], v, out_dtype=out_dtype
            )
            for s, v in enumerate(chunk_views(pw))
        ]
        return sum(parts[1:], parts[0])
    out_dtype = jnp.dtype(out_dtype) if out_dtype is not None else jnp.dtype(x.dtype)
    return _nf4_matmul_vjp(x, pw, out_dtype, jnp.dtype(x.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _nf4_matmul_vjp(x, pw, out_dtype, x_dtype):
    return _nf4_matmul_impl(x, pw, out_dtype)


def _nf4_matmul_fwd(x, pw, out_dtype, x_dtype):
    return _nf4_matmul_impl(x, pw, out_dtype), pw


def _nf4_matmul_bwd(out_dtype, x_dtype, pw, g):
    # y = x @ W^T  =>  dx = g @ W.  Dequantize W exactly (fp32 — matches
    # the jnp reference path's weight values bit-for-bit) and contract in
    # fp32; one dequant per backward is the standard QLoRA cost model
    # (the base weight stays packed in HBM between steps).
    from .dequant import dequantize_t

    wt = dequantize_t(pw, dtype=jnp.float32)  # [n, m]
    dx = jnp.dot(
        g.astype(jnp.float32),
        wt.T,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(x_dtype)
    # The packed weight gets a zero cotangent: float0 for the integer
    # bytes (the JAX convention for non-differentiable integer leaves),
    # fp32 zeros for the scales.
    dpw = pw.replace(
        packed=np.zeros(pw.packed.shape, dtype=jax.dtypes.float0),
        scales=jnp.zeros_like(pw.scales),
    )
    return dx, dpw


_nf4_matmul_vjp.defvjp(_nf4_matmul_fwd, _nf4_matmul_bwd)


def _nf4_matmul_impl(x: jax.Array, pw: PackedNF4, out_dtype) -> jax.Array:
    """Single-shard dispatch body of :func:`nf4_matmul` (fwd only)."""
    m, n = pw.shape
    m_pad, n_pad = pw.padded_shape
    *batch, xn = x.shape
    assert xn == n, f"x trailing dim {xn} != in_features {n}"

    B = 1
    for d in batch:
        B *= d
    x2 = x.reshape(B, n)

    bm_unit = 16 if x.dtype in (jnp.bfloat16, jnp.float16) else 8
    b_pad = pad_to(max(B, 1), bm_unit)

    interpret = env.use_interpret()
    # The byte-table kernel's bitcast row-pair expansion is a hardware
    # (Mosaic) semantic; route interpret mode through the exact kernel.
    use_fast = env.backend() == "pallas" and not interpret and x2.dtype == jnp.bfloat16
    if env.backend() == "pallas":
        bm = _pick_bm(b_pad)
        b_pad = pad_to(b_pad, bm)
        if use_fast:
            # Swept on v5e (benchmarks/tile_sweep.py + the round-2 prefill
            # lab): larger K/out tiles win (fewer grid steps); (1024, 512)
            # best at the headline decode shape AND at bm=512 prefill
            # (164 TFLOPs at B=2048, within 10% of a dense bf16 matmul).
            # Decode-sized weights (a few MB) are grid-overhead bound: widen
            # the out tile as far as VMEM comfortably allows (bm <= 128 only
            # — wide bo + tall bm together blow the accumulator budget).
            khalf = n_pad // 2
            bks = _pick_tile(khalf, (1024, 512))
            # Wide-out-tile regime: small weights (grid-overhead bound) and
            # decode batches (bm <= 32; measured ~10-15% faster at the
            # Llama-3-8B MLP shapes with bo=1024/2048 — fewer grid steps).
            if bm <= 128 and (khalf * m_pad <= 16 * 2**20 or bm <= 32):
                bo = next(
                    c
                    for c in (2048, 1024, 512, 256, 128)
                    if m_pad % c == 0 and bks * c <= 4 * 2**20
                )
            else:
                bo = _pick_tile(m_pad, (512, 256, 128))
        else:
            bks = _pick_tile(n_pad // 2, (512,))
            bo = _pick_tile(m_pad, (256, 128))
        override = env.matmul_tile_override()
        if override:
            bm, bks, bo = override
            b_pad = pad_to(b_pad, bm)
        if b_pad != B or n_pad != n:
            x2 = jnp.pad(x2, ((0, b_pad - B), (0, n_pad - n)))
        if use_fast:
            y = _matmul_pallas_bf16(
                x2, pw.packed, pw.scales, out_dtype, (bm, bks, bo), interpret,
                pw.quant_type,
            )
        else:
            y = _matmul_pallas_exact(
                x2, pw.packed, pw.scales, out_dtype, (bm, bks, bo), interpret,
                pw.quant_type,
            )
    else:
        if b_pad != B or n_pad != n:
            x2 = jnp.pad(x2, ((0, b_pad - B), (0, n_pad - n)))
        y = _matmul_jnp(x2, pw.packed, pw.scales, out_dtype, pw.quant_type)

    y = y[:B, :m]
    return y.reshape(*batch, m)
