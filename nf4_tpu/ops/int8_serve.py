"""int8-recode serving mode: trade 2x weight bytes for near-zero decode work.

The NF4 byte-table kernel sustains ~140 GB/s of packed-weight stream on v5e
because the per-element table gathers are VPU-bound (PERF_NOTES.md).  This
mode re-stores an NF4 weight as ``W8 = round(127 * NF4[code])`` int8 with
``scales' = scales / 127``: dequantization becomes a single int->bf16
convert plus the usual per-block scale multiply, so the kernel runs at the
HBM rate of the (2x larger) int8 stream — a net ~2.5x decode speedup over
the 4-bit path at measured efficiencies.

Accuracy: weights remain ON the NF4 grid up to the int8 rounding of the
codebook, a <=0.4% relative perturbation — the same order as rounding the
dequantized weight to bf16, and ~10x below NF4's own quantization cell.
The recode is applied AFTER exact NF4 quantization, so checkpoints and the
quality-critical paths stay bit-exact 4-bit; this is purely a serving-time
representation (enable via ``recode_int8`` / ``Engine`` or per-weight with
:func:`recode_int8_weight`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..nf4.format import PackedNF4
from ..nf4.lut import get_code
from ..nf4.reference import NF4_BLOCK
from ..utils import env
from .dequant import _pick_tile

__all__ = ["PackedInt8", "recode_int8_weight", "int8_matmul"]


@struct.dataclass
class PackedInt8:
    """K-major int8 recode of a 4-bit weight (a JAX pytree).

    ``values[k, r]`` = round(127 * CODE[code of W^T[k, r]]) where CODE is
    the source weight's codebook (NF4 or FP4); ``scales`` has the 4-bit
    layout divided by 127, so ``W^T = values * scales_expanded``.
    """

    values: jax.Array  # int8 [n_pad, m_pad]
    scales: jax.Array  # fp32 [n_pad//64, m_pad]
    shape: tuple = struct.field(pytree_node=False)
    padded_shape: tuple = struct.field(pytree_node=False)
    dtype: jnp.dtype = struct.field(pytree_node=False)
    # K rows are stored as `shards` independently padded chunks (inherited
    # from the source PackedNF4); activations must be padded per chunk.
    shards: int = struct.field(pytree_node=False, default=1)

    @property
    def out_features(self) -> int:
        return self.shape[0]

    @property
    def in_features(self) -> int:
        return self.shape[1]

    @property
    def nbytes(self) -> int:
        return self.values.size + self.scales.size * 4


@functools.partial(jax.jit, static_argnames=("quant_type",))
def _recode_kernelless(packed, scales, quant_type="nf4"):
    """XLA-side conversion (one-time, at serving setup)."""
    lut8 = jnp.asarray(
        np.round(127.0 * np.asarray(get_code(quant_type), np.float64)).astype(np.int8)
    )
    b = packed.astype(jnp.int32)
    *lead, khalf, m_pad = b.shape
    codes = jnp.stack([b & 0xF, (b >> 4) & 0xF], axis=-2).reshape(
        *lead, 2 * khalf, m_pad
    )
    values = lut8[codes]
    return values, scales * jnp.float32(1.0 / 127.0)


def recode_int8_weight(pw: PackedNF4) -> PackedInt8:
    """Convert a packed NF4 weight to the int8 serving representation.

    Works for stacked ([L, ...]) and K-chunked (``shards > 1``) weights
    alike: the pair interleave distributes over chunk concatenation (chunk
    c's byte row j sits at global row c*half + j and expands to K rows
    c*chunk + 2j / 2j+1 — exactly the global K order).
    """
    packed, sc = pw.packed, pw.scales
    if packed.ndim >= 3:
        # Stacked layers: convert one layer at a time — the int32 code
        # intermediates of a whole stacked 8B tensor would blow HBM.
        values, scales = jax.lax.map(
            lambda ps: _recode_kernelless(ps[0], ps[1], pw.quant_type),
            (packed, sc),
        )
    elif packed.size > 32 * 2**20:
        # Large single weight (e.g. a 128k-vocab lm_head): chunk the byte
        # rows so the int32 code intermediates stay bounded.  Chunks must
        # hold whole scale rows (32 byte rows = 64 K rows = 1 scale row).
        kh = packed.shape[0]
        chunks = next(c for c in (16, 8, 4, 2, 1) if (kh // c) % 32 == 0 and kh % c == 0)
        p3 = packed.reshape(chunks, kh // chunks, -1)
        s3 = sc.reshape(chunks, sc.shape[0] // chunks, -1)
        v3, sc3 = jax.lax.map(
            lambda ps: _recode_kernelless(ps[0], ps[1], pw.quant_type), (p3, s3)
        )
        values = v3.reshape(2 * kh, -1)
        scales = sc3.reshape(sc.shape)
    else:
        values, scales = _recode_kernelless(packed, sc, pw.quant_type)
    return PackedInt8(
        values=values,
        scales=scales,
        shape=pw.shape,
        padded_shape=pw.padded_shape,
        dtype=pw.dtype,
        shards=pw.shards,
    )


def _make_int8_kernel():
    def kernel(x_ref, w_ref, s_ref, o_ref, acc_ref):
        ik = pl.program_id(2)
        nk = pl.num_programs(2)

        @pl.when(ik == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        w = w_ref[:].astype(jnp.bfloat16)  # one convert — the whole decode
        rows = w.shape[0]
        nb = rows // NF4_BLOCK
        s = s_ref[:].astype(jnp.bfloat16)
        w = (w.reshape(nb, NF4_BLOCK, -1) * s[:, None, :]).reshape(rows, -1)
        acc_ref[:] += jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)

        @pl.when(ik == nk - 1)
        def _store():
            o_ref[:] = acc_ref[:].astype(o_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("out_dtype", "tiles", "interpret"))
def _int8_matmul_pallas(x_pad, values, scales, out_dtype, tiles, interpret):
    bm, bk, bo = tiles
    b_pad = x_pad.shape[0]
    n_pad, m_pad = values.shape
    nb, no, nk = b_pad // bm, m_pad // bo, n_pad // bk
    kernel_out = jnp.float32 if out_dtype == jnp.float16 else out_dtype

    out = pl.pallas_call(
        _make_int8_kernel(),
        grid=(nb, no, nk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda b, o, k: (b, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bo), lambda b, o, k: (k, o), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (bk // NF4_BLOCK, bo), lambda b, o, k: (k, o), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((bm, bo), lambda b, o, k: (b, o), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, m_pad), kernel_out),
        scratch_shapes=[pltpu.VMEM((bm, bo), jnp.float32)],
        interpret=interpret,
    )(x_pad, values, scales)
    return out.astype(out_dtype) if kernel_out != out_dtype else out


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def _int8_matmul_jnp(x_pad, values, scales, out_dtype):
    n_pad, m_pad = values.shape
    w = values.astype(jnp.float32).reshape(n_pad // NF4_BLOCK, NF4_BLOCK, m_pad)
    w = (w * scales[:, None, :]).reshape(n_pad, m_pad)
    return jnp.dot(
        x_pad.astype(jnp.float32), w, preferred_element_type=jnp.float32
    ).astype(out_dtype)


def int8_matmul(x: jax.Array, p8: PackedInt8, out_dtype=None) -> jax.Array:
    """``x @ W^T`` for an int8-recoded NF4 weight (serving fast path)."""
    from ..nf4.format import pad_to

    m, n = p8.shape
    m_pad, n_pad = p8.padded_shape
    *batch, xn = x.shape
    assert xn == n, f"x trailing dim {xn} != in_features {n}"
    out_dtype = jnp.dtype(out_dtype) if out_dtype is not None else x.dtype

    B = 1
    for d in batch:
        B *= d
    x2 = x.reshape(B, n)
    bm_unit = 16 if x.dtype in (jnp.bfloat16, jnp.float16) else 8
    b_pad = pad_to(max(B, 1), bm_unit)
    if b_pad != B:
        x2 = jnp.pad(x2, ((0, b_pad - B), (0, 0)))
    if n_pad != n:
        # Pad per K-chunk: each chunk's rows are independently padded.
        s = p8.shards
        xc = x2.reshape(b_pad, s, n // s)
        xc = jnp.pad(xc, ((0, 0), (0, 0), (0, n_pad // s - n // s)))
        x2 = xc.reshape(b_pad, n_pad)

    # Kernel path needs bf16 activations (bf16 x bf16 MXU); fp32/f16 ride
    # the XLA path — int8 recode targets the bf16 serving loop.
    if env.backend() == "pallas" and x2.dtype == jnp.bfloat16 and not env.use_interpret():
        from .matmul import _pick_bm

        # Same batch-tile policy as the NF4 kernel: the in-kernel
        # convert+scale repeats once per batch tile, so prefill batches
        # want tall bm; decode batches want wide out tiles (fewer steps).
        bm = _pick_bm(b_pad)
        if bm <= 32:
            # Decode regime, swept on v5e (benchmarks/int8_lab*.py, r3):
            # shallow-K weights (gate/up: K=4096) run best with big 4MB
            # tiles (bk=2048, bo=2048) — fewest grid steps; deep-K weights
            # (down: K=14336) prefer (1024, 1024).  The r2 policy capped bo
            # at 1024, which is the 46%-of-roofline BENCH_r02 capture.
            if n_pad <= 4096:
                bk = _pick_tile(n_pad, (2048, 1024, 512))
            else:
                bk = _pick_tile(n_pad, (1024, 2048, 512))
            bo = next(
                c
                for c in (2048, 1024, 512, 256, 128)
                if m_pad % c == 0 and bk * c <= 4 * 2**20
            )
        else:
            bk = _pick_tile(n_pad, (2048, 1024, 512))
            bo = _pick_tile(m_pad, (512, 256, 128))
        override = env.matmul_tile_override()
        if override:
            bm, bk, bo = override
        old_b = b_pad
        b_pad = pad_to(b_pad, bm)
        if b_pad != old_b:
            x2 = jnp.pad(x2, ((0, b_pad - old_b), (0, 0)))
        y = _int8_matmul_pallas(
            x2, p8.values, p8.scales, out_dtype, (bm, bk, bo), False
        )
    else:
        y = _int8_matmul_jnp(x2, p8.values, p8.scales, out_dtype)
    return y[:B, :m].reshape(*batch, m)
