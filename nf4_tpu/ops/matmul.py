"""Fused NF4 dequant-matmul: ``y = x @ W^T`` with W staying packed in HBM.

This is the north-star kernel the reference package never had (it always
materialized the fp16 weight to global memory and then ran a separate
matmul, reference ``benchmark.py:62-65``).  Here the packed uint8 bytes are
DMA'd HBM->VMEM, dequantized on the VPU inside the kernel, and fed straight
to the MXU — the dequantized weight never round-trips to HBM, so the memory
traffic per step is the 4-bit weight stream plus scales instead of the fp16
tensor (a 4x reduction on the dominant stream).

Grid: (batch-tile, out-tile, K-tile) with K innermost; a fp32 VMEM scratch
accumulates partial products across K-tiles (standard Pallas matmul
pipelining).  Each K-tile of packed bytes covers two K-ranges of ``W^T``
(high-nibble plane at rows ``[k0, k0+bks)``, low-nibble plane at
``[n_pad/2 + k0, ...)``), so the kernel pulls the two matching activation
tiles and performs two MXU contractions per byte tile — the byte stream is
read exactly once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..nf4.format import PackedNF4, pad_to
from ..nf4.reference import NF4_BLOCK
from ..utils import env
from .dequant import _dequant_t_jnp, _expand_scales_sublane, _pick_tile
from .lut_eval import nf4_lookup, nf4_lookup_gather, nf4_table_row

__all__ = ["nf4_matmul"]


def _make_matmul_kernel(lut_mode: str):
    def kernel(xh_ref, xl_ref, p_ref, sh_ref, sl_ref, lut_ref, o_ref, acc_ref):
        ik = pl.program_id(2)
        nk = pl.num_programs(2)

        @pl.when(ik == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        b = p_ref[:].astype(jnp.int32)
        rows = b.shape[0]
        compute_dtype = xh_ref.dtype
        # fp32 activations get full-precision MXU passes; bf16 full rate.
        precision = (
            jax.lax.Precision.HIGHEST
            if compute_dtype == jnp.float32
            else jax.lax.Precision.DEFAULT
        )

        if lut_mode == "gather":
            lut = lut_ref[:]
            vh = nf4_lookup_gather((b >> 4) & 0xF, lut)
            vl = nf4_lookup_gather(b & 0xF, lut)
        else:
            vh = nf4_lookup((b >> 4) & 0xF)
            vl = nf4_lookup(b & 0xF)
        wh = vh * _expand_scales_sublane(sh_ref[:], NF4_BLOCK, rows)
        wl = vl * _expand_scales_sublane(sl_ref[:], NF4_BLOCK, rows)

        acc_ref[:] += jnp.dot(
            xh_ref[:],
            wh.astype(compute_dtype),
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        acc_ref[:] += jnp.dot(
            xl_ref[:],
            wl.astype(compute_dtype),
            preferred_element_type=jnp.float32,
            precision=precision,
        )

        @pl.when(ik == nk - 1)
        def _store():
            o_ref[:] = acc_ref[:].astype(o_ref.dtype)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("out_dtype", "tiles", "interpret", "lut_mode")
)
def _matmul_pallas(x_pad, packed, scales, out_dtype, tiles, interpret, lut_mode):
    bm, bks, bo = tiles
    b_pad = x_pad.shape[0]
    khalf, m_pad = packed.shape
    nb, no, nk = b_pad // bm, m_pad // bo, khalf // bks

    # Mosaic has no f16 type; f16 activations/outputs ride through fp32.
    kernel_out = jnp.float32 if out_dtype == jnp.float16 else out_dtype
    if x_pad.dtype == jnp.float16:
        x_pad = x_pad.astype(jnp.float32)

    out = pl.pallas_call(
        _make_matmul_kernel(lut_mode),
        grid=(nb, no, nk),
        in_specs=[
            pl.BlockSpec((bm, bks), lambda b, o, k: (b, k), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (bm, bks), lambda b, o, k, _nk=nk: (b, k + _nk), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((bks, bo), lambda b, o, k: (k, o), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (bks // NF4_BLOCK, bo), lambda b, o, k: (k, o), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (bks // NF4_BLOCK, bo),
                lambda b, o, k, _nk=nk: (k + _nk, o),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, 128), lambda b, o, k: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, bo), lambda b, o, k: (b, o), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b_pad, m_pad), kernel_out),
        scratch_shapes=[pltpu.VMEM((bm, bo), jnp.float32)],
        interpret=interpret,
    )(x_pad, x_pad, packed, scales, scales, jnp.asarray(nf4_table_row()))
    return out.astype(out_dtype) if kernel_out != out_dtype else out


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def _matmul_jnp(x_pad, packed, scales, out_dtype):
    wt = _dequant_t_jnp(packed, scales, jnp.float32)
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

    m_pad, n_pad = pw.padded_shape
    *batch, xn = x.shape
    assert xn == n, f"x trailing dim {xn} != in_features {n}"
    out_dtype = jnp.dtype(out_dtype) if out_dtype is not None else x.dtype

    B = 1
    for d in batch:
        B *= d
    x2 = x.reshape(B, n)

    bm_unit = 16 if x.dtype in (jnp.bfloat16, jnp.float16) else 8
    b_pad = pad_to(max(B, 1), bm_unit)
    if b_pad != B or n_pad != n:
        x2 = jnp.pad(x2, ((0, b_pad - B), (0, n_pad - n)))

    if env.backend() == "pallas":
        bm = _pick_tile(b_pad, (128, 64, 32, 16, 8))
        bks = _pick_tile(n_pad // 2, (512,))
        bo = _pick_tile(m_pad, (256, 128))
        override = env.matmul_tile_override()
        if override:
            bm, bks, bo = override
        y = _matmul_pallas(
            x2,
            pw.packed,
            pw.scales,
            out_dtype,
            (bm, bks, bo),
            env.use_interpret(),
            env.lut_mode(),
        )
    else:
        y = _matmul_jnp(x2, pw.packed, pw.scales, out_dtype)

    y = y[:B, :m]
    return y.reshape(*batch, m)
