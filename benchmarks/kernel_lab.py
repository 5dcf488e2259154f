"""Kernel optimization lab: measure fused dequant-matmul variants on the
real chip (dev harness behind PERF_NOTES.md; not part of the public API).

Times each variant with the chained-marginal methodology on the headline
shape (8192x8192 NF4 weight, batch-16 bf16 activations) and prints effective
packed-weight-stream GB/s.

Usage: python benchmarks/kernel_lab.py [variant ...]
"""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nf4_tpu.nf4.format import quantize_for_tpu
from nf4_tpu.nf4.lut import NF4_CODE
from nf4_tpu.nf4.reference import NF4_BLOCK
from nf4_tpu.utils.timing import measure_chained_s

M = N = 8192
BATCH = 16
HBM_GBPS = 819.0  # v5e datasheet

_C = [float(v) for v in NF4_CODE]


def tree_select(nib, dtype):
    """15-select binary tree mapping nibbles (any int) to codebook values."""
    return tree_select_bits(nib, 0, dtype)


def tree_select_bits(b, bit0, dtype):
    """Select tree keyed on bits [bit0, bit0+4) of integer array ``b``.

    Uses only AND + compare for the conditions (Mosaic has no sub-32-bit
    vector shifts: arith.shrui/shrsi on i8/i16 fail to legalize), so the
    high nibble is decoded straight from the byte with bit0=4.
    """
    b0 = (b & (1 << bit0)) != 0
    b1 = (b & (2 << bit0)) != 0
    b2 = (b & (4 << bit0)) != 0
    b3 = (b & (8 << bit0)) != 0
    c = [jnp.asarray(v, dtype) for v in _C]
    p = [jnp.where(b0, c[2 * i + 1], c[2 * i]) for i in range(8)]
    q = [jnp.where(b1, p[2 * i + 1], p[2 * i]) for i in range(4)]
    r = [jnp.where(b2, q[2 * i + 1], q[2 * i]) for i in range(2)]
    return jnp.where(b3, r[1], r[0])


def expand_scales(s, block, rows):
    nb, cols = s.shape
    return jnp.broadcast_to(s[:, None, :], (nb, block, cols)).reshape(rows, cols)


# --------------------------------------------------------------------------
# Variant kernels.  All compute y = x @ W^T for split-half packed NF4.


def make_v1_kernel(lut16: bool):
    """Single fused dot; nibble ops in u8; tree in i16/bf16 domain."""

    def kernel(xh_ref, xl_ref, p_ref, sh_ref, sl_ref, o_ref, acc_ref):
        ik = pl.program_id(2)
        nk = pl.num_programs(2)

        @pl.when(ik == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        b = p_ref[:].astype(jnp.int16 if lut16 else jnp.int32)
        vdt = jnp.bfloat16 if lut16 else jnp.float32
        v = jnp.concatenate(
            [tree_select_bits(b, 4, vdt), tree_select_bits(b, 0, vdt)], axis=0
        )  # (2bks, bo)
        s = jnp.concatenate([sh_ref[:], sl_ref[:]], axis=0)
        if lut16:
            s = s.astype(jnp.bfloat16)
        sexp = expand_scales(s, NF4_BLOCK, v.shape[0])
        w = (v * sexp).astype(jnp.bfloat16)
        xc = jnp.concatenate([xh_ref[:], xl_ref[:]], axis=1)
        acc_ref[:] += jnp.dot(xc, w, preferred_element_type=jnp.float32)

        @pl.when(ik == nk - 1)
        def _():
            o_ref[:] = acc_ref[:].astype(o_ref.dtype)

    return kernel


def make_v3_kernel(nk: int):
    """v1(bf16 tree) + software pipeline: dequant tile t while the MXU dot
    consumes tile t-1 from a VMEM scratch (grid runs nk+1 steps)."""

    def kernel(xh_ref, xl_ref, p_ref, sh_ref, sl_ref, o_ref, acc_ref, w_scr):
        t = pl.program_id(2)

        @pl.when(t == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        # Dot first (operands produced at step t-1) so Mosaic can issue the
        # MXU pass before/while the VPU dequantizes tile t.
        @pl.when(t > 0)
        def _():
            xc = jnp.concatenate([xh_ref[:], xl_ref[:]], axis=1)
            acc_ref[:] += jnp.dot(
                xc, w_scr[(t - 1) % 2], preferred_element_type=jnp.float32
            )

        @pl.when(t < nk)
        def _():
            b = p_ref[:].astype(jnp.int16)
            v = jnp.concatenate(
                [
                    tree_select_bits(b, 4, jnp.bfloat16),
                    tree_select_bits(b, 0, jnp.bfloat16),
                ],
                axis=0,
            )
            s = jnp.concatenate([sh_ref[:], sl_ref[:]], axis=0).astype(jnp.bfloat16)
            w_scr[t % 2] = v * expand_scales(s, NF4_BLOCK, v.shape[0])

        @pl.when(t == nk)
        def _():
            o_ref[:] = acc_ref[:].astype(o_ref.dtype)

    return kernel


def build_v1(pw, lut16=True, bks=512, bo=256, bm=16):
    khalf, m_pad = pw.packed.shape
    nk = khalf // bks
    no = m_pad // bo

    @jax.jit
    def run(x):
        return pl.pallas_call(
            make_v1_kernel(lut16),
            grid=(1, no, nk),
            in_specs=[
                pl.BlockSpec((bm, bks), lambda b, o, k: (b, k), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (bm, bks), lambda b, o, k: (b, k + nk), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec((bks, bo), lambda b, o, k: (k, o), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (bks // NF4_BLOCK, bo), lambda b, o, k: (k, o), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (bks // NF4_BLOCK, bo),
                    lambda b, o, k: (k + nk, o),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec((bm, bo), lambda b, o, k: (b, o), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bm, m_pad), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((bm, bo), jnp.float32)],
        )(x, x, pw.packed, pw.scales, pw.scales)

    return run


def build_v3(pw, bks=512, bo=256, bm=16):
    khalf, m_pad = pw.packed.shape
    nk = khalf // bks
    no = m_pad // bo

    @jax.jit
    def run(x):
        return pl.pallas_call(
            make_v3_kernel(nk),
            grid=(1, no, nk + 1),
            in_specs=[
                pl.BlockSpec(
                    (bm, bks),
                    lambda b, o, t: (b, jnp.maximum(t - 1, 0)),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (bm, bks),
                    lambda b, o, t: (b, jnp.maximum(t - 1, 0) + nk),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (bks, bo),
                    lambda b, o, t: (jnp.minimum(t, nk - 1), o),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (bks // NF4_BLOCK, bo),
                    lambda b, o, t: (jnp.minimum(t, nk - 1), o),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (bks // NF4_BLOCK, bo),
                    lambda b, o, t: (jnp.minimum(t, nk - 1) + nk, o),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec((bm, bo), lambda b, o, t: (b, o), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bm, m_pad), jnp.bfloat16),
            scratch_shapes=[
                pltpu.VMEM((bm, bo), jnp.float32),
                pltpu.VMEM((2, 2 * bks, bo), jnp.bfloat16),
            ],
        )(x, x, pw.packed, pw.scales, pw.scales)

    return run


def pack_pairs(w):
    """Adjacent-pair K-interleaved packing for the byte-table decode path.

    Byte (j, r) holds code(W^T[2j+1, r]) in the HIGH nibble and
    code(W^T[2j, r]) in the LOW nibble, so that the 256-entry word table
    T[byte] = (bf16bits(LUT[hi]) << 16) | bf16bits(LUT[lo]) dequantizes a
    whole byte in one gather, and pltpu.bitcast's row-pair interleave
    (word row j -> bf16 rows 2j=lo, 2j+1=hi) lands values on consecutive
    K rows.  Scales layout identical to the split-half format.
    """
    from nf4_tpu.nf4.format import pad_to
    from nf4_tpu.nf4.reference import quantize_nf4, unpack_nibbles

    state = quantize_nf4(np.asarray(w, np.float32))
    m, n = state.shape
    m_pad, n_pad = pad_to(m, 128), pad_to(n, 1024)
    idx = unpack_nibbles(state.packed, m * n).reshape(m, n)
    idx_p = np.zeros((m_pad, n_pad), np.uint8)
    idx_p[:m, :n] = idx
    idx_t = idx_p.T  # [n_pad, m_pad] = codes of W^T
    lo = idx_t[0::2, :]  # K rows 2j
    hi = idx_t[1::2, :]  # K rows 2j+1
    packed = ((hi << 4) | lo).astype(np.uint8)

    from nf4_tpu.nf4.format import quantize_for_tpu

    scales = quantize_for_tpu(np.asarray(w, np.float32)).scales  # same layout
    return jnp.asarray(packed), scales


def word_tables(dtype=jnp.bfloat16):
    """T[byte] as two (1, 128) i32 rows (bytes 0-127, 128-255)."""
    import ml_dtypes

    bits = np.asarray(NF4_CODE, np.float32).astype(ml_dtypes.bfloat16).view(np.uint16)
    T = np.zeros(256, np.uint32)
    for byte in range(256):
        T[byte] = (np.uint32(bits[byte >> 4]) << 16) | np.uint32(bits[byte & 0xF])
    T = T.view(np.int32)
    return jnp.asarray(T[:128].reshape(1, 128)), jnp.asarray(T[128:].reshape(1, 128))


def make_v5_kernel(nchunks: int):
    """Byte-table decode: per byte one masked pair of 128-lane gathers into
    a 32-bit word holding both dequantized bf16 bit patterns."""

    def kernel(x_ref, p_ref, s_ref, tlo_ref, thi_ref, o_ref, acc_ref):
        ik = pl.program_id(2)
        nk = pl.num_programs(2)

        @pl.when(ik == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        b = p_ref[:].astype(jnp.int32)  # (bks, bo)
        rows = b.shape[0]
        idx = b & 127
        sel = b >= 128
        xt = x_ref[:]
        s_all = s_ref[:].astype(jnp.bfloat16)
        for c in range(nchunks):
            sl = slice(c * 128, (c + 1) * 128)
            g1 = jnp.take_along_axis(tlo_ref[:], idx[:, sl], axis=1)
            g2 = jnp.take_along_axis(thi_ref[:], idx[:, sl], axis=1)
            word = jnp.where(sel[:, sl], g2, g1)
            wv = pltpu.bitcast(word, jnp.bfloat16)  # (2bks, 128)
            sexp = expand_scales(s_all[:, sl], NF4_BLOCK, 2 * rows)
            acc_ref[:, sl] += jnp.dot(
                xt, wv * sexp, preferred_element_type=jnp.float32
            )

        @pl.when(ik == nk - 1)
        def _():
            o_ref[:] = acc_ref[:].astype(o_ref.dtype)

    return kernel


def build_v5(packed, scales, bks=512, bo=256, bm=16):
    khalf, m_pad = packed.shape
    nk = khalf // bks
    no = m_pad // bo
    tlo, thi = word_tables()
    tlo = jnp.broadcast_to(tlo, (bks, 128))
    thi = jnp.broadcast_to(thi, (bks, 128))

    @jax.jit
    def run(x):
        return pl.pallas_call(
            make_v5_kernel(bo // 128),
            grid=(1, no, nk),
            in_specs=[
                pl.BlockSpec(
                    (bm, 2 * bks), lambda b, o, k: (b, k), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec((bks, bo), lambda b, o, k: (k, o), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (2 * bks // NF4_BLOCK, bo),
                    lambda b, o, k: (k, o),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec((bks, 128), lambda b, o, k: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bks, 128), lambda b, o, k: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bm, bo), lambda b, o, k: (b, o), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bm, m_pad), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((bm, bo), jnp.float32)],
        )(x, packed, scales, tlo, thi)

    return run


def make_micro_kernel(nchunks: int, level: str):
    """Incremental kernel bodies to isolate per-op VPU cost.  Levels:
    dma(dot of x head only) < conv(bitcast of raw bytes) < mask < g1 < g2
    < full(=v5).  Output values are garbage below 'full'; timing only."""

    def kernel(x_ref, p_ref, s_ref, tlo_ref, thi_ref, o_ref, acc_ref):
        ik = pl.program_id(2)
        nk = pl.num_programs(2)

        @pl.when(ik == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        b = p_ref[:].astype(jnp.int32)
        rows = b.shape[0]
        xt = x_ref[:]
        s_all = s_ref[:].astype(jnp.bfloat16)
        for c in range(nchunks):
            sl = slice(c * 128, (c + 1) * 128)
            if level == "conv":
                word = b[:, sl]
            elif level == "mask":
                word = jnp.where(b[:, sl] >= 128, b[:, sl] & 127, b[:, sl])
            elif level == "g1":
                idx = b[:, sl] & 127
                word = jnp.take_along_axis(tlo_ref[:], idx, axis=1)
            else:  # g2 / full / fulls
                idx = b[:, sl] & 127
                g1 = jnp.take_along_axis(tlo_ref[:], idx, axis=1)
                g2 = jnp.take_along_axis(thi_ref[:], idx, axis=1)
                word = jnp.where(b[:, sl] >= 128, g2, g1)
            wv = pltpu.bitcast(word, jnp.bfloat16)
            if level == "full":
                wv = wv * expand_scales(s_all[:, sl], NF4_BLOCK, 2 * rows)
            elif level == "fulls":
                # 3D broadcast mul: avoid materializing the expanded scales.
                nb = 2 * rows // NF4_BLOCK
                wv = (
                    wv.reshape(nb, NF4_BLOCK, 128) * s_all[:, sl][:, None, :]
                ).reshape(2 * rows, 128)
            acc_ref[:, sl] += jnp.dot(xt, wv, preferred_element_type=jnp.float32)

        @pl.when(ik == nk - 1)
        def _():
            o_ref[:] = acc_ref[:].astype(o_ref.dtype)

    return kernel


def build_micro(packed, scales, level, bks=512, bo=512, bm=16, dimsem=False):
    khalf, m_pad = packed.shape
    nk = khalf // bks
    no = m_pad // bo
    tlo, thi = word_tables()
    tlo = jnp.broadcast_to(tlo, (bks, 128))
    thi = jnp.broadcast_to(thi, (bks, 128))
    params = {}
    if dimsem:
        params["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        )

    @jax.jit
    def run(x):
        return pl.pallas_call(
            make_micro_kernel(bo // 128, level),
            **params,
            grid=(1, no, nk),
            in_specs=[
                pl.BlockSpec(
                    (bm, 2 * bks), lambda b, o, k: (b, k), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec((bks, bo), lambda b, o, k: (k, o), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (2 * bks // NF4_BLOCK, bo),
                    lambda b, o, k: (k, o),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec((bks, 128), lambda b, o, k: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bks, 128), lambda b, o, k: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bm, bo), lambda b, o, k: (b, o), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bm, m_pad), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((bm, bo), jnp.float32)],
        )(x, packed, scales, tlo, thi)

    return run


def _bf16_bits_consts():
    import ml_dtypes

    return [
        int(b)
        for b in np.asarray(NF4_CODE, np.float32)
        .astype(ml_dtypes.bfloat16)
        .view(np.uint16)
    ]


def tree_select_bits_int(b, bit0):
    """Select tree producing bf16 BIT PATTERNS (as i32) keyed on bits
    [bit0, bit0+4) of b — the ALU-only alternative to the table gather."""
    c = _bf16_bits_consts()
    b0 = (b & (1 << bit0)) != 0
    b1 = (b & (2 << bit0)) != 0
    b2 = (b & (4 << bit0)) != 0
    b3 = (b & (8 << bit0)) != 0
    p = [jnp.where(b0, c[2 * i + 1], c[2 * i]) for i in range(8)]
    q = [jnp.where(b1, p[2 * i + 1], p[2 * i]) for i in range(4)]
    r = [jnp.where(b2, q[2 * i + 1], q[2 * i]) for i in range(2)]
    return jnp.where(b3, r[1], r[0])


def make_v9_kernel(nchunks: int, mode: str):
    """Byte->word decode per chunk; mode selects gather / ALU-tree / an
    alternating hybrid (gather unit and vector ALU may pipeline
    independently)."""

    def kernel(x_ref, p_ref, s_ref, tlo_ref, thi_ref, o_ref, acc_ref):
        ik = pl.program_id(2)
        nk = pl.num_programs(2)

        @pl.when(ik == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        b = p_ref[:].astype(jnp.int32)
        rows = b.shape[0]
        xt = x_ref[:]
        s_all = s_ref[:].astype(jnp.bfloat16)
        nb = 2 * rows // NF4_BLOCK
        for c in range(nchunks):
            sl = slice(c * 128, (c + 1) * 128)
            use_tree = mode == "tree" or (mode == "hybrid" and c % 2 == 1)
            if use_tree:
                hi = tree_select_bits_int(b[:, sl], 4)
                lo = tree_select_bits_int(b[:, sl], 0)
                word = (hi << 16) | lo
            else:
                idx = b[:, sl] & 127
                g1 = jnp.take_along_axis(tlo_ref[:], idx, axis=1)
                g2 = jnp.take_along_axis(thi_ref[:], idx, axis=1)
                word = jnp.where(b[:, sl] >= 128, g2, g1)
            wv = pltpu.bitcast(word, jnp.bfloat16)
            wv = (
                wv.reshape(nb, NF4_BLOCK, 128) * s_all[:, sl][:, None, :]
            ).reshape(2 * rows, 128)
            acc_ref[:, sl] += jnp.dot(xt, wv, preferred_element_type=jnp.float32)

        @pl.when(ik == nk - 1)
        def _():
            o_ref[:] = acc_ref[:].astype(o_ref.dtype)

    return kernel


def build_v9(packed, scales, mode, bks=1024, bo=512, bm=16):
    khalf, m_pad = packed.shape
    nk = khalf // bks
    no = m_pad // bo
    tlo, thi = word_tables()
    tlo = jnp.broadcast_to(tlo, (bks, 128))
    thi = jnp.broadcast_to(thi, (bks, 128))

    @jax.jit
    def run(x):
        return pl.pallas_call(
            make_v9_kernel(bo // 128, mode),
            grid=(1, no, nk),
            in_specs=[
                pl.BlockSpec(
                    (bm, 2 * bks), lambda b, o, k: (b, k), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec((bks, bo), lambda b, o, k: (k, o), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (2 * bks // NF4_BLOCK, bo),
                    lambda b, o, k: (k, o),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec((bks, 128), lambda b, o, k: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bks, 128), lambda b, o, k: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bm, bo), lambda b, o, k: (b, o), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bm, m_pad), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((bm, bo), jnp.float32)],
        )(x, packed, scales, tlo, thi)

    return run


# --------------------------------------------------------------------------
# v10: emit_pipeline over K inside an (out-tile) grid — Mosaic's supported
# way to software-pipeline manual loops, with x pre-tiled (nk, bm, 2bks) so
# batch stays on sublanes (v8 put batch on lanes: 16/128 utilization).


def build_v10(packed, scales, bks=1024, bo=512, bm=16):
    khalf, m_pad = packed.shape
    nk = khalf // bks
    no = m_pad // bo
    nsc = 2 * bks // NF4_BLOCK
    tlo, thi = word_tables()
    tlo = jnp.broadcast_to(tlo, (bks, 128))
    thi = jnp.broadcast_to(thi, (bks, 128))

    def outer(x_hbm, p_hbm, s_hbm, tlo_ref, thi_ref, o_ref, acc_ref):
        o = pl.program_id(0)

        def inner(x_ref, p_ref, s_ref):
            b = p_ref[:].astype(jnp.int32)
            idx = b & 127
            sel = b >= 128
            s_all = s_ref[:].astype(jnp.bfloat16)
            nb = 2 * bks // NF4_BLOCK
            xt = x_ref[0]
            for c in range(bo // 128):
                sl = slice(c * 128, (c + 1) * 128)
                g1 = jnp.take_along_axis(tlo_ref[:], idx[:, sl], axis=1)
                g2 = jnp.take_along_axis(thi_ref[:], idx[:, sl], axis=1)
                word = jnp.where(sel[:, sl], g2, g1)
                wv = pltpu.bitcast(word, jnp.bfloat16)
                wv = (
                    wv.reshape(nb, NF4_BLOCK, 128) * s_all[:, sl][:, None, :]
                ).reshape(2 * bks, 128)
                acc_ref[:, sl] += jnp.dot(
                    xt, wv, preferred_element_type=jnp.float32
                )

        acc_ref[:] = jnp.zeros_like(acc_ref)
        pipeline = pltpu.emit_pipeline(
            inner,
            grid=(nk,),
            in_specs=[
                pl.BlockSpec((1, bm, 2 * bks), lambda k: (k, 0, 0)),
                pl.BlockSpec((bks, bo), lambda k, _o=None: (k, o)),
                pl.BlockSpec((nsc, bo), lambda k: (k, o)),
            ],
        )
        pipeline(x_hbm, p_hbm, s_hbm)
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)

    @jax.jit
    def run(x):
        x3 = x.reshape(bm, nk, 2 * bks).transpose(1, 0, 2)  # (nk, bm, 2bks)
        return pl.pallas_call(
            outer,
            grid=(no,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec((bks, 128), lambda o: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bks, 128), lambda o: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bm, bo), lambda o: (0, o), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bm, m_pad), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((bm, bo), jnp.float32)],
        )(x3, packed, scales, tlo, thi)

    return run


# --------------------------------------------------------------------------
# v8: manual software pipeline.  Grid is (batch-tile, out-tile) only; the K
# loop runs inside the body with explicit double-buffered DMA of packed
# bytes + scales, and decode of tile k+1 is issued in the same straight-line
# block as the MXU dot of tile k so the VLIW scheduler can overlap them.


def make_v8_kernel(nk: int, bks: int, bo: int):
    nsc = 2 * bks // NF4_BLOCK  # scale rows per tile

    def decode(pb, sb, tlo_ref, thi_ref):
        b = pb[:].astype(jnp.int32)
        idx = b & 127
        sel = b >= 128
        s_all = sb[:].astype(jnp.bfloat16)
        parts = []
        for c in range(bo // 128):
            sl = slice(c * 128, (c + 1) * 128)
            g1 = jnp.take_along_axis(tlo_ref[:], idx[:, sl], axis=1)
            g2 = jnp.take_along_axis(thi_ref[:], idx[:, sl], axis=1)
            word = jnp.where(sel[:, sl], g2, g1)
            wv = pltpu.bitcast(word, jnp.bfloat16)
            nb = 2 * bks // NF4_BLOCK
            wv = (
                wv.reshape(nb, NF4_BLOCK, 128) * s_all[:, sl][:, None, :]
            ).reshape(2 * bks, 128)
            parts.append(wv)
        return jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]

    def kernel(
        xt_ref, p_hbm, s_hbm, tlo_ref, thi_ref, o_ref,
        pbuf, sbuf, wbuf, acc_ref, sem_p, sem_s,
    ):
        o = pl.program_id(1)

        def dma_p(slot, k):
            return pltpu.make_async_copy(
                p_hbm.at[pl.ds(k * bks, bks), pl.ds(o * bo, bo)],
                pbuf.at[slot],
                sem_p.at[slot],
            )

        def dma_s(slot, k):
            return pltpu.make_async_copy(
                s_hbm.at[pl.ds(k * nsc, nsc), pl.ds(o * bo, bo)],
                sbuf.at[slot],
                sem_s.at[slot],
            )

        # Prologue: fetch + decode tile 0, start fetch of tile 1.
        dma_p(0, 0).start()
        dma_s(0, 0).start()
        dma_p(0, 0).wait()
        dma_s(0, 0).wait()
        dma_p(1, 1).start()
        dma_s(1, 1).start()
        wbuf[0] = decode(pbuf.at[0], sbuf.at[0], tlo_ref, thi_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

        def body(k, _):
            nxt = (k + 1) % 2

            @pl.when(k + 2 < nk)
            def _():
                dma_p(k % 2, k + 2).start()
                dma_s(k % 2, k + 2).start()

            dma_p(nxt, k + 1).wait()
            dma_s(nxt, k + 1).wait()
            # Issue the MXU dot of tile k FIRST, then decode tile k+1 on the
            # VPU in its shadow; the accumulate (VPU, depends on the dot)
            # comes after the decode so the scheduler is free to overlap.
            xk = xt_ref[pl.ds(k * 2 * bks, 2 * bks), :]
            dotres = jax.lax.dot_general(
                xk,
                wbuf[k % 2],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            wv_next = decode(pbuf.at[nxt], sbuf.at[nxt], tlo_ref, thi_ref)
            acc_ref[:] += dotres
            wbuf[nxt] = wv_next
            return 0

        jax.lax.fori_loop(0, nk - 1, body, 0)

        # Epilogue: last dot.
        xk = xt_ref[pl.ds((nk - 1) * 2 * bks, 2 * bks), :]
        acc_ref[:] += jax.lax.dot_general(
            xk,
            wbuf[(nk - 1) % 2],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)

    return kernel


def build_v8(packed, scales, bks=1024, bo=256, bm=16):
    khalf, m_pad = packed.shape
    nk = khalf // bks
    no = m_pad // bo
    nsc = 2 * bks // NF4_BLOCK
    tlo, thi = word_tables()
    tlo = jnp.broadcast_to(tlo, (bks, 128))
    thi = jnp.broadcast_to(thi, (bks, 128))

    @jax.jit
    def run(x):
        xt = x.T  # (n_pad, bm)
        n_pad = xt.shape[0]
        return pl.pallas_call(
            make_v8_kernel(nk, bks, bo),
            grid=(1, no),
            in_specs=[
                pl.BlockSpec((n_pad, bm), lambda b, o: (0, b), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec((bks, 128), lambda b, o: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bks, 128), lambda b, o: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bm, bo), lambda b, o: (b, o), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bm, m_pad), jnp.bfloat16),
            scratch_shapes=[
                pltpu.VMEM((2, bks, bo), jnp.uint8),
                pltpu.VMEM((2, nsc, bo), jnp.float32),
                pltpu.VMEM((2, 2 * bks, bo), jnp.bfloat16),
                pltpu.VMEM((bm, bo), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )(xt, packed, scales, tlo, thi)

    return run


def check(run, x, yref, name, tol=2e-2):
    y = np.asarray(run(x)[:, :M], dtype=np.float32)
    rel = np.abs(y - yref).max() / max(1e-6, np.abs(yref).max())
    status = "ok" if rel < tol else "WRONG"
    print(f"  {name}: rel err {rel:.2e} [{status}]")
    return rel < tol


def bench(run, x, wbytes, name):
    def step(xc):
        y = run(xc)
        return xc + y[:, 0:1].astype(xc.dtype) * jnp.bfloat16(1e-30)

    stepj = jax.jit(step)
    st = measure_chained_s(stepj, x, n1=20, n2=100, repeats=3)
    gbps = wbytes / st.median / 1e9
    print(
        f"  {name}: {st.median * 1e6:.0f} us -> {gbps:.0f} GB/s "
        f"({gbps / HBM_GBPS * 100:.0f}% of HBM)"
    )
    return st.median


def main():
    want = sys.argv[1:] or ["v0", "v1f32", "v1", "v3", "tiles"]
    print(f"device: {jax.devices()[0].device_kind}")
    rng = np.random.default_rng(0)
    w = (rng.standard_normal((M, N)) * 0.02).astype(np.float32)
    pw = quantize_for_tpu(w, dtype=jnp.bfloat16)
    wbytes = pw.packed.size + pw.scales.size * 4
    x = jax.random.normal(jax.random.PRNGKey(1), (BATCH, N), jnp.bfloat16)

    from nf4_tpu.nf4.reference import dequantize_nf4, quantize_nf4

    wd = dequantize_nf4(quantize_nf4(w), dtype=np.float32)
    yref = np.asarray(x, np.float32) @ wd.T

    if "v0" in want:
        from nf4_tpu.ops.matmul import nf4_matmul

        for lut in ("tree", "gather"):
            os.environ["NF4TPU_LUT"] = lut
            run0 = jax.jit(lambda xc: nf4_matmul(xc, pw))
            check(run0, x, yref, f"v0-{lut}")
            bench(run0, x, wbytes, f"v0-{lut} (current)")
        os.environ.pop("NF4TPU_LUT", None)

    if "v1f32" in want:
        run = build_v1(pw, lut16=False)
        if check(run, x, yref, "v1-f32tree-fuseddot"):
            bench(run, x, wbytes, "v1-f32tree-fuseddot")

    if "v1" in want:
        run = build_v1(pw, lut16=True)
        if check(run, x, yref, "v1-bf16tree"):
            bench(run, x, wbytes, "v1-bf16tree")

    if "v3" in want:
        run = build_v3(pw)
        if check(run, x, yref, "v3-pipelined"):
            bench(run, x, wbytes, "v3-pipelined")

    if "v5" in want:
        packed2, scales2 = pack_pairs(w)
        for bks, bo in ((512, 256), (512, 512), (1024, 256), (1024, 512)):
            try:
                run = build_v5(packed2, scales2, bks=bks, bo=bo)
                if check(run, x, yref, f"v5-bytetable bks={bks} bo={bo}"):
                    bench(run, x, wbytes, f"v5-bytetable bks={bks} bo={bo}")
            except Exception as e:
                print(f"  v5 bks={bks} bo={bo}: failed ({str(e)[:140]})")

    if "micro" in want:
        packed2, scales2 = pack_pairs(w)
        for level in ("dma", "conv", "mask", "g1", "g2", "full"):
            try:
                run = build_micro(packed2, scales2, level)
                run(x)[0].block_until_ready()
                bench(run, x, wbytes, f"micro-{level}")
            except Exception as e:
                print(f"  micro-{level}: failed ({str(e)[:140]})")

    if "micro2" in want:
        packed2, scales2 = pack_pairs(w)
        yref2 = yref  # full/fulls levels compute real values
        for bks, bo in ((1024, 256), (2048, 256), (1024, 512)):
            for level in ("conv", "g2", "full", "fulls"):
                try:
                    run = build_micro(packed2, scales2, level, bks=bks, bo=bo)
                    if level in ("full", "fulls"):
                        check(run, x, yref2, f"micro2-{level} {bks}x{bo}")
                    else:
                        run(x)[0].block_until_ready()
                    bench(run, x, wbytes, f"micro2-{level} {bks}x{bo}")
                except Exception as e:
                    print(f"  micro2-{level} {bks}x{bo}: failed ({str(e)[:120]})")
        # dimension_semantics probe at the best config
        for level in ("fulls",):
            try:
                run = build_micro(packed2, scales2, level, bks=1024, bo=256, dimsem=True)
                check(run, x, yref2, f"micro2-{level}-dimsem")
                bench(run, x, wbytes, f"micro2-{level}-dimsem 1024x256")
            except Exception as e:
                print(f"  micro2-{level}-dimsem: failed ({str(e)[:120]})")

    if "h2h" in want:
        # Head-to-head in one process, two rounds, to control for the
        # shared chip's throughput drift between processes.
        # NOTE: pw is now pair-layout, so nf4_matmul IS the byte-table
        # kernel (shipped); v8 is the manual-pipeline candidate.
        from nf4_tpu.ops.matmul import nf4_matmul

        contenders = [
            ("shipped gather 1024x512", jax.jit(lambda xc: nf4_matmul(xc, pw)), True),
            ("v10 emit_pipeline 1024x512", build_v10(pw.packed, pw.scales), True),
            ("v10 emit_pipeline 512x512", build_v10(pw.packed, pw.scales, bks=512), True),
            ("conv floor 1024x512", build_micro(pw.packed, pw.scales, "conv", bks=1024, bo=512), False),
        ]
        ok = {}
        for name, run, do_check in contenders:  # compile + correctness pass
            try:
                if do_check:
                    ok[name] = check(run, x, yref, name)
                else:
                    run(x)[0].block_until_ready()
                    ok[name] = True
            except Exception as e:
                print(f"  {name}: failed ({str(e)[:140]})")
                ok[name] = False
        for rnd in range(3):
            for name, run, _ in contenders:
                if ok.get(name):
                    bench(run, x, wbytes, f"[r{rnd}] {name}")

    if "tiles" in want:
        for bks, bo in ((512, 512), (1024, 256), (1024, 512), (2048, 256)):
            try:
                run = build_v3(pw, bks=bks, bo=bo)
                if check(run, x, yref, f"v3 bks={bks} bo={bo}"):
                    bench(run, x, wbytes, f"v3 bks={bks} bo={bo}")
            except Exception as e:
                print(f"  v3 bks={bks} bo={bo}: failed ({str(e)[:120]})")


if __name__ == "__main__":
    main()
