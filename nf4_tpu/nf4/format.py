"""TPU-native packed NF4 weight format.

Design rationale (TPU-first, not a port of the reference's layout):

The reference GPU package stores bitsandbytes' flat byte stream — byte ``j``
of a row holds output columns ``2j`` (high nibble) and ``2j+1`` (low nibble)
(reference ``kernel_optimized.py:100-110``).  Unpacking that layout requires
*interleaving* adjacent elements, which is free on GPUs (per-thread scatter)
but a cross-lane shuffle on a TPU's (sublane × lane) vector registers.

We instead define an **adjacent-pair, K-major** layout so that unpacking is
pure integer arithmetic whose natural output order matches the hardware:

* The semantic weight is ``W[m, n]`` (``m`` = out_features, ``n`` =
  in_features; NF4 blocks of 64 run along ``n``, exactly as in bitsandbytes).
* Storage is transposed ("K x M"): inference always consumes ``W^T``
  (reference ``benchmark.py:62-65`` transposes immediately after dequant),
  and K-major puts the contraction dim on sublanes where the MXU wants it.
* ``packed[j, r]`` (uint8, shape ``[n_pad//2, m_pad]``) holds
  ``W^T[2j, r]`` in its LOW nibble and ``W^T[2j+1, r]`` in its HIGH nibble.
  This pairing is chosen for the TPU's 32-bit register lanes: the fused
  kernel gathers a 32-bit word per byte from a 256-entry table holding both
  dequantized bf16 bit patterns, and ``pltpu.bitcast(word, bfloat16)``
  expands word row ``j`` into value rows ``2j`` (low half) and ``2j+1``
  (high half) — exactly this layout's K order, so decode needs **no**
  interleave, shuffle, or activation permutation.  Both K rows of a byte
  fall in the same 64-value scale block, so scales stay block-aligned too.
* ``scales[g, r]`` (fp32, shape ``[n_pad//64, m_pad]``) is the fully
  dequantized per-block scale ``code2[absmax_u8]*absmax32 + offset`` for rows
  ``[64g, 64g+64)`` of ``W^T``.  Precomputing the double dequantization once
  at load time is exact (it is fp32 math either way) and shrinks the per-step
  work to a single multiply; the scale array is ``m*n/16`` bytes = 1/8 the
  packed weight.

Padding: ``n`` is padded to a multiple of 1024 and ``m`` to a multiple of
128.  The 1024 requirement makes every per-plane K-tile of 512+ rows cover
at least eight 64-value scale blocks, which is the minimum sublane tile for
a fp32 scale block in VMEM; every production Llama dim (2048, 4096, 8192,
14336, 28672) is already 1024-aligned, so the padding only costs on toy
shapes.  Padded regions carry scale 0, so they dequantize to exact 0.0 and
contribute nothing to matmuls.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .lut import NF4_CODE, dynamic_code
from .reference import (
    ABSMAX_BLOCK,
    NF4_BLOCK,
    QuantState,
    pack_nibbles,
    quantize_nf4,
    unpack_nibbles,
)

__all__ = [
    "PackedNF4",
    "QDense",
    "pack_for_tpu",
    "pack_codes_for_tpu",
    "qdense_from_state",
    "quantize_for_tpu",
    "to_quant_state",
    "pad_to",
    "interleave_perm",
    "permute_out_features",
    "rechunk_shards",
]


def pad_to(x: int, multiple: int) -> int:
    return -(-x // multiple) * multiple


@struct.dataclass
class PackedNF4:
    """A single NF4-quantized weight in TPU-native layout (a JAX pytree).

    ``shards > 1`` means the K dimension is packed in ``shards`` independent
    chunks (the pair structure repeats per chunk): row ranges
    ``[s * n_pad/(2*shards), ...)`` of ``packed`` hold chunk ``s`` of the
    in-features dim.  Sharding such a weight over the first axis with
    ``PartitionSpec('tp', None)`` hands each of ``shards`` devices a fully
    self-contained packed chunk — the layout primitive behind row-parallel
    (contraction-sharded) tensor parallelism.
    """

    packed: jax.Array  # uint8 [n_pad//2, m_pad]
    scales: jax.Array  # fp32  [n_pad//64, m_pad]
    shape: Tuple[int, int] = struct.field(pytree_node=False)  # logical (m, n)
    padded_shape: Tuple[int, int] = struct.field(pytree_node=False)  # (m_pad, n_pad)
    dtype: jnp.dtype = struct.field(pytree_node=False)  # output dtype
    shards: int = struct.field(pytree_node=False, default=1)
    # 4-bit codebook the nibbles index: "nf4" or "fp4" (bnb's default).
    # Static (trace-time) so each kernel compiles with its table baked in.
    quant_type: str = struct.field(pytree_node=False, default="nf4")

    @property
    def out_features(self) -> int:
        return self.shape[0]

    @property
    def in_features(self) -> int:
        return self.shape[1]

    @property
    def nbytes(self) -> int:
        return self.packed.size + self.scales.size * 4


def _absmax_grid(state: QuantState) -> np.ndarray:
    """Per-(row, block) fp32 scales [m, n//64] from a flat QuantState."""
    from .reference import dequantize_absmax

    m, n = state.shape
    assert n % NF4_BLOCK == 0, f"in_features must be a multiple of 64, got {n}"
    absmax = dequantize_absmax(state)  # [m*n/64]
    return absmax.reshape(m, n // NF4_BLOCK)


@dataclasses.dataclass
class QDense:
    """A quantized-but-unpacked weight: per-element 4-bit codebook indices
    plus fully dequantized fp32 per-64-block scales.

    The exact intermediate between an external flat-layout
    :class:`QuantState` (e.g. parsed out of a bitsandbytes-serialized HF
    checkpoint — ``nf4.bnb_checkpoint``) and the TPU :class:`PackedNF4`
    layout.  Row operations (fusing q/k/v, splitting Phi-3-style pre-fused
    tensors) are plain numpy indexing here, and packing via
    :func:`pack_codes_for_tpu` is dequantization-free — the 4-bit codes the
    original quantizer chose are carried through untouched.
    """

    codes: np.ndarray  # uint8 [m, n] codebook indices
    scales: np.ndarray  # fp32 [m, n // 64] dequantized block scales
    quant_type: str = "nf4"

    @property
    def shape(self) -> Tuple[int, int]:
        return tuple(self.codes.shape)

    @property
    def nbytes(self) -> int:
        return self.codes.nbytes + self.scales.nbytes

    def rows(self, r0: int, r1: int) -> "QDense":
        """Out-feature (row) slice — exact, scales are per-row."""
        return QDense(self.codes[r0:r1], self.scales[r0:r1], self.quant_type)

    def to_dense(self) -> np.ndarray:
        """Exact fp32 dequantization (``CODE[idx] * scale_block``)."""
        from .lut import get_code

        vals = get_code(self.quant_type)[self.codes]
        return vals * np.repeat(self.scales, NF4_BLOCK, axis=1)


def qdense_from_state(state: QuantState) -> QDense:
    """Decode a flat QuantState's codes and (exactly dequantized) scales.

    Handles the bnb flat-stream subtleties: absmax blocks cross row
    boundaries only when ``n % 64 != 0`` (rejected), and the double-quantized
    statistics (dynamic code table, offset — reference ``benchmark.py:23-27``)
    are resolved to fp32 here, once, exactly.
    """
    m, n = state.shape
    assert len(state.shape) == 2, "qdense_from_state expects a 2D weight"
    codes = unpack_nibbles(state.packed, m * n).reshape(m, n)
    return QDense(codes, _absmax_grid(state), state.quant_type)


def pack_for_tpu(state: QuantState, dtype=jnp.bfloat16, shards: int = 1) -> PackedNF4:
    """Convert a flat (bitsandbytes-layout) QuantState to the TPU layout.

    ``shards``: pack the in-features dim as this many independent chunks
    (each padded and pair-packed on its own) so the result can be
    contraction-sharded over ``shards`` devices.  Exact: chunk boundaries
    fall on 64-value block boundaries, so per-block scales are unchanged.
    """
    qd = qdense_from_state(state)
    return pack_codes_for_tpu(
        qd.codes, qd.scales, dtype=dtype, shards=shards,
        quant_type=state.quant_type,
    )


def pack_codes_for_tpu(
    idx: np.ndarray,
    scales: np.ndarray,
    dtype=jnp.bfloat16,
    shards: int = 1,
    quant_type: str = "nf4",
) -> PackedNF4:
    """Pack per-element 4-bit codes + per-block fp32 scales into the TPU
    layout (see module docstring).  ``idx``: uint8 [m, n]; ``scales``: fp32
    [m, n//64].  Pure layout transformation — no quantization happens here,
    so externally quantized codes (bnb checkpoints) round-trip bit-exactly.
    """
    idx = np.asarray(idx, dtype=np.uint8)
    scales = np.asarray(scales, dtype=np.float32)
    m, n = idx.shape
    assert n % NF4_BLOCK == 0, f"in_features must be a multiple of 64, got {n}"
    assert scales.shape == (m, n // NF4_BLOCK), (
        f"scales shape {scales.shape} != {(m, n // NF4_BLOCK)}"
    )
    assert n % (shards * NF4_BLOCK) == 0, (
        f"in_features {n} must split into {shards} chunks of whole 64-blocks"
    )

    n_chunk = n // shards
    m_pad = pad_to(m, 128)
    n_chunk_pad = pad_to(n_chunk, 1024)
    n_pad = n_chunk_pad * shards

    packed_chunks = []
    scale_chunks = []
    for s in range(shards):
        idx_c = np.zeros((m_pad, n_chunk_pad), dtype=np.uint8)
        idx_c[:m, :n_chunk] = idx[:, s * n_chunk : (s + 1) * n_chunk]
        sc_c = np.zeros((m_pad, n_chunk_pad // NF4_BLOCK), dtype=np.float32)
        sc_c[:m, : n_chunk // NF4_BLOCK] = scales[
            :, s * (n_chunk // NF4_BLOCK) : (s + 1) * (n_chunk // NF4_BLOCK)
        ]
        idx_t = idx_c.T  # [n_chunk_pad, m_pad]
        lo = idx_t[0::2]  # K rows 2j
        hi = idx_t[1::2]  # K rows 2j+1
        packed_chunks.append(((hi << 4) | (lo & 0xF)).astype(np.uint8))
        scale_chunks.append(sc_c.T.copy())

    return PackedNF4(
        packed=jnp.asarray(np.concatenate(packed_chunks, axis=0)),
        scales=jnp.asarray(np.concatenate(scale_chunks, axis=0)),
        shape=(m, n),
        padded_shape=(m_pad, n_pad),
        dtype=jnp.dtype(dtype),
        shards=shards,
        quant_type=quant_type,
    )


def quantize_for_tpu(
    w, dtype=jnp.bfloat16, shards: int = 1, method: str = "auto",
    quant_type: str = "nf4",
) -> PackedNF4:
    """Quantize a dense [m, n] weight straight into the TPU layout.

    ``method``: ``"oracle"`` runs the bit-exact NumPy quantizer (reference
    semantics, byte-reproducible); ``"native"`` runs the C++ host quantizer
    (``nf4.native`` — byte-identical to the oracle, ~15x faster);
    ``"device"`` runs the accelerated path (``nf4.fast_quant`` — same math
    and bit-identical scales, ~100x faster, with a documented 1-ulp
    code-boundary caveat); ``"auto"`` picks the device path for large
    tensors on an accelerator, else native when it is built, else oracle.

    ``quant_type``: "nf4" (default) or "fp4" — every method and every
    downstream kernel honors the choice.
    """
    if method not in ("auto", "oracle", "device", "native"):
        raise ValueError(
            f"method={method!r}; expected auto|oracle|native|device"
        )
    if method == "auto":
        import jax

        from . import native

        big_enough = int(np.prod(np.shape(w))) >= 1 << 22
        if big_enough and jax.default_backend() != "cpu":
            method = "device"
        elif native.available():
            method = "native"
        else:
            method = "oracle"
    if method == "device":
        from .fast_quant import quantize_for_tpu_device

        return quantize_for_tpu_device(
            w, dtype=dtype, shards=shards, quant_type=quant_type
        )
    if method == "native":
        from .native import quantize_for_tpu_native

        return quantize_for_tpu_native(
            w, dtype=dtype, shards=shards, quant_type=quant_type
        )
    w = np.asarray(w, dtype=np.float32)
    state = quantize_nf4(w, dtype=np.float16, quant_type=quant_type)
    return pack_for_tpu(state, dtype=dtype, shards=shards)


def chunk_views(pw: PackedNF4) -> list:
    """Split a shards>1 weight into per-chunk standalone PackedNF4 views.

    Zero-copy on device: each view slices contiguous row ranges of the
    packed/scale arrays.  Chunk s covers in-features [s*n/shards, ...).
    """
    if pw.shards == 1:
        return [pw]
    m, n = pw.shape
    m_pad, n_pad = pw.padded_shape
    n_chunk = n // pw.shards
    n_chunk_pad = n_pad // pw.shards
    half = n_chunk_pad // 2
    srows = n_chunk_pad // NF4_BLOCK
    views = []
    for s in range(pw.shards):
        views.append(
            PackedNF4(
                packed=jax.lax.slice_in_dim(pw.packed, s * half, (s + 1) * half, axis=0),
                scales=jax.lax.slice_in_dim(pw.scales, s * srows, (s + 1) * srows, axis=0),
                shape=(m, n_chunk),
                padded_shape=(m_pad, n_chunk_pad),
                dtype=pw.dtype,
                shards=1,
                quant_type=pw.quant_type,
            )
        )
    return views


def interleave_perm(sizes, groups: int) -> np.ndarray:
    """Out-feature permutation taking the ``groups=1`` fused row order
    (``[w0; w1; ...]``) to the per-shard-interleaved order of
    :func:`models.llama.fuse_rows`: position ``p`` of the result holds the
    groups=1 index that shard-interleaved row ``p`` corresponds to."""
    offs = np.concatenate([[0], np.cumsum(sizes)])
    out = []
    for s in range(groups):
        for i, mi in enumerate(sizes):
            assert mi % groups == 0, f"fused size {mi} % groups {groups} != 0"
            mg = mi // groups
            out.append(np.arange(offs[i] + s * mg, offs[i] + (s + 1) * mg))
    return np.concatenate(out)


def permute_out_features(pw: PackedNF4, perm) -> PackedNF4:
    """Reorder the logical out-features of a packed weight by pure indexing.

    ``perm[p]`` = source out-feature for new position ``p``.  Out-features
    live on the lane (last) axis of both ``packed`` and ``scales`` and each
    lane column is self-contained (NF4 blocks run along K), so this is an
    exact, dequant-free operation; padding columns stay in place.  Works on
    stacked ([L, ...]) weights too.
    """
    m, n = pw.shape
    m_pad, _ = pw.padded_shape
    perm = np.asarray(perm)
    assert perm.shape == (m,) and sorted(perm.tolist()) == list(range(m))
    idx = jnp.asarray(np.concatenate([perm, np.arange(m, m_pad)]))
    return pw.replace(
        packed=jnp.take(pw.packed, idx, axis=-1),
        scales=jnp.take(pw.scales, idx, axis=-1),
    )


def rechunk_shards(pw: PackedNF4, shards: int) -> PackedNF4:
    """Re-pack the K dim of a packed weight into ``shards`` independent
    chunks by pure row indexing (no dequantization).

    Exact inverse-free path between any two shard counts: real byte/scale
    rows are gathered out of the old per-chunk padding and re-padded per new
    chunk.  Bit-matches :func:`pack_for_tpu` called with ``shards`` because
    packing is per-row independent and chunk boundaries fall on whole
    64-value blocks.
    """
    if pw.shards == shards:
        return pw
    m, n = pw.shape
    m_pad, n_pad = pw.padded_shape
    assert n % (shards * NF4_BLOCK) == 0, (
        f"in_features {n} must split into {shards} chunks of whole 64-blocks"
    )
    packed = np.asarray(pw.packed)
    scales = np.asarray(pw.scales)
    g0 = pw.shards
    n_c0, n_c0_pad = n // g0, n_pad // g0

    def gather(a, unit):
        stride, real = n_c0_pad // unit, n_c0 // unit
        parts = [
            a[..., s * stride : s * stride + real, :] for s in range(g0)
        ]
        return np.concatenate(parts, axis=-2)

    pr, sr = gather(packed, 2), gather(scales, NF4_BLOCK)
    n_c1 = n // shards
    n_c1_pad = pad_to(n_c1, 1024)

    def chunk(a, unit):
        real, padded = n_c1 // unit, n_c1_pad // unit
        parts = []
        for s in range(shards):
            c = a[..., s * real : (s + 1) * real, :]
            if padded != real:
                pad_shape = (*c.shape[:-2], padded - real, c.shape[-1])
                c = np.concatenate([c, np.zeros(pad_shape, c.dtype)], axis=-2)
            parts.append(c)
        return np.concatenate(parts, axis=-2)

    return pw.replace(
        packed=jnp.asarray(chunk(pr, 2)),
        scales=jnp.asarray(chunk(sr, NF4_BLOCK)),
        padded_shape=(m_pad, n_c1_pad * shards),
        shards=shards,
    )


def to_quant_state(pw: PackedNF4, np_dtype=np.float16) -> QuantState:
    """Inverse of :func:`pack_for_tpu` (logical region only) for testing.

    Reconstructs a flat-layout state whose *dequantized* output is identical.
    The absmax stream is carried in uncompressed form (scales are already
    fully dequantized in the TPU layout, so re-deriving uint8 codes would be
    lossy); ``dequantize_nf4`` on the result is still bit-exact.
    """
    m, n = pw.shape
    m_pad, n_pad = pw.padded_shape
    n_chunk = n // pw.shards
    idx_parts, scale_parts = [], []
    for view in chunk_views(pw):
        packed = np.asarray(view.packed)
        nrows, ncols = packed.shape
        idx_t = np.empty((2 * nrows, ncols), dtype=np.uint8)
        idx_t[0::2] = packed & 0xF
        idx_t[1::2] = (packed >> 4) & 0xF
        idx_parts.append(idx_t.T[:m, :n_chunk])
        scale_parts.append(np.asarray(view.scales).T[:m, : n_chunk // NF4_BLOCK])
    idx = np.concatenate(idx_parts, axis=1)
    scales = np.concatenate(scale_parts, axis=1)  # [m, n//64]
    return QuantState(
        packed=pack_nibbles(idx.ravel()),
        absmax_u8=np.zeros(m * n // NF4_BLOCK, dtype=np.uint8),
        absmax32=scales.ravel().astype(np.float32),
        offset=np.float32(0.0),
        shape=(m, n),
        dtype=np.dtype(np_dtype),
        blocksize=NF4_BLOCK,
        blocksize2=ABSMAX_BLOCK,
        quant_type=pw.quant_type,
    )
