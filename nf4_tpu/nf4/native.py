"""ctypes bindings for the native (C++) host-side NF4 quantizer.

The oracle quantizer (:mod:`nf4.reference`) is NumPy-searchsorted-bound at
~25M elements/s — minutes for a billion-parameter checkpoint when no
accelerator is attached (multi-host CPU loading, or an unreachable remote
compile endpoint).  ``nf4quant.cpp`` runs the two hot loops (block
absmax + code assignment, and the K-major pair pack of
``nf4/format.py:pack_for_tpu``) as tight C++ with the SAME IEEE-754
single-precision operations, so the output is **byte-identical** to the
oracle (tests/test_native.py asserts array_equal on every field).

Statistics stay in Python: the fp64 absmax mean and the 256-entry dynamic
double-quantization run through the oracle's own helpers on the small
(numel/64) absmax stream, so their bit-exactness is inherited, not
re-proven.

Build: compiled on first use with ``g++ -O3`` (never ``-ffast-math`` — the
bit-exactness contract depends on correctly-rounded division).  The shared
object is cached next to the source when writable, else under
``~/.cache/nf4_tpu``, keyed by a source hash.  Everything degrades
gracefully: :func:`available` is False when no compiler exists, and
``quantize_for_tpu(method="auto")`` falls back to the oracle.

The reference GPU package has no quantizer at all — it consumes weights
bitsandbytes already quantized (reference ``benchmark.py:25-36``); this
module exists because a standalone framework must own checkpoint
quantization time (``models/loader.py`` streams 70B checkpoints through
it layer by layer).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

__all__ = [
    "available",
    "quantize_codes",
    "pack_flat",
    "pack_kmajor",
    "quantize_nf4_native",
    "quantize_for_tpu_native",
]

_SRC = Path(__file__).with_name("nf4quant.cpp")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    src = _SRC.read_bytes()
    tag = hashlib.sha256(src).hexdigest()[:16]
    name = f"libnf4quant-{tag}.so"
    for cache_dir in (_SRC.parent, Path.home() / ".cache" / "nf4_tpu"):
        so = cache_dir / name
        if so.exists():
            return ctypes.CDLL(str(so))
        try:
            cache_dir.mkdir(parents=True, exist_ok=True)
            # Build to a temp name then rename: atomic against concurrent
            # loaders (multi-host launches build simultaneously).
            with tempfile.NamedTemporaryFile(
                dir=cache_dir, suffix=".so", delete=False
            ) as tmp:
                tmp_path = Path(tmp.name)
            # -march=native: the .so is built on the host that runs it, so
            # wider SIMD is free.  NEVER -ffast-math: bit-exactness needs
            # correctly-rounded division and ordered compares.
            cmd = [
                "g++",
                "-O3",
                "-march=native",
                "-shared",
                "-fPIC",
                "-std=c++17",
                str(_SRC),
                "-o",
                str(tmp_path),
            ]
            proc = subprocess.run(cmd, capture_output=True, timeout=120)
            if proc.returncode != 0:
                tmp_path.unlink(missing_ok=True)
                raise RuntimeError(proc.stderr.decode()[:500])
            tmp_path.replace(so)
            return ctypes.CDLL(str(so))
        except (OSError, RuntimeError, subprocess.TimeoutExpired):
            continue
    return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    mode = os.environ.get("NF4TPU_NATIVE", "auto").lower()
    if mode not in ("auto", "0", "1"):
        raise ValueError(f"NF4TPU_NATIVE={mode!r}; expected auto|0|1")
    if mode == "0":
        return None
    lib = _build_and_load()
    if lib is None:
        if mode == "1":
            raise RuntimeError(
                "NF4TPU_NATIVE=1 but the native quantizer failed to build "
                "(g++ missing or no writable cache dir)"
            )
        return None
    u8 = ctypes.POINTER(ctypes.c_uint8)
    f32 = ctypes.POINTER(ctypes.c_float)
    i64 = ctypes.c_int64
    lib.nf4_quantize_codes.argtypes = [f32, i64, i64, f32, i64, u8, f32]
    lib.nf4_quantize_codes.restype = None
    lib.nf4_pack_flat.argtypes = [u8, i64, u8]
    lib.nf4_pack_flat.restype = None
    lib.nf4_pack_kmajor.argtypes = [u8, i64, i64, i64, i64, i64, u8]
    lib.nf4_pack_kmajor.restype = None
    _lib = lib
    return _lib


def available() -> bool:
    """True when the native quantizer built (or was cached) and loaded."""
    try:
        return _load() is not None
    except (ValueError, RuntimeError):
        return False


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def quantize_codes(
    w_flat: np.ndarray, blocksize: int, mids: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Block absmax + #{mids < x/scale} codes for a flat fp32 stream."""
    lib = _load()
    assert lib is not None, "native quantizer unavailable (check available())"
    w_flat = np.ascontiguousarray(w_flat, dtype=np.float32)
    mids = np.ascontiguousarray(mids, dtype=np.float32)
    n = w_flat.shape[0]
    nblocks = -(-n // blocksize)
    codes = np.empty(n, dtype=np.uint8)
    absmax = np.empty(nblocks, dtype=np.float32)
    lib.nf4_quantize_codes(
        _f32p(w_flat), n, blocksize, _f32p(mids), mids.shape[0],
        _u8p(codes), _f32p(absmax),
    )
    return codes, absmax


def pack_flat(codes: np.ndarray) -> np.ndarray:
    """bitsandbytes flat nibble pack (element 2i in the HIGH nibble)."""
    lib = _load()
    assert lib is not None, "native quantizer unavailable (check available())"
    codes = np.ascontiguousarray(codes, dtype=np.uint8).ravel()
    n = codes.shape[0]
    out = np.empty(-(-n // 2), dtype=np.uint8)
    lib.nf4_pack_flat(_u8p(codes), n, out.ctypes.data_as(
        ctypes.POINTER(ctypes.c_uint8)))
    return out


def pack_kmajor(
    codes: np.ndarray, m_pad: int, n_chunk_pad: int, shards: int
) -> np.ndarray:
    """Adjacent-pair K-major pack of a [m, n] code grid (format.py layout)."""
    lib = _load()
    assert lib is not None, "native quantizer unavailable (check available())"
    codes = np.ascontiguousarray(codes, dtype=np.uint8)
    m, n = codes.shape
    assert n % shards == 0 and (n // shards) % 2 == 0
    out = np.empty((shards * (n_chunk_pad // 2), m_pad), dtype=np.uint8)
    lib.nf4_pack_kmajor(
        _u8p(codes), m, n, m_pad, n_chunk_pad, shards, _u8p(out)
    )
    return out


def _native_codes(w_flat: np.ndarray, quant_type: str):
    """4-bit code assignment via the C++ block walker, any codebook.

    NF4 (monotone table): direct — the C tree computes #{mids < x}.
    FP4 (sign-magnitude): run the tree on |x| against the 7 sorted-
    magnitude midpoints, remap sorted position -> table index, add the
    sign bit for x < 0 — byte-identical to the oracle's quantize_to_code.
    The per-block absmax is the same either way (computed from |x|).
    """
    from .lut import code_midpoints, fp4_order_and_mids, get_code
    from .reference import NF4_BLOCK

    code = get_code(quant_type)
    if quant_type == "nf4":
        return quantize_codes(w_flat, NF4_BLOCK, code_midpoints(code))
    order, mids = fp4_order_and_mids(code)
    pos, absmax = quantize_codes(np.abs(w_flat), NF4_BLOCK, mids)
    codes = order[pos] + np.where(w_flat < 0, 8, 0).astype(np.uint8)
    return codes, absmax


def quantize_nf4_native(w: np.ndarray, dtype=None, quant_type: str = "nf4"):
    """Byte-identical :func:`nf4.reference.quantize_nf4`, C++ hot loops."""
    from .reference import (
        ABSMAX_BLOCK,
        NF4_BLOCK,
        QuantState,
        quantize_blockwise_u8,
    )

    w = np.asarray(w)
    if dtype is None:
        dtype = w.dtype if w.dtype in (np.float16,) else np.dtype(np.float32)
    shape = w.shape
    w_flat = np.ascontiguousarray(w, dtype=np.float32).ravel()

    codes, absmax = _native_codes(w_flat, quant_type)
    packed = pack_flat(codes)
    # Statistics via the oracle's own helpers (small stream, bit-exact).
    offset = np.float32(absmax.mean(dtype=np.float64))
    absmax_u8, absmax32 = quantize_blockwise_u8(absmax - offset, ABSMAX_BLOCK)
    return QuantState(
        packed=packed,
        absmax_u8=absmax_u8,
        absmax32=absmax32.astype(np.float32),
        offset=offset,
        shape=tuple(shape),
        dtype=np.dtype(dtype),
        blocksize=NF4_BLOCK,
        blocksize2=ABSMAX_BLOCK,
        quant_type=quant_type,
    )


def quantize_for_tpu_native(
    w: np.ndarray, dtype=None, shards: int = 1, quant_type: str = "nf4"
):
    """Dense [m, n] -> PackedNF4, byte-identical to the oracle path
    (``quantize_for_tpu(method="oracle")``) with C++ hot loops."""
    import jax.numpy as jnp

    from .format import PackedNF4, pad_to
    from .reference import (
        ABSMAX_BLOCK,
        NF4_BLOCK,
        QuantState,
        dequantize_absmax,
        quantize_blockwise_u8,
    )

    if dtype is None:
        dtype = jnp.bfloat16
    w = np.ascontiguousarray(np.asarray(w), dtype=np.float32)
    m, n = w.shape
    assert n % NF4_BLOCK == 0, f"in_features must be a multiple of 64, got {n}"
    assert n % (shards * NF4_BLOCK) == 0

    codes, absmax = _native_codes(w.ravel(), quant_type)

    offset = np.float32(absmax.mean(dtype=np.float64))
    absmax_u8, absmax32 = quantize_blockwise_u8(absmax - offset, ABSMAX_BLOCK)
    scales_grid = dequantize_absmax(
        QuantState(
            packed=np.zeros(0, np.uint8),
            absmax_u8=absmax_u8,
            absmax32=absmax32,
            offset=offset,
            shape=(m, n),
            dtype=np.dtype(np.float16),
        )
    ).reshape(m, n // NF4_BLOCK)

    n_chunk = n // shards
    m_pad = pad_to(m, 128)
    n_chunk_pad = pad_to(n_chunk, 1024)
    packed = pack_kmajor(codes.reshape(m, n), m_pad, n_chunk_pad, shards)

    scale_chunks = []
    for s in range(shards):
        sc = np.zeros((m_pad, n_chunk_pad // NF4_BLOCK), np.float32)
        sc[:m, : n_chunk // NF4_BLOCK] = scales_grid[
            :, s * (n_chunk // NF4_BLOCK) : (s + 1) * (n_chunk // NF4_BLOCK)
        ]
        scale_chunks.append(sc.T)
    scales = np.concatenate(scale_chunks, axis=0)

    return PackedNF4(
        packed=jnp.asarray(packed),
        scales=jnp.asarray(scales),
        shape=(m, n),
        padded_shape=(m_pad, n_chunk_pad * shards),
        dtype=jnp.dtype(dtype),
        shards=shards,
        quant_type=quant_type,
    )
