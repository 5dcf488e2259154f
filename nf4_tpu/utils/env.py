"""Runtime configuration via environment variables — implemented, not just
documented.

The reference package *documents* env-var configuration (``NF4_USE_TRITON``
etc., reference ``README.md:78-80``, ``DIAGNOSTICS.md:101-106``) but contains
no ``os.environ`` read anywhere; its only real dispatch is on CUDA compute
capability (reference ``kernel_optimized.py:130-136``).  Here the flags are
real:

* ``NF4TPU_BACKEND``: ``auto`` (default) | ``pallas`` | ``jnp``.
  ``auto`` selects the Pallas kernels on TPU and the jnp reference path
  elsewhere — the TPU analog of the reference's hardware dispatch.
* ``NF4TPU_INTERPRET``: ``1`` forces Pallas interpreter mode (debugging; the
  TPU analog of the reference's diagnostics fallback).
* ``NF4TPU_MATMUL_TILE``: override fused-matmul tile sizes as ``bm,bks,bo``.
* ``NF4TPU_NATIVE``: ``auto`` (default) | ``0`` | ``1`` — the C++ host
  quantizer (``nf4.native``): ``0`` disables it, ``1`` makes a failed
  build a hard error instead of an oracle fallback.  Read in
  ``nf4/native.py`` (no jax import there, so it stays usable before
  backend init).
"""

from __future__ import annotations

import os
from typing import Optional

import jax

__all__ = [
    "backend",
    "backend_choice",
    "use_interpret",
    "on_tpu",
    "matmul_tile_override",
    "lut_mode",
    "collective_chunks",
]

_VALID_BACKENDS = ("auto", "pallas", "jnp")
_VALID_LUT_MODES = ("gather", "tree")


def on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def backend_choice() -> str:
    """The raw NF4TPU_BACKEND setting: 'auto', 'pallas', or 'jnp'.

    'auto' lets ops apply size-based dispatch (small tensors take the
    XLA-fused path even on TPU); an explicit 'pallas' forces the kernels.
    """
    choice = os.environ.get("NF4TPU_BACKEND", "auto").lower()
    if choice not in _VALID_BACKENDS:
        raise ValueError(
            f"NF4TPU_BACKEND={choice!r} invalid; expected one of {_VALID_BACKENDS}"
        )
    return choice


def backend() -> str:
    """Resolve the active compute backend: 'pallas' or 'jnp'."""
    choice = backend_choice()
    if choice == "auto":
        return "pallas" if on_tpu() else "jnp"
    return choice


def use_interpret() -> bool:
    """Whether Pallas kernels should run in interpreter mode.

    Explicit via NF4TPU_INTERPRET, or implied when the Pallas backend is
    requested on a non-TPU platform (e.g. kernel tests on a CPU host).
    """
    if os.environ.get("NF4TPU_INTERPRET", "0") == "1":
        return True
    return not on_tpu()


def lut_mode() -> str:
    """How Pallas kernels evaluate the 16-entry NF4 codebook.

    ``gather``: the TPU per-vreg dynamic-gather unit (default).
    ``tree``: a 15-select binary tree on the VPU (portable reference).
    """
    mode = os.environ.get("NF4TPU_LUT", "gather").lower()
    if mode not in _VALID_LUT_MODES:
        raise ValueError(f"NF4TPU_LUT={mode!r}; expected one of {_VALID_LUT_MODES}")
    return mode


def collective_chunks() -> int:
    """``NF4TPU_COLLECTIVE_MATMUL``: decompose each row-parallel projection's
    psum into this many per-output-chunk partial psums interleaved with the
    chunk matmuls (collective matmul).  0/unset = single blocking psum.

    The chunked program structure lets XLA's async collectives start chunk
    c's psum while chunk c+1's matmul runs (compute/communication overlap
    over ICI); it changes no math — each element sees the identical psum.
    See PERF_NOTES.md for when it should win.
    """
    raw = os.environ.get("NF4TPU_COLLECTIVE_MATMUL", "0")
    try:
        n = int(raw)
    except ValueError:
        raise ValueError(
            f"NF4TPU_COLLECTIVE_MATMUL={raw!r}; expected an integer chunk count"
        ) from None
    if n < 0:
        raise ValueError(f"NF4TPU_COLLECTIVE_MATMUL={n} must be >= 0")
    return n


def matmul_tile_override() -> Optional[tuple]:
    raw = os.environ.get("NF4TPU_MATMUL_TILE")
    if not raw:
        return None
    parts = tuple(int(p) for p in raw.split(","))
    if len(parts) != 3:
        raise ValueError("NF4TPU_MATMUL_TILE must be 'bm,bks,bo'")
    return parts
