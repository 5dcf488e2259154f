"""nf4_tpu — a TPU-native NF4 quantized-inference engine.

Brand-new JAX/Pallas framework covering (and extending) the capabilities of
the reference GPU package ``felipemcoelho/nf4-triton-dequantization``:
bitsandbytes-compatible NF4 dequantization with double-quantized statistics,
plus fused dequant-matmul kernels, a Llama model stack, tensor-parallel
sharding, and a serving path — all designed TPU-first.

Public API parity with the reference (``nf4_triton_dequantization/
__init__.py:7-12`` exports ``triton_dequantize_nf4`` and
``reset_triton_dequantize_state``):

* :func:`dequantize_nf4_module` — dequantize a bitsandbytes-style
  ``Linear4bit`` duck-typed module (the reference's entry-point contract).
* :func:`reset_dequantize_state` — clears cached compiled kernels (the
  reference version is an empty ``pass``; ours actually resets state).

TPU-native API:

* :func:`quantize_nf4` / :func:`dequantize_nf4` — the bit-exact flat-layout
  oracle (CPU, NumPy).
* :class:`PackedNF4`, :func:`quantize_for_tpu`, :func:`pack_for_tpu` — the
  TPU weight format.
* :func:`dequantize` / :func:`dequantize_t` — Pallas dequant kernels
  (bit-exact); :func:`dequantize_fast` / :func:`dequantize_t_fast` — the
  bf16 byte-table fast path (~2x the bandwidth, double-rounds through bf16).
* :func:`nf4_matmul` — fused dequant-matmul (packed weights never leave HBM
  in dequantized form).
"""

from .nf4.format import PackedNF4, pack_for_tpu, quantize_for_tpu, to_quant_state
from .nf4.lut import FP4_CODE, NF4_CODE, dynamic_code, get_code, nf4_code
from .nf4.reference import QuantState, dequantize_nf4, quantize_nf4
from .ops.dequant import dequantize, dequantize_fast, dequantize_t, dequantize_t_fast
from .ops.matmul import nf4_matmul

__version__ = "0.2.0"

__all__ = [
    "NF4_CODE",
    "FP4_CODE",
    "nf4_code",
    "get_code",
    "dynamic_code",
    "QuantState",
    "quantize_nf4",
    "dequantize_nf4",
    "PackedNF4",
    "pack_for_tpu",
    "quantize_for_tpu",
    "to_quant_state",
    "dequantize",
    "dequantize_t",
    "dequantize_fast",
    "dequantize_t_fast",
    "nf4_matmul",
    "dequantize_nf4_module",
    "reset_dequantize_state",
]


def dequantize_nf4_module(module):
    """Dequantize a bitsandbytes-style ``Linear4bit`` module (duck-typed).

    API-parity entry point with the reference's ``triton_dequantize_nf4``
    (reference ``kernel_optimized.py:113-139``): accepts any object exposing
    ``module.weight.data`` (packed uint8), ``module.weight.quant_state`` with
    ``absmax``/``state2.absmax``/``state2.code``/``offset``/``dtype``, and
    ``module.out_features`` / ``module.in_features``.  Returns the
    dequantized ``[m, n]`` weight as a JAX array.
    """
    import numpy as np

    from .nf4.adapters import quant_state_from_module

    state = quant_state_from_module(module)
    pw = pack_for_tpu(state, dtype=_jnp_dtype(state.dtype))
    return dequantize(pw)


def _jnp_dtype(np_dtype):
    import jax.numpy as jnp
    import numpy as np

    if np_dtype == np.float16:
        return jnp.float16
    return jnp.bfloat16


def reset_dequantize_state():
    """Clear cached compiled kernels and packed-weight conversions."""
    import jax

    jax.clear_caches()
