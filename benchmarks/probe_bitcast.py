"""Probe: Mosaic semantics of i32 -> bf16 bitcast inside a Pallas kernel.

Question: given word[i,j] = (hi16 << 16) | lo16 where hi16/lo16 are bf16 bit
patterns, what shape/order does a bitcast produce, and how cheaply can the
two halves be arranged for a K-contraction?
"""

import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import ml_dtypes


def bf16_bits(x):
    return np.asarray(x, dtype=ml_dtypes.bfloat16).view(np.uint16)


R, C = 8, 128
# value encoding: lo half should be value 2*(i*C+j), hi half 2*(i*C+j)+1
vals = np.arange(R * C, dtype=np.float32).reshape(R, C)
lo = bf16_bits(2 * vals).astype(np.uint32)
hi = bf16_bits(2 * vals + 1).astype(np.uint32)
words = ((hi << 16) | lo).astype(np.uint32).view(np.int32)


def probe(name, fn, out_shape):
    def kernel(w_ref, o_ref):
        o_ref[:] = fn(w_ref[:]).astype(jnp.float32)

    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(jnp.asarray(words))
        out = np.asarray(out)
        print(f"{name}: OK shape={out.shape}")
        print("  [0,:6] =", out.reshape(out.shape[0], -1)[0, :6])
        print("  [1,:6] =", out.reshape(out.shape[0], -1)[1, :6])
        if out.shape[0] >= R + 1:
            print(f"  [{R},:6] =", out.reshape(out.shape[0], -1)[R, :6])
        return out
    except Exception as e:
        print(f"{name}: FAILED ({str(e).splitlines()[0][:140]})")
        return None


# 1. raw bitcast_convert_type -> (R, C, 2)?
probe("lax.bitcast_convert_type", lambda w: jax.lax.bitcast_convert_type(w, jnp.bfloat16), (R, C, 2))

# 2. bitcast then reshape to (2R, C)
probe(
    "bitcast->reshape(2R,C)",
    lambda w: jax.lax.bitcast_convert_type(w, jnp.bfloat16).reshape(2 * R, C),
    (2 * R, C),
)

# 3. bitcast then reshape to (R, 2C)
probe(
    "bitcast->reshape(R,2C)",
    lambda w: jax.lax.bitcast_convert_type(w, jnp.bfloat16).reshape(R, 2 * C),
    (R, 2 * C),
)

# 4. pltpu.bitcast direct to bf16 (shape semantics?)
probe("pltpu.bitcast(bf16)", lambda w: pltpu.bitcast(w, jnp.bfloat16), (2 * R, C))

# 5. slice the minor dim after bitcast (two planes)
def two_planes(w):
    b = jax.lax.bitcast_convert_type(w, jnp.bfloat16)
    return jnp.concatenate([b[:, :, 0], b[:, :, 1]], axis=0)

probe("bitcast->planes concat", two_planes, (2 * R, C))
