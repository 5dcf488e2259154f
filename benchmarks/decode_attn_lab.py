"""Decode-attention efficiency over long KV caches (real TPU).

Long-context decode reads the live KV prefix every step; once the weights
stream at the HBM roofline (int8 mode) and spec chunks amortize the host
syncs, the KV read is the next structural cost.  This lab measures the
shipped chunk-skipping XLA decode attention (ops/attention.py
chunked_attention at S=1) against the same-pass dense-matmul HBM
calibration, as GB/s over the LIVE KV bytes — i.e. how far the decode
attention path sits from its own memory roofline.

Usage:
  python benchmarks/decode_attn_lab.py [--ctx 8192] [--batch 1,8]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from nf4_tpu.ops.attention import attention
from nf4_tpu.utils.timing import measure_chained_s


def dense_calibration():
    """Same-pass HBM rate from a big bf16 matmul (the bench.py trick)."""
    m = 8192
    w = jnp.asarray(
        np.random.default_rng(0).standard_normal((m, m)), jnp.bfloat16
    )
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((16, m)), jnp.bfloat16
    )

    @jax.jit
    def step(x):
        y = jnp.dot(x, w, preferred_element_type=jnp.float32)
        return (x + jnp.max(y) * 1e-30).astype(jnp.bfloat16)

    st = measure_chained_s(step, x, n1=10, n2=40, repeats=3)
    return (m * m * 2) / st.median / 1e9  # GB/s


def run_shape(name, b, h, kv, d, ctx, int8_kv):
    rng = np.random.default_rng(0)
    kdt = jnp.int8 if int8_kv else jnp.bfloat16
    k = jnp.asarray(rng.integers(-80, 80, (b, kv, ctx, d)), kdt)
    v = jnp.asarray(rng.integers(-80, 80, (b, kv, ctx, d)), kdt)
    ks = vs = (
        jnp.asarray(rng.uniform(0.5, 2.0, (b, kv, ctx)), jnp.float32)
        if int8_kv
        else None
    )
    q0 = jnp.asarray(rng.standard_normal((b, h, 1, d)), jnp.bfloat16)
    positions = jnp.full((b, 1), ctx - 1, jnp.int32)
    seq_lens = jnp.full((b,), ctx, jnp.int32)

    @jax.jit
    def step(q):
        out = attention(
            q, k, v, positions, seq_lens,
            scale=d ** -0.5, k_scale=ks, v_scale=vs,
        )
        return (q + jnp.max(out) * 1e-30).astype(jnp.bfloat16)

    st = measure_chained_s(step, q0, n1=10, n2=40, repeats=3)
    kv_bytes = 2 * b * kv * ctx * d * (1 if int8_kv else 2)
    if int8_kv:
        kv_bytes += 2 * b * kv * ctx * 4  # fp32 scales stream too
    gbps = kv_bytes / st.median / 1e9
    return st.median, kv_bytes, gbps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ctx", type=int, default=8192)
    ap.add_argument("--batch", default="1,8")
    args = ap.parse_args()

    print(f"device: {jax.devices()[0].device_kind}")
    cal = dense_calibration()
    print(f"dense-matmul calibration: {cal:.0f} GB/s")

    shapes = [
        ("tinyllama (32q/4kv D=64)", 32, 4, 64),
        ("llama3-8b (32q/8kv D=128)", 32, 8, 128),
    ]
    for b in [int(x) for x in args.batch.split(",")]:
        for name, h, kv, d in shapes:
            for int8_kv in (False, True):
                t, nbytes, gbps = run_shape(
                    name, b, h, kv, d, args.ctx, int8_kv
                )
                tag = "int8" if int8_kv else "bf16"
                print(
                    f"b={b} {name} {tag} ctx={args.ctx}: "
                    f"{t * 1e3:7.3f} ms  {nbytes / 2**20:6.1f} MiB KV  "
                    f"{gbps:6.1f} GB/s  ({gbps / cal * 100:4.1f}% of "
                    "same-pass calibration)"
                )


if __name__ == "__main__":
    main()
