"""Sweep NF4TPU_MATMUL_TILE configs for the shipped byte-table kernel on the
headline shape, interleaved with repeats to ride out chip drift; reports the
best marginal per config."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from nf4_tpu.nf4.format import quantize_for_tpu
from nf4_tpu.ops.matmul import _matmul_pallas_bf16
from nf4_tpu.utils.timing import measure_chained_s

M = N = 8192
rng = np.random.default_rng(0)
w = (rng.standard_normal((M, N)) * 0.02).astype(np.float32)
pw = quantize_for_tpu(w, dtype=jnp.bfloat16)
wbytes = pw.packed.size + pw.scales.size * 4
x = jax.random.normal(jax.random.PRNGKey(1), (16, N), jnp.bfloat16)

configs = [(16, 512, 256), (16, 1024, 256), (16, 2048, 256), (16, 1024, 512), (16, 2048, 512), (16, 4096, 256)]
runners = {}
for cfg in configs:
    try:
        fn = lambda xc, cfg=cfg: _matmul_pallas_bf16(
            xc, pw.packed, pw.scales, jnp.bfloat16, cfg, False
        )
        out = fn(x)
        out.block_until_ready()
        runners[cfg] = jax.jit(
            lambda xc, fn=fn: xc + fn(xc)[:, 0:1].astype(xc.dtype) * jnp.bfloat16(1e-30)
        )
        print(f"{cfg}: compiled")
    except Exception as e:
        print(f"{cfg}: FAILED ({str(e)[:100]})")

best = {}
for rnd in range(3):
    for cfg, step in runners.items():
        st = measure_chained_s(step, x, n1=20, n2=100, repeats=3)
        t = st.min
        best[cfg] = min(best.get(cfg, 9e9), t)
        print(f"[r{rnd}] {cfg}: {t * 1e6:.0f} us ({wbytes / t / 1e9:.0f} GB/s)")

print("\nbest per config:")
for cfg, t in sorted(best.items(), key=lambda kv: kv[1]):
    print(f"  {cfg}: {t * 1e6:.0f} us ({wbytes / t / 1e9:.0f} GB/s)")
