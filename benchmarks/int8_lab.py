"""int8-recode decode-kernel lab: tile sweep + per-channel-scale variant.

Round-3 question (VERDICT item 1): the int8-recode mode measured 414/317
GB/s at the Llama-3-8B MLP decode shapes in BENCH_r02 against a ~700 GB/s
same-pass dense calibration — the target is >=85%.  Hypotheses:

  (a) the 4096x14336 shape has a bad tile (sweep bk/bo);
  (b) the per-64-row-block scale multiply costs ~1 VPU op per weight
      element (~60 us at these shapes) and serializes with the MXU dot —
      moving the scale to the OUTPUT (per-channel scales: one fp32 per
      output column, folded after the K accumulation) removes almost all
      of it: bm*bo scaled elements instead of bk*bo per tile.

This lab measures, interleaved in one process (shared-chip drift):
  * dense bf16 matmul calibration (the roofline denominator),
  * the shipped block-scale int8 kernel over a tile sweep,
  * a per-channel-scale int8 kernel over the same tiles.

Timing: chained marginal of per-chain-length minima (see PERF_NOTES.md).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nf4_tpu.nf4.format import quantize_for_tpu
from nf4_tpu.ops.int8_serve import recode_int8_weight, _int8_matmul_pallas


def marginal_chain(f, x0, n1=20, n2=100, reps=4):
    def run(n):
        x = x0
        t0 = time.perf_counter()
        for _ in range(n):
            x = f(x)
        _ = float(np.asarray(x[(0,) * x.ndim], np.float32))
        return time.perf_counter() - t0

    run(5)
    t1s, t2s = [], []
    for _ in range(reps):
        t1s.append(run(n1))
        t2s.append(run(n2))
    return max((min(t2s) - min(t1s)) / (n2 - n1), 1e-9)


def _make_colscale_kernel():
    def kernel(x_ref, w_ref, s_ref, o_ref, acc_ref):
        ik = pl.program_id(2)
        nk = pl.num_programs(2)

        @pl.when(ik == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        w = w_ref[:].astype(jnp.bfloat16)
        acc_ref[:] += jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)

        @pl.when(ik == nk - 1)
        def _store():
            o_ref[:] = (acc_ref[:] * s_ref[:]).astype(o_ref.dtype)

    return kernel


def colscale_matmul(x_pad, values, scales_col, out_dtype, tiles):
    import functools

    @functools.partial(jax.jit, static_argnames=("od", "t"))
    def run(x_pad, values, scales_col, od, t):
        bm, bk, bo = t
        b_pad = x_pad.shape[0]
        n_pad, m_pad = values.shape
        grid = (b_pad // bm, m_pad // bo, n_pad // bk)
        return pl.pallas_call(
            _make_colscale_kernel(),
            grid=grid,
            in_specs=[
                pl.BlockSpec((bm, bk), lambda b, o, k: (b, k), memory_space=pltpu.VMEM),
                pl.BlockSpec((bk, bo), lambda b, o, k: (k, o), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bo), lambda b, o, k: (0, o), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (bm, bo), lambda b, o, k: (b, o), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((b_pad, m_pad), od),
            scratch_shapes=[pltpu.VMEM((bm, bo), jnp.float32)],
        )(x_pad, values, scales_col)

    return run(x_pad, values, scales_col, out_dtype, tiles)


def main():
    rng = np.random.default_rng(0)
    batch = 16
    shapes = [(14336, 4096), (4096, 14336)]

    wd = jax.random.normal(jax.random.PRNGKey(0), (8192, 8192), jnp.bfloat16)
    xd = jax.random.normal(jax.random.PRNGKey(1), (16, 8192), jnp.bfloat16)
    mm = jax.jit(lambda x: (x @ wd) * 1e-3)

    cases = []  # (label, step_fn, x0, weight_bytes)
    for m, n in shapes:
        w = (rng.standard_normal((m, n)) * 0.02).astype(np.float32)
        p8 = recode_int8_weight(quantize_for_tpu(w, dtype=jnp.bfloat16))
        n_pad, m_pad = p8.values.shape
        xb = jax.random.normal(jax.random.PRNGKey(2), (batch, n_pad), jnp.bfloat16)

        # per-channel recode of the same dequantized weight (timing only)
        wt = np.ascontiguousarray(w.T)  # [n, m]
        wt_pad = np.zeros((n_pad, m_pad), np.float32)
        wt_pad[:n, :m] = wt
        cmax = np.abs(wt_pad).max(axis=0, keepdims=True) + 1e-12
        v8c = jnp.asarray(np.clip(np.round(127.0 * wt_pad / cmax), -127, 127).astype(np.int8))
        s_col = jnp.asarray((cmax / 127.0).astype(np.float32))

        tiles = []
        for bk in (4096, 2048, 1024):
            for bo in (2048, 1024, 512):
                if n_pad % bk == 0 and m_pad % bo == 0 and bk * bo <= 4 * 2**20:
                    tiles.append((16, bk, bo))

        for t in tiles:
            if (t[1] // 64) * t[2] * 4 <= 4 * 2**20:  # block-scale tile budget

                def step_blk(x, p8=p8, t=t):
                    y = _int8_matmul_pallas(x, p8.values, p8.scales, jnp.bfloat16, t, False)
                    return x + y[:, 0:1].astype(x.dtype) * jnp.bfloat16(1e-30)

                cases.append((f"blk {m}x{n} {t}", step_blk, xb, p8.nbytes))

            def step_col(x, v=v8c, s=s_col, t=t):
                y = colscale_matmul(x, v, s, jnp.bfloat16, t)
                return x + y[:, 0:1].astype(x.dtype) * jnp.bfloat16(1e-30)

            cases.append((f"col {m}x{n} {t}", step_col, xb, v8c.size + s_col.size * 4))

    print(f"{len(cases)} cases; compiling...", flush=True)
    compiled = []
    for label, f, x0, nb in cases:
        try:
            jf = jax.jit(f)
            _ = jf(x0)
            compiled.append((label, jf, x0, nb))
            print(f"  ok: {label}", flush=True)
        except Exception as e:
            print(f"  FAIL {label}: {str(e)[:120]}", flush=True)

    best = {}
    for rnd in range(3):
        dt = marginal_chain(mm, xd)
        roof = wd.size * 2 / dt / 1e9
        print(f"[r{rnd}] dense calibration: {roof:.0f} GB/s", flush=True)
        for label, jf, x0, nb in compiled:
            t = marginal_chain(jf, x0)
            gbps = nb / t / 1e9
            prev = best.get(label)
            if prev is None or t < prev[0]:
                best[label] = (t, gbps, gbps / roof)
            print(
                f"[r{rnd}] {label}: {t*1e6:.0f} us  {gbps:.0f} GB/s"
                f"  ({gbps/roof*100:.0f}% of same-pass roofline)",
                flush=True,
            )

    print("\n=== best per case ===")
    for label, (t, gbps, frac) in sorted(best.items(), key=lambda kv: -kv[1][2]):
        print(f"  {label}: {t*1e6:.0f} us  {gbps:.0f} GB/s  {frac*100:.0f}%")


if __name__ == "__main__":
    main()
