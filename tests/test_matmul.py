"""Tests for the fused NF4 dequant-matmul (nf4_tpu.ops.matmul).

Correctness contract: the fused kernel must match ``x @ dequantize(W)^T``
computed with the bit-exact dequantized weight in fp32.  Accumulation order
differs between backends, so the comparison uses a tight fp32-relative
tolerance (not the reference's 0.1/0.2, ``benchmark.py:13-16``).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from nf4_tpu.nf4.format import quantize_for_tpu
from nf4_tpu.nf4.reference import dequantize_nf4, quantize_nf4
from nf4_tpu.ops.matmul import nf4_matmul


def _expected(x, w, np_dtype=np.float32):
    state = quantize_nf4(w, dtype=np.float16)
    wd = dequantize_nf4(state, dtype=np.float32)
    return (x.astype(np.float32) @ wd.T).astype(np_dtype)


class TestFusedMatmul:
    @pytest.mark.parametrize("backend", ["pallas", "jnp"])
    @pytest.mark.parametrize(
        "bshape,m,n",
        [
            ((4,), 128, 1024),
            ((2, 8), 128, 1024),
            ((16,), 256, 2048),
            ((3,), 100, 320),  # unaligned logical dims exercise padding
        ],
    )
    def test_matches_dequant_matmul(self, rng, monkeypatch, backend, bshape, m, n):
        monkeypatch.setenv("NF4TPU_BACKEND", backend)
        w = rng.standard_normal((m, n)).astype(np.float32) * 0.05
        x = rng.standard_normal((*bshape, n)).astype(np.float32)
        pw = quantize_for_tpu(w, dtype=jnp.float32)
        y = np.asarray(nf4_matmul(jnp.asarray(x), pw))
        assert y.shape == (*bshape, m)
        expected = _expected(x, w)
        np.testing.assert_allclose(y, expected, rtol=2e-5, atol=2e-5)

    @pytest.mark.parametrize("backend", ["pallas", "jnp"])
    def test_bf16_activations(self, rng, monkeypatch, backend):
        monkeypatch.setenv("NF4TPU_BACKEND", backend)
        w = rng.standard_normal((128, 1024)).astype(np.float32) * 0.05
        x = rng.standard_normal((8, 1024)).astype(np.float32)
        pw = quantize_for_tpu(w, dtype=jnp.bfloat16)
        y = np.asarray(
            nf4_matmul(jnp.asarray(x, dtype=jnp.bfloat16), pw).astype(jnp.float32)
        )
        expected = _expected(x, w)
        # bf16 inputs: ~3 decimal digits; accumulation in fp32.
        np.testing.assert_allclose(y, expected, rtol=2e-2, atol=2e-2 * np.abs(expected).max())

    @pytest.mark.parametrize("backend", ["pallas", "jnp"])
    def test_fp16_activations(self, rng, monkeypatch, backend):
        # f16 rides the fp32 exact kernel (Mosaic has no f16 type).
        monkeypatch.setenv("NF4TPU_BACKEND", backend)
        w = rng.standard_normal((128, 1024)).astype(np.float32) * 0.05
        x = rng.standard_normal((8, 1024)).astype(np.float32)
        pw = quantize_for_tpu(w, dtype=jnp.float16)
        y = nf4_matmul(jnp.asarray(x, dtype=jnp.float16), pw)
        assert y.dtype == jnp.float16
        expected = _expected(x, w)
        np.testing.assert_allclose(
            np.asarray(y, np.float32),
            expected,
            rtol=2e-3,
            atol=2e-3 * np.abs(expected).max(),
        )

    def test_backends_agree_closely(self, rng, monkeypatch):
        w = rng.standard_normal((256, 1024)).astype(np.float32) * 0.05
        x = rng.standard_normal((4, 1024)).astype(np.float32)
        pw = quantize_for_tpu(w, dtype=jnp.float32)
        monkeypatch.setenv("NF4TPU_BACKEND", "pallas")
        a = np.asarray(nf4_matmul(jnp.asarray(x), pw))
        monkeypatch.setenv("NF4TPU_BACKEND", "jnp")
        b = np.asarray(nf4_matmul(jnp.asarray(x), pw))
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)

    def test_batch_one_decode_shape(self, rng, monkeypatch):
        # The decode GEMV case: batch 1.
        monkeypatch.setenv("NF4TPU_BACKEND", "pallas")
        w = rng.standard_normal((128, 1024)).astype(np.float32) * 0.05
        x = rng.standard_normal((1, 1024)).astype(np.float32)
        pw = quantize_for_tpu(w, dtype=jnp.float32)
        y = np.asarray(nf4_matmul(jnp.asarray(x), pw))
        np.testing.assert_allclose(y, _expected(x, w), rtol=2e-5, atol=2e-5)
