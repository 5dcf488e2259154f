"""Differential tests: Pallas/jnp dequant kernels vs the bit-exact oracle.

Strictly stronger than the reference's acceptance tests, which used
rtol/atol = 0.1-0.2 against Unsloth (reference ``benchmark.py:13-16``): here
every backend must match the oracle **bit-exactly**.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import nf4_tpu
from nf4_tpu.nf4.format import pack_for_tpu, quantize_for_tpu
from nf4_tpu.nf4.reference import dequantize_nf4, quantize_nf4
from nf4_tpu.ops.dequant import dequantize, dequantize_t


def _oracle(w, np_dtype):
    state = quantize_nf4(w, dtype=np_dtype)
    return state, dequantize_nf4(state)


SHAPES = [(128, 256), (128, 512), (256, 1024), (100, 320), (64, 192)]


class TestDequantBitExact:
    @pytest.mark.parametrize("shape", SHAPES)
    @pytest.mark.parametrize("backend", ["pallas", "jnp"])
    def test_vs_oracle_fp16(self, rng, monkeypatch, shape, backend):
        monkeypatch.setenv("NF4TPU_BACKEND", backend)
        w = rng.standard_normal(shape).astype(np.float32) * 0.05
        state, expected = _oracle(w, np.float16)
        pw = pack_for_tpu(state, dtype=jnp.float16)
        got = np.asarray(dequantize(pw))
        assert got.dtype == np.float16
        assert got.shape == shape
        np.testing.assert_array_equal(got, expected)

    @pytest.mark.parametrize("backend", ["pallas", "jnp"])
    def test_vs_oracle_bf16(self, rng, monkeypatch, backend):
        import ml_dtypes

        monkeypatch.setenv("NF4TPU_BACKEND", backend)
        w = rng.standard_normal((128, 256)).astype(np.float32) * 0.05
        state = quantize_nf4(w)
        expected = dequantize_nf4(state, dtype=ml_dtypes.bfloat16)
        pw = pack_for_tpu(state, dtype=jnp.bfloat16)
        got = np.asarray(dequantize(pw))
        assert got.dtype == ml_dtypes.bfloat16
        np.testing.assert_array_equal(
            got.view(np.uint16), expected.view(np.uint16)
        )

    def test_transposed_is_native(self, rng, monkeypatch):
        monkeypatch.setenv("NF4TPU_BACKEND", "pallas")
        w = rng.standard_normal((128, 256)).astype(np.float32) * 0.05
        state, expected = _oracle(w, np.float16)
        pw = pack_for_tpu(state, dtype=jnp.float16)
        got_t = np.asarray(dequantize_t(pw))
        assert got_t.shape == (256, 128)
        np.testing.assert_array_equal(got_t, expected.T)

    def test_backends_agree(self, rng, monkeypatch):
        w = rng.standard_normal((100, 320)).astype(np.float32)
        pw = quantize_for_tpu(w, dtype=jnp.float16)
        monkeypatch.setenv("NF4TPU_BACKEND", "pallas")
        a = np.asarray(dequantize(pw))
        monkeypatch.setenv("NF4TPU_BACKEND", "jnp")
        b = np.asarray(dequantize(pw))
        np.testing.assert_array_equal(a, b)


class TestFastDequant:
    """The bf16 byte-table fast path: near-exact (double rounding through
    bf16), bit-validated against the fused matmul's identical decode on real
    hardware (run_diagnostics / NF4TPU_TEST_TPU=1)."""

    @pytest.mark.parametrize("shape", [(128, 256), (100, 320), (256, 1024)])
    def test_close_to_oracle(self, rng, shape):
        import ml_dtypes

        from nf4_tpu.ops.dequant import dequantize_fast, dequantize_t_fast

        w = rng.standard_normal(shape).astype(np.float32) * 0.05
        state = quantize_nf4(w)
        expected = dequantize_nf4(state, dtype=ml_dtypes.bfloat16).astype(
            np.float32
        )
        pw = pack_for_tpu(state, dtype=jnp.bfloat16)
        got = np.asarray(dequantize_fast(pw), dtype=np.float32)
        assert got.shape == shape
        # Double rounding through bf16 costs at most ~1.06e-2 relative
        # (measured exactly on hardware; the CPU path falls back to exact).
        np.testing.assert_allclose(got, expected, rtol=1.1e-2, atol=1e-6)
        got_t = np.asarray(dequantize_t_fast(pw), dtype=np.float32)
        np.testing.assert_array_equal(got_t.T, got)

    def test_sharded_weight(self, rng):
        from nf4_tpu.ops.dequant import dequantize_t_fast

        w = rng.standard_normal((128, 2048)).astype(np.float32)
        pw = quantize_for_tpu(w, dtype=jnp.bfloat16, shards=2)
        got = np.asarray(dequantize_t_fast(pw), dtype=np.float32)
        assert got.shape == (2048, 128)
        np.testing.assert_allclose(
            got.T,
            np.asarray(
                nf4_tpu.dequantize(quantize_for_tpu(w, dtype=jnp.bfloat16))
            ).astype(np.float32),
            rtol=1.1e-2,
            atol=1e-6,
        )


class TestModuleAPI:
    def test_dequantize_nf4_module_duck_typed(self, rng):
        """The reference entry-point contract (kernel_optimized.py:113-139)
        against a synthetic bitsandbytes-shaped module."""
        from nf4_tpu.nf4.lut import dynamic_code

        w = rng.standard_normal((128, 256)).astype(np.float32) * 0.05
        state = quantize_nf4(w, dtype=np.float16)

        class NS:
            pass

        module = NS()
        module.out_features, module.in_features = state.shape
        module.weight = NS()
        module.weight.data = state.packed
        qs = NS()
        qs.absmax = state.absmax_u8
        qs.offset = state.offset
        qs.dtype = "float16"
        qs.state2 = NS()
        qs.state2.absmax = state.absmax32
        qs.state2.code = dynamic_code()
        module.weight.quant_state = qs

        got = np.asarray(nf4_tpu.dequantize_nf4_module(module))
        np.testing.assert_array_equal(got, dequantize_nf4(state))

    def test_reset_state(self):
        nf4_tpu.reset_dequantize_state()  # must not raise
