"""Device-accelerated quantizer vs the NumPy oracle (nf4.fast_quant)."""

import numpy as np
import pytest

import jax.numpy as jnp

from nf4_tpu.nf4.fast_quant import quantize_for_tpu_device
from nf4_tpu.nf4.format import quantize_for_tpu
from nf4_tpu.nf4.reference import dequantize_nf4, quantize_nf4


class TestFastQuant:
    @pytest.mark.parametrize("shape", [(128, 1024), (100, 320), (256, 2048)])
    def test_matches_oracle(self, rng, shape):
        w = (rng.standard_normal(shape) * 0.05).astype(np.float32)
        fast = quantize_for_tpu_device(w)
        oracle = quantize_for_tpu(w, method="oracle")
        assert fast.shape == oracle.shape
        assert fast.padded_shape == oracle.padded_shape
        # Scales come from the oracle's own stats code: bit-exact.
        np.testing.assert_array_equal(
            np.asarray(fast.scales), np.asarray(oracle.scales)
        )
        # Codes: on this backend's correctly-rounded fp32 divide the packed
        # bytes must match exactly; on TPU the documented bound is a
        # <1e-5 fraction of 1-ulp boundary ties.
        a = np.asarray(fast.packed)
        b = np.asarray(oracle.packed)
        mismatch = (a != b).mean()
        assert mismatch < 1e-5, f"mismatch fraction {mismatch}"

    def test_sharded_packing(self, rng):
        w = (rng.standard_normal((128, 2048)) * 0.05).astype(np.float32)
        fast = quantize_for_tpu_device(w, shards=2)
        oracle = quantize_for_tpu(w, shards=2, method="oracle")
        np.testing.assert_array_equal(
            np.asarray(fast.packed), np.asarray(oracle.packed)
        )
        np.testing.assert_array_equal(
            np.asarray(fast.scales), np.asarray(oracle.scales)
        )
        assert fast.shards == 2

    def test_dequant_quality(self, rng):
        # End to end: device-quantized weights dequantize to within the NF4
        # quantization error of the source.
        w = (rng.standard_normal((128, 1024)) * 0.05).astype(np.float32)
        pw = quantize_for_tpu_device(w, dtype=jnp.float32)
        from nf4_tpu.ops.dequant import dequantize

        got = np.asarray(dequantize(pw), np.float32)
        err = np.abs(got - w).max() / np.abs(w).max()
        assert err < 0.12  # NF4 cell width at 4 bits

    def test_method_dispatch_validates(self, rng):
        w = (rng.standard_normal((64, 64)) * 0.05).astype(np.float32)
        with pytest.raises(ValueError):
            quantize_for_tpu(w, method="bogus")
        # auto on CPU -> oracle path; result defined either way.
        pw = quantize_for_tpu(w, method="auto")
        assert pw.shape == (64, 64)
