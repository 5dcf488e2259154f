"""Tests for the bit-exact NF4 oracle (nf4_tpu.nf4.reference / lut).

The reference repo has no unit tests (SURVEY.md §4); its acceptance criteria
are differential checks against bitsandbytes/Unsloth with loose tolerances
(reference ``benchmark.py:13-16``).  Here the oracle itself is pinned by
structural invariants and exact round-trip properties.
"""

import numpy as np
import pytest

from nf4_tpu.nf4.lut import NF4_CODE, code_midpoints, dynamic_code
from nf4_tpu.nf4.reference import (
    NF4_BLOCK,
    dequantize_absmax,
    dequantize_nf4,
    pack_nibbles,
    quantize_blockwise_u8,
    quantize_nf4,
    quantize_to_code,
    unpack_nibbles,
)


class TestCodebooks:
    def test_nf4_table_values(self):
        # Exact fp32 constants from bitsandbytes (mirrored at reference
        # kernel_optimized.py:234-239).
        assert NF4_CODE.dtype == np.float32
        assert NF4_CODE.shape == (16,)
        assert NF4_CODE[0] == np.float32(-1.0)
        assert NF4_CODE[7] == np.float32(0.0)
        assert NF4_CODE[15] == np.float32(1.0)
        assert NF4_CODE[1] == np.float32(-0.6961928009986877)
        assert NF4_CODE[14] == np.float32(0.7229568362236023)
        assert np.all(np.diff(NF4_CODE) > 0)

    def test_dynamic_code_structure(self):
        code = dynamic_code()
        assert code.shape == (256,)
        assert code.dtype == np.float32
        # Sorted, spans [-1, 1], contains 0 exactly (twice: the appended zero
        # and the gap filler collapse to one value each here -> at least one).
        assert np.all(np.diff(code) >= 0)
        assert code[0] == np.float32(-1.0) or code.min() < 0
        assert code.max() == np.float32(1.0)
        assert np.any(code == 0.0)
        # Signed symmetric construction: for every positive non-boundary
        # value its negation is present.
        pos = code[(code > 0) & (code < 1.0)]
        for v in pos[:: max(1, len(pos) // 16)]:
            assert np.any(code == -v)

    def test_quantize_to_code_nearest(self):
        code = NF4_CODE
        # Every code value quantizes to its own index.
        idx = quantize_to_code(code, code)
        np.testing.assert_array_equal(idx, np.arange(16))
        # Midpoint goes to the LOWER index (strict-greater promotion).
        mids = code_midpoints(code)
        idx_mid = quantize_to_code(mids, code)
        np.testing.assert_array_equal(idx_mid, np.arange(15))
        # Just above midpoint goes to the upper index.
        idx_above = quantize_to_code(np.nextafter(mids, np.float32(2.0)), code)
        np.testing.assert_array_equal(idx_above, np.arange(1, 16))

    def test_quantize_to_code_matches_searchsorted(self, rng):
        # The vectorized binary search must be bit-identical to
        # np.searchsorted(side='left') on both codebooks, including exact
        # midpoints, their fp32 neighbors, and out-of-range values.
        from nf4_tpu.nf4.lut import dynamic_code

        for code in (NF4_CODE, dynamic_code()):
            mids = code_midpoints(code)
            x = np.concatenate(
                [
                    rng.uniform(-1.5, 1.5, size=200_000).astype(np.float32),
                    mids,
                    np.nextafter(mids, np.float32(-2.0)),
                    np.nextafter(mids, np.float32(2.0)),
                    np.asarray([-2.0, 2.0, 0.0], np.float32),
                ]
            )
            got = quantize_to_code(x, code)
            want = np.searchsorted(mids, x, side="left").astype(np.uint8)
            np.testing.assert_array_equal(got, want)


class TestPacking:
    def test_pack_roundtrip(self, rng):
        idx = rng.integers(0, 16, size=1024).astype(np.uint8)
        packed = pack_nibbles(idx)
        assert packed.shape == (512,)
        np.testing.assert_array_equal(unpack_nibbles(packed, 1024), idx)

    def test_high_nibble_first(self):
        # Element 0 lives in the HIGH nibble (reference
        # kernel_optimized.py:100-110 interleaving contract).
        packed = pack_nibbles(np.array([0xA, 0x3], dtype=np.uint8))
        assert packed[0] == 0xA3

    def test_odd_length(self):
        idx = np.array([1, 2, 3], dtype=np.uint8)
        packed = pack_nibbles(idx)
        assert packed.shape == (2,)
        np.testing.assert_array_equal(unpack_nibbles(packed, 3), idx)


class TestBlockwise8bit:
    def test_roundtrip_accuracy(self, rng):
        x = rng.standard_normal(4096).astype(np.float32) * 0.1
        codes, absmax = quantize_blockwise_u8(x, blocksize=256)
        code = dynamic_code()
        recon = code[codes] * absmax[np.arange(x.size) // 256]
        # Dynamic 8-bit quantization of smooth data: ~2-3 decimal digits.
        err = np.abs(recon - x) / (np.abs(x).max())
        assert err.max() < 0.05

    def test_absmax_values(self, rng):
        x = rng.standard_normal(512).astype(np.float32)
        _, absmax = quantize_blockwise_u8(x, blocksize=256)
        np.testing.assert_allclose(absmax[0], np.abs(x[:256]).max())
        np.testing.assert_allclose(absmax[1], np.abs(x[256:]).max())


class TestQuantizeDequantize:
    @pytest.mark.parametrize("shape", [(64,), (256,), (128, 256), (33, 64)])
    def test_shapes_and_dtypes(self, rng, shape):
        w = rng.standard_normal(shape).astype(np.float32) * 0.02
        state = quantize_nf4(w, dtype=np.float16)
        out = dequantize_nf4(state)
        assert out.shape == shape
        assert out.dtype == np.float16

    def test_reconstruction_error(self, rng):
        w = rng.standard_normal((256, 256)).astype(np.float32) * 0.02
        state = quantize_nf4(w, dtype=np.float16)
        out = dequantize_nf4(state, dtype=np.float32)
        # NF4 with double-quantized absmax: relative error per block bounded
        # by the widest NF4 cell half-width (|1.0 - 0.7229|/2 ~ 0.139 of
        # absmax) plus the ~2% absmax double-quantization error.
        err = np.abs(out - w)
        scale = np.abs(w).reshape(-1, NF4_BLOCK).max(axis=1)
        rel = err.reshape(-1, NF4_BLOCK).max(axis=1) / np.maximum(scale, 1e-8)
        assert rel.max() < 0.16

    def test_exact_representable_roundtrip(self, rng):
        # Values that are exactly code*absmax with absmax exactly encodable
        # must round-trip bit-exactly through quantize->dequantize.
        absmax = np.float32(1.0)
        idx = rng.integers(0, 16, size=(4, NF4_BLOCK)).astype(np.uint8)
        # Force at least one +/-1 per block so absmax is exactly 1.0.
        idx[:, 0] = 15
        w = NF4_CODE[idx].astype(np.float32) * absmax
        state = quantize_nf4(w, dtype=np.float16, compress_statistics=False)
        out = dequantize_nf4(state, dtype=np.float32)
        np.testing.assert_array_equal(out, w)

    def test_double_dequant_uses_offset_and_code2(self, rng):
        # The reference kernel approximates absmax dequant as /127 and drops
        # offset + code2 (kernel_optimized.py:45).  Verify our oracle does
        # NOT: reconstructed absmax must match the true per-block absmax far
        # better than the linear approximation for offset-heavy data.
        w = (rng.standard_normal((64, 256)) * 0.02 + 0.5).astype(np.float32)
        state = quantize_nf4(w, dtype=np.float16)
        true_absmax = (
            np.abs(w.ravel()).reshape(-1, NF4_BLOCK).max(axis=1).astype(np.float32)
        )
        recon = dequantize_absmax(state)
        rel = np.abs(recon - true_absmax) / true_absmax
        assert rel.max() < 0.02
        assert state.offset != 0.0

    def test_fp32_cast_point(self, rng):
        # fp32 math, single cast at the end: fp16 output must equal the fp32
        # output cast to fp16 (the bnb cast contract,
        # kernel_optimized.py:97-98,189).
        w = rng.standard_normal((8, 128)).astype(np.float32)
        state = quantize_nf4(w, dtype=np.float16)
        out16 = dequantize_nf4(state, dtype=np.float16)
        out32 = dequantize_nf4(state, dtype=np.float32)
        np.testing.assert_array_equal(out16, out32.astype(np.float16))

    def test_bfloat16_output(self, rng):
        import ml_dtypes

        w = rng.standard_normal((8, 128)).astype(np.float32)
        state = quantize_nf4(w)
        out = dequantize_nf4(state, dtype=ml_dtypes.bfloat16)
        assert out.dtype == ml_dtypes.bfloat16
        out32 = dequantize_nf4(state, dtype=np.float32)
        np.testing.assert_array_equal(out, out32.astype(ml_dtypes.bfloat16))

    def test_blocks_cross_rows_flat_layout(self, rng):
        # Flat layout: blocks run over the flattened tensor, crossing row
        # boundaries when n % 64 != 0 (bnb semantics the reference's per-row
        # repeat() hack broke, kernel_optimized.py:174-186).
        w2d = rng.standard_normal((10, 96)).astype(np.float32)
        w1d = w2d.ravel()
        s2d = quantize_nf4(w2d, dtype=np.float16)
        s1d = quantize_nf4(w1d, dtype=np.float16)
        np.testing.assert_array_equal(s2d.packed, s1d.packed)
        np.testing.assert_array_equal(s2d.absmax_u8, s1d.absmax_u8)
        np.testing.assert_array_equal(
            dequantize_nf4(s2d).ravel(), dequantize_nf4(s1d)
        )
