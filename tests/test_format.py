"""Tests for the TPU-native packed layout (nf4_tpu.nf4.format)."""

import numpy as np
import pytest

import jax.numpy as jnp

from nf4_tpu.nf4.format import PackedNF4, pack_for_tpu, quantize_for_tpu, to_quant_state
from nf4_tpu.nf4.reference import dequantize_nf4, quantize_nf4


class TestLayout:
    def test_shapes_and_padding(self, rng):
        w = rng.standard_normal((100, 320)).astype(np.float32)
        pw = quantize_for_tpu(w)
        m_pad, n_pad = pw.padded_shape
        assert pw.shape == (100, 320)
        assert m_pad % 128 == 0 and n_pad % 1024 == 0
        assert pw.packed.shape == (n_pad // 2, m_pad)
        assert pw.packed.dtype == jnp.uint8
        assert pw.scales.shape == (n_pad // 64, m_pad)
        assert pw.scales.dtype == jnp.float32

    def test_aligned_no_padding(self, rng):
        w = rng.standard_normal((128, 1024)).astype(np.float32)
        pw = quantize_for_tpu(w)
        assert pw.padded_shape == (128, 1024)

    def test_pair_layout_semantics(self, rng):
        # packed[j, r] low nibble must be W^T[2j, r]'s code and high nibble
        # W^T[2j+1, r]'s code (adjacent-pair K-interleaved layout).
        w = rng.standard_normal((128, 1024)).astype(np.float32) * 0.1
        state = quantize_nf4(w, dtype=np.float16)
        pw = pack_for_tpu(state)
        from nf4_tpu.nf4.reference import unpack_nibbles

        idx = unpack_nibbles(state.packed, w.size).reshape(128, 1024)
        packed = np.asarray(pw.packed)
        np.testing.assert_array_equal(packed & 0xF, idx.T[0::2])
        np.testing.assert_array_equal((packed >> 4) & 0xF, idx.T[1::2])

    def test_padding_scales_are_zero(self, rng):
        w = rng.standard_normal((100, 320)).astype(np.float32)
        pw = quantize_for_tpu(w)
        scales = np.asarray(pw.scales)
        # Logical region 320/64 = 5 blocks, rows beyond are padding.
        assert np.all(scales[5:, :] == 0.0)
        assert np.all(scales[:, 100:] == 0.0)
        assert np.any(scales[:5, :100] != 0.0)

    def test_roundtrip_through_quant_state(self, rng):
        # pack_for_tpu -> to_quant_state -> dequantize must be bit-identical
        # to dequantizing the original flat state.
        w = rng.standard_normal((96, 192)).astype(np.float32) * 0.05
        state = quantize_nf4(w, dtype=np.float16)
        pw = pack_for_tpu(state)
        back = to_quant_state(pw)
        np.testing.assert_array_equal(
            dequantize_nf4(back), dequantize_nf4(state)
        )

    def test_pytree_flattening(self, rng):
        import jax

        pw = quantize_for_tpu(rng.standard_normal((64, 128)).astype(np.float32))
        leaves, treedef = jax.tree_util.tree_flatten(pw)
        assert len(leaves) == 2  # packed + scales; metadata is static
        rebuilt = jax.tree_util.tree_unflatten(treedef, leaves)
        assert rebuilt.shape == pw.shape

    def test_rejects_unaligned_blocks(self, rng):
        w = rng.standard_normal((64, 100)).astype(np.float32)  # 100 % 64 != 0
        state = quantize_nf4(w, dtype=np.float16)
        with pytest.raises(AssertionError):
            pack_for_tpu(state)

    def test_memory_footprint(self, rng):
        w = rng.standard_normal((1024, 1024)).astype(np.float32)
        pw = quantize_for_tpu(w)
        # packed = m*n/2 bytes, scales = m*n/16 bytes -> 9/16 bytes/weight.
        assert pw.nbytes == 1024 * 1024 // 2 + 1024 * 1024 // 16
