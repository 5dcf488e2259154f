"""Native (C++) host quantizer: byte-identical to the NumPy oracle.

The contract is stronger than the device path's (fast_quant tolerates
1-ulp code-boundary ties): every field of the QuantState and every byte
of the packed TPU layout must be array_equal to the oracle's.  The
reference package has no quantizer (it consumes bitsandbytes output,
reference benchmark.py:25-36); the oracle defines the semantics here.
"""

import numpy as np
import pytest

from nf4_tpu.nf4 import native
from nf4_tpu.nf4.format import quantize_for_tpu
from nf4_tpu.nf4.lut import NF4_CODE, code_midpoints, dynamic_code
from nf4_tpu.nf4.reference import quantize_nf4, quantize_to_code

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native quantizer did not build (no g++?)"
)


def _rand(shape, seed, scale=0.05):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(shape) * scale).astype(np.float32)


class TestQuantizeCodes:
    @pytest.mark.parametrize("n", [64, 128, 4096, 100, 63, 65, 1])
    def test_codes_and_absmax_match_oracle(self, n):
        w = _rand((n,), seed=n)
        codes, absmax = native.quantize_codes(
            w, 64, code_midpoints(NF4_CODE)
        )
        # Oracle: per-64-block absmax, then #{mids < x/scale}.
        nb = -(-n // 64)
        wp = np.concatenate([w, np.zeros(nb * 64 - n, np.float32)])
        am = np.abs(wp.reshape(nb, 64)).max(axis=1)
        np.testing.assert_array_equal(absmax, am)
        sc = np.where(am > 0, am, np.float32(1.0))
        want = quantize_to_code(
            (wp.reshape(nb, 64) / sc[:, None]).astype(np.float32), NF4_CODE
        ).ravel()[:n]
        np.testing.assert_array_equal(codes, want)

    def test_zero_block_uses_unit_scale(self):
        w = np.zeros(64, np.float32)
        codes, absmax = native.quantize_codes(w, 64, code_midpoints(NF4_CODE))
        assert absmax[0] == 0.0
        # 0/1.0 = 0.0 -> the code for 0 (index 7 in NF4).
        assert (codes == quantize_to_code(np.zeros(64, np.float32), NF4_CODE)).all()

    def test_midpoint_tie_goes_left(self):
        """x exactly ON a midpoint keeps the lower index (searchsorted
        side='left' / bnb's strictly-greater tree comparisons)."""
        mids = code_midpoints(NF4_CODE)
        # Build a block whose absmax is exactly 1 so norms pass unscaled.
        w = np.full(64, mids[8], np.float32)
        w[0] = 1.0  # absmax anchor
        codes, _ = native.quantize_codes(w, 64, mids)
        want = quantize_to_code(w, NF4_CODE)
        np.testing.assert_array_equal(codes, want)

    def test_generic_midcount_fallback(self):
        """A non-(2^k - 1) midpoint table exercises the lower_bound arm."""
        mids = np.asarray([-0.5, 0.0, 0.5], np.float32)  # 3 = 2^2-1 actually
        mids5 = np.asarray([-0.6, -0.2, 0.0, 0.2, 0.6], np.float32)  # 5 mids
        w = _rand((256,), seed=9, scale=1.0)
        codes, _ = native.quantize_codes(w, 64, mids5)
        am = np.abs(w.reshape(4, 64)).max(axis=1)
        sc = np.where(am > 0, am, np.float32(1.0))
        norm = (w.reshape(4, 64) / sc[:, None]).astype(np.float32)
        want = np.searchsorted(mids5, norm, side="left").astype(np.uint8).ravel()
        np.testing.assert_array_equal(codes, want)
        del mids


class TestQuantStateParity:
    @pytest.mark.parametrize(
        "shape", [(8, 64), (100, 320), (128, 1024), (257, 192), (3, 5)]
    )
    def test_quant_state_fields_byte_identical(self, shape):
        w = _rand(shape, seed=sum(shape))
        got = native.quantize_nf4_native(w)
        want = quantize_nf4(w)
        np.testing.assert_array_equal(got.packed, want.packed)
        np.testing.assert_array_equal(got.absmax_u8, want.absmax_u8)
        np.testing.assert_array_equal(got.absmax32, want.absmax32)
        assert got.offset == want.offset
        assert got.shape == want.shape

    def test_odd_numel_tail_nibble(self):
        w = _rand((3, 5), seed=1)
        got = native.quantize_nf4_native(w)
        want = quantize_nf4(w)
        np.testing.assert_array_equal(got.packed, want.packed)


class TestPackedParity:
    @pytest.mark.parametrize(
        "shape,shards",
        [((128, 1024), 1), ((100, 320), 1), ((256, 2048), 2), ((64, 4096), 4)],
    )
    def test_packed_layout_byte_identical(self, shape, shards):
        w = _rand(shape, seed=shape[0] + shards)
        got = quantize_for_tpu(w, method="native", shards=shards)
        want = quantize_for_tpu(w, method="oracle", shards=shards)
        np.testing.assert_array_equal(
            np.asarray(got.packed), np.asarray(want.packed)
        )
        np.testing.assert_array_equal(
            np.asarray(got.scales), np.asarray(want.scales)
        )
        assert got.shape == want.shape
        assert got.padded_shape == want.padded_shape
        assert got.shards == want.shards

    def test_auto_on_cpu_prefers_native_and_stays_exact(self):
        """method='auto' off-accelerator routes through the native path and
        still matches the oracle byte-for-byte (the dispatch is invisible)."""
        w = _rand((128, 1024), seed=7)
        got = quantize_for_tpu(w, method="auto")
        want = quantize_for_tpu(w, method="oracle")
        np.testing.assert_array_equal(
            np.asarray(got.packed), np.asarray(want.packed)
        )
        np.testing.assert_array_equal(
            np.asarray(got.scales), np.asarray(want.scales)
        )


class TestDynamicCodebook:
    def test_255_midpoint_tree_matches_searchsorted(self):
        """The 256-entry dynamic codebook (255 mids = 2^8 - 1) takes the
        branchless-tree arm; verify against numpy on a dense sweep."""
        mids = code_midpoints(dynamic_code())
        w = np.linspace(-1.2, 1.2, 4096).astype(np.float32)
        codes, absmax = native.quantize_codes(w, w.size, mids)
        sc = np.float32(absmax[0])
        want = np.searchsorted(
            mids, (w / sc).astype(np.float32), side="left"
        ).astype(np.uint8)
        np.testing.assert_array_equal(codes, want)


def test_env_flag_validation(monkeypatch):
    monkeypatch.setenv("NF4TPU_NATIVE", "banana")
    monkeypatch.setattr(native, "_tried", False)
    monkeypatch.setattr(native, "_lib", None)
    with pytest.raises(ValueError):
        native._load()
    monkeypatch.setenv("NF4TPU_NATIVE", "0")
    monkeypatch.setattr(native, "_tried", False)
    assert native._load() is None
    assert not native.available()
