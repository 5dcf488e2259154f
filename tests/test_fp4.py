"""FP4 (e2m1) codebook support — bnb Linear4bit's DEFAULT quant_type.

The reference package handles only NF4; bitsandbytes' ``quantize_4bit``
defaults to ``quant_type="fp4"`` with the identical storage format, so a
bnb user switching here may well hold fp4 checkpoints.  Everything below
pins that the fp4 choice flows through the whole stack: oracle, all three
quantizer methods (byte-identical), packed dequant kernels (bit-exact vs
the oracle, signed zeros included), fused matmul, int8 recode, module
adapter (reads ``quant_state.quant_type``), checkpoint round-trip, and a
full model forward/decode.
"""

import dataclasses

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np
import pytest

from nf4_tpu import (
    FP4_CODE,
    dequantize,
    dequantize_nf4,
    nf4_matmul,
    quantize_for_tpu,
    quantize_nf4,
)
from nf4_tpu.nf4.reference import quantize_to_code


@pytest.fixture(scope="module")
def w():
    rng = np.random.default_rng(7)
    return (rng.standard_normal((256, 1024)) * 0.03).astype(np.float32)


class TestFP4Codebook:
    def test_table_is_bnb_e2m1(self):
        """Spot values of bnb's dDequantizeFP4Tree, including the literal
        (NOT 1/192) subnormal and the sign-magnitude index layout."""
        assert FP4_CODE[0] == 0.0
        assert FP4_CODE[3] == 1.0
        assert FP4_CODE[1] == np.float32(0.00520833)
        assert FP4_CODE[1] != np.float32(1.0) / np.float32(192.0)
        np.testing.assert_array_equal(-FP4_CODE[:8], FP4_CODE[8:])

    def test_quantize_to_code_sign_magnitude(self):
        """bnb dQuantizeFP4 semantics: sign bit for x < 0 only (so -0.0
        takes the positive branch), strict-greater magnitude midpoints."""
        x = np.array(
            [0.0, -0.0, 1e-9, -1e-9, 0.003, -0.003, 1.0, -1.0, 0.29, 0.30],
            np.float32,
        )
        idx = quantize_to_code(x, FP4_CODE)
        assert list(idx) == [0, 0, 0, 8, 1, 9, 3, 11, 7, 4]

    def test_oracle_roundtrip_error_bounded(self, w):
        st = quantize_nf4(w, quant_type="fp4")
        assert st.quant_type == "fp4"
        d = dequantize_nf4(st, dtype=np.float32)
        assert np.abs(d - w).max() / np.abs(w).max() < 0.2


class TestFP4Quantizers:
    """All quantize_for_tpu methods must produce identical fp4 bytes."""

    def test_methods_byte_identical(self, w):
        po = quantize_for_tpu(w, method="oracle", quant_type="fp4")
        pd = quantize_for_tpu(w, method="device", quant_type="fp4")
        np.testing.assert_array_equal(np.asarray(po.packed), np.asarray(pd.packed))
        np.testing.assert_array_equal(np.asarray(po.scales), np.asarray(pd.scales))

    def test_native_byte_identical(self, w):
        from nf4_tpu.nf4 import native

        if not native.available():
            pytest.skip("native quantizer not built")
        po = quantize_for_tpu(w, method="oracle", quant_type="fp4")
        pn = quantize_for_tpu(w, method="native", quant_type="fp4")
        np.testing.assert_array_equal(np.asarray(po.packed), np.asarray(pn.packed))
        np.testing.assert_array_equal(np.asarray(po.scales), np.asarray(pn.scales))

    def test_bad_quant_type_raises(self, w):
        with pytest.raises(ValueError, match="quant_type"):
            quantize_for_tpu(w, method="oracle", quant_type="int4")


class TestFP4Kernels:
    def test_dequantize_bit_exact_vs_oracle(self, w):
        """The packed dequant path (jnp backend / exact kernel) matches the
        oracle bit-for-bit — INCLUDING the sign of -0.0 outputs (code 8)."""
        pw = quantize_for_tpu(w, dtype=jnp.bfloat16, method="oracle", quant_type="fp4")
        assert pw.quant_type == "fp4"
        got = np.asarray(dequantize(pw)).view(np.uint16)
        want = dequantize_nf4(
            quantize_nf4(w, quant_type="fp4"), dtype=ml_dtypes.bfloat16
        ).view(np.uint16)
        np.testing.assert_array_equal(got, want)

    def test_dequantize_interpret_kernel(self, w, monkeypatch):
        """The Pallas kernel body (interpret mode) honors the fp4 table."""
        monkeypatch.setenv("NF4TPU_BACKEND", "pallas")
        monkeypatch.setenv("NF4TPU_INTERPRET", "1")
        pw = quantize_for_tpu(w, dtype=jnp.bfloat16, method="oracle", quant_type="fp4")
        got = np.asarray(dequantize(pw)).view(np.uint16)
        want = dequantize_nf4(
            quantize_nf4(w, quant_type="fp4"), dtype=ml_dtypes.bfloat16
        ).view(np.uint16)
        np.testing.assert_array_equal(got, want)

    def test_matmul_matches_dense(self, w):
        rng = np.random.default_rng(3)
        x = (rng.standard_normal((8, w.shape[1])) * 0.1).astype(np.float32)
        pw = quantize_for_tpu(w, dtype=jnp.bfloat16, method="oracle", quant_type="fp4")
        y = np.asarray(nf4_matmul(jnp.asarray(x, jnp.bfloat16), pw), np.float32)
        xb = np.asarray(jnp.asarray(x, jnp.bfloat16), np.float32)
        ref = xb @ dequantize_nf4(
            quantize_nf4(w, quant_type="fp4"), dtype=np.float32
        ).T
        err = np.abs(y - ref)
        tol = 2e-2 * np.abs(ref) + 2e-2 * np.abs(ref).max()
        assert (err < tol).all(), err.max()

    def test_int8_recode_fp4(self, w):
        """int8 recode honors the fp4 grid: recoded matmul tracks the fp4
        dequantized weights within the documented 1/254 recode error."""
        from nf4_tpu.ops.int8_serve import int8_matmul, recode_int8_weight

        pw = quantize_for_tpu(w, dtype=jnp.bfloat16, method="oracle", quant_type="fp4")
        p8 = recode_int8_weight(pw)
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.standard_normal((8, w.shape[1])) * 0.1, jnp.bfloat16)
        y8 = np.asarray(int8_matmul(x, p8), np.float32)
        yref = np.asarray(nf4_matmul(x, pw), np.float32)
        denom = np.abs(yref).max() + 1e-9
        assert np.abs(y8 - yref).max() / denom < 2e-2


class TestFP4Adapters:
    def test_module_adapter_reads_quant_type(self, w):
        """A duck-typed bnb Linear4bit whose quant_state says fp4 must
        dequantize through the fp4 table (bit-exact vs the fp4 oracle)."""
        import nf4_tpu

        qs = quantize_nf4(w, quant_type="fp4")

        class FakeWeight:
            pass

        class FakeState2:
            pass

        class FakeQS:
            pass

        class FakeLinear4bit:
            pass

        fqs = FakeQS()
        fqs.absmax = qs.absmax_u8
        fqs.offset = qs.offset
        fqs.dtype = "bfloat16"
        fqs.quant_type = "fp4"
        st2 = FakeState2()  # no .code attribute -> framework dynamic table
        st2.absmax = qs.absmax32
        fqs.state2 = st2
        fw = FakeWeight()
        fw.data = qs.packed
        fw.quant_state = fqs
        m = FakeLinear4bit()
        m.weight = fw
        m.out_features, m.in_features = w.shape

        out = nf4_tpu.dequantize_nf4_module(m)
        want = dequantize_nf4(qs, dtype=ml_dtypes.bfloat16)
        np.testing.assert_array_equal(
            np.asarray(out).view(np.uint16), want.view(np.uint16)
        )


class TestFP4Model:
    def test_model_forward_and_checkpoint(self, tmp_path):
        """A quant_type="fp4" model runs end to end and round-trips through
        save_packed/load_packed with the codebook preserved per weight."""
        from nf4_tpu.models.configs import TINY_TEST
        from nf4_tpu.models.llama import init_params
        from nf4_tpu.models.loader import load_packed, save_packed
        from nf4_tpu.serve.engine import Engine

        cfg = dataclasses.replace(TINY_TEST, quant_type="fp4")
        params = init_params(cfg, seed=0)
        assert params.layers.wqkv.quant_type == "fp4"

        res = Engine(params, cfg, batch_size=1, eos_token=-1).generate(
            [[1, 2, 3]], max_new_tokens=4
        )
        assert len(res[0].tokens) == 4

        path = str(tmp_path / "m.npz")
        save_packed(path, params, cfg)
        loaded = load_packed(path, cfg)
        assert loaded.layers.wqkv.quant_type == "fp4"
        np.testing.assert_array_equal(
            np.asarray(loaded.layers.wqkv.packed),
            np.asarray(params.layers.wqkv.packed),
        )

        # The fp4 model decodes differently from the same-seed nf4 model
        # (different grids) — guards against the quant_type being ignored.
        nf4_params = init_params(TINY_TEST, seed=0)
        assert not np.array_equal(
            np.asarray(nf4_params.layers.wqkv.packed),
            np.asarray(params.layers.wqkv.packed),
        )
