"""External ground truth for the NF4 oracle.

Three levels (strongest available first):

1. **Real bitsandbytes fixtures** (``tests/fixtures/bnb_nf4.npz``, recorded
   by ``tools/record_bnb_fixtures.py`` on a CUDA machine): byte-level
   equality of our quantizer/dequantizer against actual
   ``bitsandbytes.functional.quantize_4bit``/``dequantize_4bit`` outputs —
   the role Unsloth/PEFT play in the reference's tests
   (``/root/reference/benchmark.py:104-113``).  Skipped when the fixture
   file is absent (this TPU rig has no CUDA/bitsandbytes; record on any
   GPU box and commit the .npz to enable).
2. **Independent dynamic-map implementation**: ``create_dynamic_map`` below
   is written directly from the bitsandbytes algorithm (dynamic tree
   quantization), independently of ``nf4.lut.dynamic_code``, and must
   agree bit-for-bit.
3. **Frozen oracle regression hashes**: sha256 of the oracle's outputs on
   seeded inputs, pinned at round 2 — catches any silent change to
   quantization semantics.
"""

import hashlib
import os

import numpy as np
import pytest

from nf4_tpu.nf4.lut import NF4_CODE, dynamic_code
from nf4_tpu.nf4.reference import dequantize_nf4, quantize_nf4

FIXTURE_PATH = os.path.join(
    os.path.dirname(__file__), "fixtures", "bnb_nf4.npz"
)


# --------------------------------------------------------------------------
# Level 2: independent implementation of bitsandbytes' create_dynamic_map.


def create_dynamic_map(signed=True, max_exponent_bits=7, total_bits=8):
    """Dynamic tree quantization codebook, written from the bitsandbytes
    algorithm description (indicator-bit exponent + linear fraction bits),
    independent of nf4.lut."""
    data = []
    non_sign_bits = total_bits - (1 if signed else 0)
    additional_items = 2 ** (non_sign_bits - max_exponent_bits) - 1
    for i in range(max_exponent_bits):
        fraction_items = int(
            2 ** (i + non_sign_bits - max_exponent_bits) + 1
            if signed
            else 2 ** (i + non_sign_bits - max_exponent_bits + 1) + 1
        )
        boundaries = np.linspace(0.1, 1, fraction_items)
        means = (boundaries[:-1] + boundaries[1:]) / 2.0
        data += ((10 ** (-(max_exponent_bits - 1) + i)) * means).tolist()
        if signed:
            data += (-(10 ** (-(max_exponent_bits - 1) + i)) * means).tolist()

    if additional_items > 0:
        boundaries = np.linspace(0.1, 1, additional_items + 1)
        means = (boundaries[:-1] + boundaries[1:]) / 2.0
        data += (
            (10 ** (-(max_exponent_bits - 1) + max_exponent_bits - 1)) * means
        ).tolist()
        if signed:
            data += (
                -(10 ** (-(max_exponent_bits - 1) + max_exponent_bits - 1))
                * means
            ).tolist()

    data.append(0)
    data.append(1.0)
    gap = 256 - len(data)
    for _ in range(gap):
        data.append(0)
    data.sort()
    return np.asarray(data, dtype=np.float32)


class TestDynamicMapIndependent:
    def test_matches_lut_dynamic_code(self):
        np.testing.assert_array_equal(
            create_dynamic_map().view(np.uint32),
            dynamic_code().view(np.uint32),
        )

    def test_structure(self):
        code = dynamic_code()
        assert code.shape == (256,)
        # the map appends +1.0 but the negative side tops out at the largest
        # fraction mean (no -1.0 entry) — bitsandbytes semantics
        assert code[-1] == 1.0
        assert code[0] == np.float32(-0.99296874)
        assert (np.diff(code) >= 0).all()
        assert np.isin(0.0, code)


class TestNF4TableConstants:
    def test_published_qlora_values(self):
        """The QLoRA NF4 table is a published constant (16 normal quantiles
        renormalized to [-1, 1]); spot-pin the exact fp32 bit patterns."""
        bits = NF4_CODE.view(np.uint32)
        assert NF4_CODE[0] == -1.0 and NF4_CODE[15] == 1.0 and NF4_CODE[7] == 0.0
        # exact fp32 literals for a few interior entries
        assert NF4_CODE[1] == np.float32(-0.6961928009986877)
        assert NF4_CODE[8] == np.float32(0.07958029955625534)
        assert NF4_CODE[14] == np.float32(0.7229568362236023)
        assert (np.diff(NF4_CODE) > 0).all()
        assert bits.dtype == np.uint32


# --------------------------------------------------------------------------
# Level 3: frozen oracle regression hashes (seeded inputs, pinned round 2).

_FROZEN = [
    # (m, n, sha16(packed), sha16(absmax_u8), sha16(absmax32), offset,
    #  sha16(dequant_fp16_bits))
    (64, 64, "94973c15b409cafc", "f2a7def65714ca80", "1a2111dd2639648c", 0.13174793124198914, "237b6f9adf7e163e"),
    (128, 256, "6d9d870e5676d4e9", "19b38e76c8f16021", "196f567912e26278", 0.1294545829296112, "6a0784a165c58ed6"),
    (256, 1024, "fb6b608e2553c811", "d55bd21a10f50088", "d0457fdde85fa4cd", 0.12937401235103607, "e72de5fecc579563"),
    (100, 320, "03e7b6e6f2db9bc0", "59cca3e0a54f3f9f", "b6890d3a118d0231", 0.13087865710258484, "943c910d8da51d7c"),
]


def _h(a) -> str:
    return hashlib.sha256(np.ascontiguousarray(a).tobytes()).hexdigest()[:16]


class TestFrozenOracle:
    def test_oracle_outputs_pinned(self):
        rng = np.random.default_rng(1234)
        for m, n, hp, ha, ha32, off, hd in _FROZEN:
            w = (rng.standard_normal((m, n)) * 0.05).astype(np.float32)
            st = quantize_nf4(w, dtype=np.float16)
            dq = dequantize_nf4(st)
            assert _h(st.packed) == hp, (m, n, "packed drifted")
            assert _h(st.absmax_u8) == ha, (m, n, "absmax drifted")
            assert _h(st.absmax32) == ha32, (m, n, "absmax32 drifted")
            assert float(st.offset) == off, (m, n, "offset drifted")
            assert _h(dq.view(np.uint16)) == hd, (m, n, "dequant drifted")


# --------------------------------------------------------------------------
# Level 1: real bitsandbytes fixtures (skip when not recorded).


@pytest.mark.skipif(
    not os.path.exists(FIXTURE_PATH),
    reason="bnb fixtures not recorded (run tools/record_bnb_fixtures.py on "
    "a CUDA machine with bitsandbytes and commit the .npz)",
)
class TestAgainstRealBitsandbytes:
    @pytest.fixture(scope="class")
    def fixtures(self):
        with np.load(FIXTURE_PATH) as z:
            return {k: z[k] for k in z.files}

    def _cases(self, fixtures):
        n = len({k.split(".")[0] for k in fixtures})
        return range(n)

    def test_dequant_matches_bnb_bytes(self, fixtures):
        from nf4_tpu.nf4.adapters import quant_state_from_arrays

        for i in self._cases(fixtures):
            m, n = fixtures[f"{i}.shape"]
            st = quant_state_from_arrays(
                fixtures[f"{i}.packed"],
                fixtures[f"{i}.absmax_u8"],
                (int(m), int(n)),
                absmax32=fixtures[f"{i}.absmax32"],
                offset=float(fixtures[f"{i}.offset"]),
                code2=fixtures[f"{i}.code2"],
                dtype=np.float16,
            )
            dq = dequantize_nf4(st)
            np.testing.assert_array_equal(
                dq.view(np.uint16), fixtures[f"{i}.dequant_fp16_bits"]
            )

    def test_quantizer_matches_bnb_bytes(self, fixtures):
        for i in self._cases(fixtures):
            st = quantize_nf4(fixtures[f"{i}.input"], dtype=np.float16)
            np.testing.assert_array_equal(
                st.packed, fixtures[f"{i}.packed"]
            )
            np.testing.assert_array_equal(
                st.absmax_u8, fixtures[f"{i}.absmax_u8"]
            )
            np.testing.assert_array_equal(
                st.absmax32, fixtures[f"{i}.absmax32"]
            )

    def test_code2_matches_dynamic_map(self, fixtures):
        np.testing.assert_array_equal(
            fixtures["0.code2"].view(np.uint32), dynamic_code().view(np.uint32)
        )

    def test_fp4_dequant_matches_bnb_bytes(self, fixtures):
        """fp4-flavored fixtures (recorder writes both codebooks since
        round 3); skip inside old nf4-only recordings."""
        if "0.fp4.packed" not in fixtures:
            pytest.skip("fixture file predates fp4 recording")
        from nf4_tpu.nf4.adapters import quant_state_from_arrays

        for i in self._cases(fixtures):
            m, n = fixtures[f"{i}.shape"]
            st = quant_state_from_arrays(
                fixtures[f"{i}.fp4.packed"],
                fixtures[f"{i}.fp4.absmax_u8"],
                (int(m), int(n)),
                absmax32=fixtures[f"{i}.fp4.absmax32"],
                offset=float(fixtures[f"{i}.fp4.offset"]),
                code2=fixtures[f"{i}.fp4.code2"],
                dtype=np.float16,
                quant_type="fp4",
            )
            dq = dequantize_nf4(st)
            np.testing.assert_array_equal(
                dq.view(np.uint16), fixtures[f"{i}.fp4.dequant_fp16_bits"]
            )

    def test_fp4_quantizer_matches_bnb_bytes(self, fixtures):
        if "0.fp4.packed" not in fixtures:
            pytest.skip("fixture file predates fp4 recording")
        for i in self._cases(fixtures):
            st = quantize_nf4(
                fixtures[f"{i}.input"], dtype=np.float16, quant_type="fp4"
            )
            np.testing.assert_array_equal(
                st.packed, fixtures[f"{i}.fp4.packed"]
            )
            np.testing.assert_array_equal(
                st.absmax_u8, fixtures[f"{i}.fp4.absmax_u8"]
            )
