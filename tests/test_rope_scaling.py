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


class TestLongrope:
    """Phi-3 "longrope": per-dim factor arrays + the sqrt(1 +
    ln(scale)/ln(orig)) cos/sin attention factor."""

    def test_long_factors_and_attn_scale(self):
        half = TINY_TEST.head_dim // 2
        short = tuple(1.0 for _ in range(half))
        long = tuple(2.0 + 0.1 * i for i in range(half))
        cfg = dataclasses.replace(
            TINY_TEST,
            max_seq_len=8192,
            rope_scaling=("longrope", short, long, 2048),
        )
        base = dataclasses.replace(cfg, rope_scaling=None)
        got = np.asarray(_scaled_inv_freq(cfg))
        want = np.asarray(_scaled_inv_freq(base)) / np.asarray(long, np.float32)
        np.testing.assert_allclose(got, want, rtol=1e-6)

        from nf4_tpu.models.llama import _rope_attn_scale, rope_tables

        m = _rope_attn_scale(cfg)
        assert abs(m - math.sqrt(1 + math.log(8192 / 2048) / math.log(2048))) < 1e-9
        pos = jnp.arange(4, dtype=jnp.int32)[None, :]
        cos_s, _ = rope_tables(cfg, pos)
        # position 0: cos(0)*m == m
        np.testing.assert_allclose(np.asarray(cos_s)[0, 0], m, rtol=1e-6)

    def test_short_context_uses_short_factors_no_scale(self):
        half = TINY_TEST.head_dim // 2
        short = tuple(1.5 for _ in range(half))
        long = tuple(4.0 for _ in range(half))
        cfg = dataclasses.replace(
            TINY_TEST,
            max_seq_len=1024,
            rope_scaling=("longrope", short, long, 2048),
        )
        base = dataclasses.replace(cfg, rope_scaling=None)
        got = np.asarray(_scaled_inv_freq(cfg))
        np.testing.assert_allclose(
            got, np.asarray(_scaled_inv_freq(base)) / 1.5, rtol=1e-6
        )
        from nf4_tpu.models.llama import _rope_attn_scale

        assert _rope_attn_scale(cfg) == 1.0

    def test_parse_longrope(self):
        rs = {
            "rope_type": "longrope",
            "short_factor": [1.0, 1.1],
            "long_factor": [2.0, 2.5],
            "original_max_position_embeddings": 4096,
        }
        # The attention factor comes from the CHECKPOINT's full context
        # (5th entry) — a Phi-3-mini-128k-style config yields
        # sqrt(1 + ln(32)/ln(4096)); without a checkpoint max it is 1.0.
        got = _parse_rope_scaling(rs, ckpt_max=131072)
        assert got[:4] == ("longrope", (1.0, 1.1), (2.0, 2.5), 4096)
        assert abs(got[4] - math.sqrt(1 + math.log(32) / math.log(4096))) < 1e-9
        assert _parse_rope_scaling(rs)[4] == 1.0


class TestPhi3Loader:
    def test_fused_keys_split_and_serve(self, tmp_path):
        """A Phi-3-keyed checkpoint (fused qkv_proj / gate_up_proj) loads
        through the streaming path: the splits land exactly where
        separate-key checkpoints would (packed bytes equal), and the
        model serves."""
        import json

        from safetensors.numpy import save_file

        from nf4_tpu.models.loader import load_hf_llama
        from nf4_tpu.serve.engine import Engine

        cfg = TINY_TEST
        rng = np.random.default_rng(0)
        h, inter = cfg.hidden_size, cfg.intermediate_size

        def d(m, n):
            return (rng.standard_normal((m, n)) * 0.05).astype(np.float32)

        qkv = {}
        per_layer = {}
        tensors = {
            "model.embed_tokens.weight": d(cfg.vocab_size, h),
            "model.norm.weight": np.ones(h, np.float32),
        }
        for l in range(cfg.num_layers):
            pre = f"model.layers.{l}."
            wq, wk, wv = d(cfg.q_dim, h), d(cfg.kv_dim, h), d(cfg.kv_dim, h)
            wg, wu = d(inter, h), d(inter, h)
            per_layer[l] = (wq, wk, wv, wg, wu)
            tensors[pre + "self_attn.qkv_proj.weight"] = np.concatenate(
                [wq, wk, wv], axis=0
            )
            tensors[pre + "mlp.gate_up_proj.weight"] = np.concatenate(
                [wg, wu], axis=0
            )
            tensors[pre + "self_attn.o_proj.weight"] = d(h, cfg.q_dim)
            tensors[pre + "mlp.down_proj.weight"] = d(h, inter)
            tensors[pre + "input_layernorm.weight"] = np.ones(h, np.float32)
            tensors[pre + "post_attention_layernorm.weight"] = np.ones(
                h, np.float32
            )
        save_file(tensors, str(tmp_path / "model.safetensors"))
        (tmp_path / "config.json").write_text(
            json.dumps(
                {
                    "vocab_size": cfg.vocab_size,
                    "hidden_size": h,
                    "intermediate_size": inter,
                    "num_hidden_layers": cfg.num_layers,
                    "num_attention_heads": cfg.num_heads,
                    "num_key_value_heads": cfg.num_kv_heads,
                    "head_dim": cfg.head_dim,
                    "max_position_embeddings": cfg.max_seq_len,
                }
            )
        )
        params, lcfg = load_hf_llama(str(tmp_path))
        # Equivalence: quantize the separate tensors directly.
        from nf4_tpu import quantize_for_tpu
        from nf4_tpu.models.llama import fuse_rows

        wq, wk, wv, wg, wu = per_layer[0]
        want = quantize_for_tpu(fuse_rows([wq, wk, wv]), method="oracle")
        np.testing.assert_array_equal(
            np.asarray(params.layers.wqkv.packed[0]), np.asarray(want.packed)
        )
        res = Engine(params, lcfg, batch_size=1, eos_token=-1).generate(
            [[1, 2, 3]], max_new_tokens=3
        )
        assert len(res[0].tokens) == 3
