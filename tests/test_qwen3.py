"""Qwen3-style per-head q/k RMSNorm (qk_norm): applied after the head
reshape and before RoPE, matching HF Qwen3Attention."""

import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nf4_tpu.models.configs import TINY_TEST
from nf4_tpu.models.llama import forward, init_kv_cache, init_params, rms_norm
from nf4_tpu.serve.engine import Engine

CFG = dataclasses.replace(TINY_TEST, qk_norm=True)


@pytest.fixture(scope="module")
def model():
    return init_params(CFG, seed=0)


class TestQKNorm:
    def test_norm_is_live_and_per_head(self, model):
        """Scaling q_norm changes the output (the norm is applied), and a
        per-head RMSNorm of ones-weight equals normalizing each [D] head
        vector independently — checked at the op level."""
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((2, 3, 4, 8)), jnp.float32)
        w = jnp.ones((8,), jnp.float32)
        got = np.asarray(rms_norm(x, w, 1e-6))
        xf = np.asarray(x)
        want = xf / np.sqrt((xf**2).mean(-1, keepdims=True) + 1e-6)
        np.testing.assert_allclose(got, want, rtol=1e-5)

        toks = jnp.array([[1, 2, 3, 4]], jnp.int32)
        pos = jnp.broadcast_to(jnp.arange(4, dtype=jnp.int32), (1, 4))
        lens = jnp.full((1,), 4, jnp.int32)
        la, _ = forward(model, CFG, toks, init_kv_cache(CFG, 1), pos, lens)
        bumped = model.replace(
            layers=model.layers.replace(q_norm=model.layers.q_norm * 2.0)
        )
        lb, _ = forward(bumped, CFG, toks, init_kv_cache(CFG, 1), pos, lens)
        assert not np.allclose(np.asarray(la), np.asarray(lb))

    def test_engine_and_checkpoint(self, model, tmp_path):
        from nf4_tpu.models.loader import load_packed, save_packed

        res = Engine(model, CFG, batch_size=1, eos_token=-1).generate(
            [[1, 2, 3]], max_new_tokens=4
        )
        assert len(res[0].tokens) == 4
        path = str(tmp_path / "q3.npz")
        save_packed(path, model, CFG)
        loaded = load_packed(path, CFG)
        np.testing.assert_array_equal(
            np.asarray(loaded.layers.q_norm), np.asarray(model.layers.q_norm)
        )
        res2 = Engine(loaded, CFG, batch_size=1, eos_token=-1).generate(
            [[1, 2, 3]], max_new_tokens=4
        )
        assert res2[0].tokens == res[0].tokens

    def test_tp_matches_single_device(self, model):
        if len(jax.devices()) < 2:
            pytest.skip("needs 2 devices")
        from nf4_tpu.parallel.mesh import make_mesh
        from nf4_tpu.parallel.tp import repack_tp

        params_tp, cfg_tp = repack_tp(model, CFG, 2)
        want = [
            r.tokens
            for r in Engine(model, CFG, batch_size=2, eos_token=-1).generate(
                [[1, 2, 3], [4, 5]], max_new_tokens=4
            )
        ]
        got = [
            r.tokens
            for r in Engine(
                params_tp, cfg_tp, batch_size=2, eos_token=-1,
                mesh=make_mesh(tp=2),
            ).generate([[1, 2, 3], [4, 5]], max_new_tokens=4)
        ]
        assert got == want


class TestQwen3Loader:
    def test_hf_checkpoint_with_qk_norms(self, tmp_path):
        from safetensors.numpy import save_file

        from nf4_tpu.models.loader import load_hf_llama

        cfg = CFG
        rng = np.random.default_rng(0)
        h, inter = cfg.hidden_size, cfg.intermediate_size

        def d(m, n):
            return (rng.standard_normal((m, n)) * 0.05).astype(np.float32)

        tensors = {
            "model.embed_tokens.weight": d(cfg.vocab_size, h),
            "model.norm.weight": np.ones(h, np.float32),
        }
        for l in range(cfg.num_layers):
            pre = f"model.layers.{l}."
            tensors[pre + "self_attn.q_proj.weight"] = d(cfg.q_dim, h)
            tensors[pre + "self_attn.k_proj.weight"] = d(cfg.kv_dim, h)
            tensors[pre + "self_attn.v_proj.weight"] = d(cfg.kv_dim, h)
            tensors[pre + "self_attn.o_proj.weight"] = d(h, cfg.q_dim)
            tensors[pre + "self_attn.q_norm.weight"] = np.full(
                cfg.head_dim, 0.5, np.float32
            )
            tensors[pre + "self_attn.k_norm.weight"] = np.full(
                cfg.head_dim, 0.25, np.float32
            )
            tensors[pre + "mlp.gate_proj.weight"] = d(inter, h)
            tensors[pre + "mlp.up_proj.weight"] = d(inter, h)
            tensors[pre + "mlp.down_proj.weight"] = d(h, inter)
            tensors[pre + "input_layernorm.weight"] = np.ones(h, np.float32)
            tensors[pre + "post_attention_layernorm.weight"] = np.ones(
                h, np.float32
            )
        save_file(tensors, str(tmp_path / "model.safetensors"))
        (tmp_path / "config.json").write_text(
            json.dumps(
                {
                    "model_type": "qwen3",
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
        assert lcfg.qk_norm and not lcfg.attn_bias
        assert float(params.layers.q_norm[0, 0]) == 0.5
        assert float(params.layers.k_norm[0, 0]) == 0.25
        res = Engine(params, lcfg, batch_size=1, eos_token=-1).generate(
            [[1, 2, 3]], max_new_tokens=3
        )
        assert len(res[0].tokens) == 3
