"""Qwen3-MoE support: norm_topk_prob routing semantics, HF config
translation (num_experts / moe_intermediate_size / norm_topk_prob), and
streaming loads of Qwen-keyed expert checkpoints
(``mlp.experts.N.{gate,up,down}_proj`` + ``mlp.gate`` router + per-head
q/k norms).

Routing reference (HF Qwen3MoeSparseMoeBlock): softmax over ALL router
logits -> top-k -> renormalize iff ``norm_topk_prob``.  With
norm_topk_prob=true (Qwen3-30B-A3B) this equals the Mixtral rule already
covered by tests/test_moe.py; the false case keeps the full-softmax
probabilities un-renormalized and is pinned here against NumPy.
"""

import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nf4_tpu.models.configs import TINY_MOE, get_config
from nf4_tpu.models.llama import _moe_mlp, init_params
from nf4_tpu.ops.dequant import dequantize
from nf4_tpu.serve.engine import Engine

CFG = dataclasses.replace(TINY_MOE, moe_norm_topk=False)


@pytest.fixture(scope="module")
def model():
    return init_params(CFG, seed=0)


class TestNormTopkFalse:
    def test_matches_numpy_full_softmax(self, model):
        """moe_norm_topk=False: combine weights are the FULL-softmax
        probabilities of the selected experts (sum < 1), not the
        renormalized top-k softmax."""
        lp = jax.tree.map(
            lambda a: a[0] if hasattr(a, "ndim") else a, model.layers,
            is_leaf=lambda x: x is None,
        )
        rng = np.random.default_rng(0)
        x = jnp.asarray(
            rng.standard_normal((2, 5, CFG.hidden_size)) * 0.5, jnp.bfloat16
        )
        got = np.asarray(
            jax.jit(
                lambda x: _moe_mlp(CFG, x, lp, jax.nn.silu, lambda t: t)
            )(x),
            np.float32,
        )

        router = np.asarray(lp.router, np.float32)
        gus = [
            np.asarray(
                dequantize(
                    jax.tree.map(lambda a: a[e], lp.w_gateup), jnp.float32
                )
            )
            for e in range(CFG.num_experts)
        ]
        dns = [
            np.asarray(
                dequantize(
                    jax.tree.map(lambda a: a[e], lp.w_down), jnp.float32
                )
            )
            for e in range(CFG.num_experts)
        ]
        xf = np.asarray(x, np.float32)
        logits = xf @ router.T
        want = np.zeros((2, 5, CFG.hidden_size), np.float32)
        inter = CFG.intermediate_size
        for b in range(2):
            for t in range(5):
                lg = logits[b, t]
                probs = np.exp(lg - lg.max())
                probs = probs / probs.sum()  # softmax over ALL experts
                top = np.argsort(-lg)[: CFG.experts_per_token]
                for e in top:
                    gu = xf[b, t] @ gus[e].T
                    gate, up = gu[:inter], gu[inter:]
                    h = gate / (1 + np.exp(-gate)) * up
                    want[b, t] += probs[e] * (h @ dns[e].T)
        denom = np.abs(want).max() + 1e-6
        assert np.abs(got - want).max() / denom < 5e-2

    def test_differs_from_renormalized(self, model):
        """The two normalization rules must actually produce different
        outputs on the same weights (sanity that the flag is live)."""
        lp = jax.tree.map(
            lambda a: a[0] if hasattr(a, "ndim") else a, model.layers,
            is_leaf=lambda x: x is None,
        )
        rng = np.random.default_rng(1)
        x = jnp.asarray(
            rng.standard_normal((1, 4, CFG.hidden_size)) * 0.5, jnp.bfloat16
        )
        cfg_norm = dataclasses.replace(CFG, moe_norm_topk=True)
        a = np.asarray(_moe_mlp(CFG, x, lp, jax.nn.silu, lambda t: t))
        b = np.asarray(_moe_mlp(cfg_norm, x, lp, jax.nn.silu, lambda t: t))
        assert np.abs(a.astype(np.float32) - b.astype(np.float32)).max() > 0


class TestHFConfig:
    def _base(self):
        return {
            "model_type": "qwen3_moe",
            "vocab_size": 151936,
            "hidden_size": 2048,
            "intermediate_size": 6144,
            "moe_intermediate_size": 768,
            "num_hidden_layers": 48,
            "num_attention_heads": 32,
            "num_key_value_heads": 4,
            "head_dim": 128,
            "rope_theta": 1000000.0,
            "rms_norm_eps": 1e-6,
            "max_position_embeddings": 40960,
            "num_experts": 128,
            "num_experts_per_tok": 8,
            "norm_topk_prob": True,
            "architectures": ["Qwen3MoeForCausalLM"],
        }

    def test_qwen3_moe_config(self, tmp_path):
        from nf4_tpu.models.loader import hf_config_to_llama

        p = tmp_path / "config.json"
        p.write_text(json.dumps(self._base()))
        cfg = hf_config_to_llama(str(p))
        assert cfg.num_experts == 128
        assert cfg.experts_per_token == 8
        assert cfg.moe_norm_topk is True
        assert cfg.qk_norm is True
        # Per-expert width is moe_intermediate_size, not the dense width.
        assert cfg.intermediate_size == 768

    def test_norm_topk_false_honored(self, tmp_path):
        from nf4_tpu.models.loader import hf_config_to_llama

        hf = self._base()
        hf["norm_topk_prob"] = False
        p = tmp_path / "config.json"
        p.write_text(json.dumps(hf))
        assert hf_config_to_llama(str(p)).moe_norm_topk is False

    def test_shared_expert_rejected(self, tmp_path):
        from nf4_tpu.models.loader import hf_config_to_llama

        hf = self._base()
        hf["shared_expert_intermediate_size"] = 5632
        p = tmp_path / "config.json"
        p.write_text(json.dumps(hf))
        with pytest.raises(ValueError, match="shared-expert"):
            hf_config_to_llama(str(p))

    def test_mixed_dense_layers_rejected(self, tmp_path):
        from nf4_tpu.models.loader import hf_config_to_llama

        hf = self._base()
        hf["mlp_only_layers"] = [0, 1]
        p = tmp_path / "config.json"
        p.write_text(json.dumps(hf))
        with pytest.raises(ValueError, match="mlp_only_layers"):
            hf_config_to_llama(str(p))

    def test_decoder_sparse_step_rejected(self, tmp_path):
        from nf4_tpu.models.loader import hf_config_to_llama

        hf = self._base()
        hf["decoder_sparse_step"] = 2
        p = tmp_path / "config.json"
        p.write_text(json.dumps(hf))
        with pytest.raises(ValueError, match="decoder_sparse_step"):
            hf_config_to_llama(str(p))

    def test_registry_entry(self):
        cfg = get_config("qwen3-30b-a3b")
        assert cfg.num_experts == 128 and cfg.qk_norm and cfg.moe_norm_topk


class TestQwenMoELoader:
    def test_streaming_load_and_serve(self, tmp_path):
        """A synthetic Qwen3-MoE-keyed checkpoint (gate_proj/up_proj/
        down_proj experts, mlp.gate router, q/k norms) loads through the
        streaming path with experts landing in the right slots."""
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
            "lm_head.weight": d(cfg.vocab_size, h),
        }
        for l in range(cfg.num_layers):
            pre = f"model.layers.{l}."
            tensors[pre + "self_attn.q_proj.weight"] = d(cfg.q_dim, h)
            tensors[pre + "self_attn.k_proj.weight"] = d(cfg.kv_dim, h)
            tensors[pre + "self_attn.v_proj.weight"] = d(cfg.kv_dim, h)
            tensors[pre + "self_attn.o_proj.weight"] = d(h, cfg.q_dim)
            tensors[pre + "self_attn.q_norm.weight"] = np.ones(
                cfg.head_dim, np.float32
            )
            tensors[pre + "self_attn.k_norm.weight"] = np.ones(
                cfg.head_dim, np.float32
            )
            tensors[pre + "input_layernorm.weight"] = np.ones(h, np.float32)
            tensors[pre + "post_attention_layernorm.weight"] = np.ones(
                h, np.float32
            )
            tensors[pre + "mlp.gate.weight"] = d(cfg.num_experts, h)
            for e in range(cfg.num_experts):
                ep = pre + f"mlp.experts.{e}."
                tensors[ep + "gate_proj.weight"] = d(inter, h)
                tensors[ep + "up_proj.weight"] = d(inter, h)
                tensors[ep + "down_proj.weight"] = d(h, inter)
        save_file(tensors, str(tmp_path / "model.safetensors"))
        (tmp_path / "config.json").write_text(
            json.dumps(
                {
                    "model_type": "qwen3_moe",
                    "vocab_size": cfg.vocab_size,
                    "hidden_size": h,
                    "intermediate_size": 4 * inter,
                    "moe_intermediate_size": inter,
                    "num_hidden_layers": cfg.num_layers,
                    "num_attention_heads": cfg.num_heads,
                    "num_key_value_heads": cfg.num_kv_heads,
                    "head_dim": cfg.head_dim,
                    "max_position_embeddings": cfg.max_seq_len,
                    "num_experts": cfg.num_experts,
                    "num_experts_per_tok": cfg.experts_per_token,
                    "norm_topk_prob": False,
                }
            )
        )
        params, lcfg = load_hf_llama(str(tmp_path))
        assert lcfg.num_experts == cfg.num_experts
        assert lcfg.moe_norm_topk is False
        assert lcfg.qk_norm is True
        assert lcfg.intermediate_size == inter
        # Expert 1's gate/up of layer 0 land in expert slot 1 (byte-exact
        # vs a direct quantize of the concatenated tensors).
        from nf4_tpu import quantize_for_tpu

        g1 = tensors["model.layers.0.mlp.experts.1.gate_proj.weight"]
        u1 = tensors["model.layers.0.mlp.experts.1.up_proj.weight"]
        want = quantize_for_tpu(
            np.concatenate([g1, u1], axis=0), method="oracle"
        )
        got_packed = np.asarray(params.layers.w_gateup.packed[0, 1])
        np.testing.assert_array_equal(got_packed, np.asarray(want.packed))
        res = Engine(params, lcfg, batch_size=1, eos_token=-1).generate(
            [[1, 2, 3]], max_new_tokens=3
        )
        assert len(res[0].tokens) == 3
