"""Mixture-of-experts (Mixtral-style) MLP: routing semantics, dense-MLP
equivalence, serving, and checkpoint round-trip.

Evaluation is dense-over-experts under a lax.scan masked by routing
weights (models/llama.py:_moe_mlp — at decode the MLP is weight-bound,
so streaming all E packed experts costs what perfect dispatch would);
correctness is pinned against a direct NumPy computation of the Mixtral
routing rule: full softmax -> top-k -> renormalize == softmax over the
selected logits."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nf4_tpu.models.configs import TINY_MOE, TINY_TEST
from nf4_tpu.models.llama import (
    LlamaConfig,
    _moe_mlp,
    forward,
    init_kv_cache,
    init_params,
)
from nf4_tpu.ops.dequant import dequantize
from nf4_tpu.serve.engine import Engine

CFG = TINY_MOE


@pytest.fixture(scope="module")
def model():
    return init_params(CFG, seed=0)


class TestRouting:
    def test_moe_mlp_matches_numpy_reference(self, model):
        """_moe_mlp == per-token loop over the top-k experts' dense MLPs
        weighted by renormalized softmax (the HF Mixtral rule)."""
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

        # NumPy reference on the dequantized expert weights.
        router = np.asarray(lp.router, np.float32)  # [E, H]
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
        logits = xf @ router.T  # [B, S, E]
        want = np.zeros((2, 5, CFG.hidden_size), np.float32)
        inter = CFG.intermediate_size
        for b in range(2):
            for t in range(5):
                lg = logits[b, t]
                top = np.argsort(-lg)[: CFG.experts_per_token]
                w = np.exp(lg[top] - lg[top].max())
                w = w / w.sum()
                for wi, e in zip(w, top):
                    # bf16 activations through the fused kernels: recompute
                    # in fp32 on bf16-rounded weights is close, not exact.
                    gu = xf[b, t] @ gus[e].T
                    gate, up = gu[:inter], gu[inter:]
                    h = gate / (1 + np.exp(-gate)) * up
                    want[b, t] += wi * (h @ dns[e].T)
        denom = np.abs(want).max() + 1e-6
        assert np.abs(got - want).max() / denom < 5e-2

    def test_expert_identity_when_all_experts_equal(self):
        """If every expert holds the SAME weights, MoE output equals the
        dense MLP of those weights regardless of routing (weights sum to
        1) — an exact invariant of the combine rule."""
        cfg1 = dataclasses.replace(CFG, num_experts=1)
        base = init_params(cfg1, seed=3)
        cfgE = CFG
        moe = init_params(cfgE, seed=3)
        # Overwrite every expert with the dense model's MLP weights.
        rep = lambda a: jnp.broadcast_to(
            a[:, None], (a.shape[0], cfgE.num_experts) + a.shape[1:]
        )
        layers = moe.layers.replace(
            wqkv=base.layers.wqkv,
            wo=base.layers.wo,
            input_norm=base.layers.input_norm,
            post_attn_norm=base.layers.post_attn_norm,
            w_gateup=jax.tree.map(rep, base.layers.w_gateup),
            w_down=jax.tree.map(rep, base.layers.w_down),
        )
        moe = moe.replace(
            layers=layers,
            embed=base.embed,
            final_norm=base.final_norm,
            lm_head=base.lm_head,
        )
        toks = jnp.array([[1, 2, 3, 4]], jnp.int32)
        pos = jnp.broadcast_to(jnp.arange(4, dtype=jnp.int32), (1, 4))
        lens = jnp.full((1,), 4, jnp.int32)
        lg_moe, _ = forward(
            moe, cfgE, toks, init_kv_cache(cfgE, 1), pos, lens
        )
        lg_dense, _ = forward(
            base, cfg1, toks, init_kv_cache(cfg1, 1), pos, lens
        )
        np.testing.assert_allclose(
            np.asarray(lg_moe), np.asarray(lg_dense), rtol=2e-3, atol=2e-3
        )

    def test_routing_actually_selects(self, model):
        """Different tokens route to different experts (the router is not
        degenerate in this random init), and changing one UNSELECTED
        expert's weights does not change a token routed elsewhere."""
        lp = jax.tree.map(
            lambda a: a[0] if hasattr(a, "ndim") else a, model.layers,
            is_leaf=lambda x: x is None,
        )
        rng = np.random.default_rng(1)
        x = jnp.asarray(
            rng.standard_normal((1, 8, CFG.hidden_size)), jnp.bfloat16
        )
        router = np.asarray(lp.router, np.float32)
        logits = np.asarray(x, np.float32) @ router.T
        top = np.argsort(-logits, axis=-1)[..., : CFG.experts_per_token]
        assert len(np.unique(top)) > CFG.experts_per_token


class TestMoEServing:
    def test_engine_decode(self, model):
        res = Engine(model, CFG, batch_size=2, eos_token=-1).generate(
            [[1, 2, 3], [4, 5]], max_new_tokens=6
        )
        assert [len(r.tokens) for r in res] == [6, 6]

    def test_checkpoint_roundtrip(self, model, tmp_path):
        from nf4_tpu.models.loader import load_packed, save_packed

        path = str(tmp_path / "moe.npz")
        save_packed(path, model, CFG)
        loaded = load_packed(path, CFG)
        np.testing.assert_array_equal(
            np.asarray(loaded.layers.router), np.asarray(model.layers.router)
        )
        np.testing.assert_array_equal(
            np.asarray(loaded.layers.w_gateup.packed),
            np.asarray(model.layers.w_gateup.packed),
        )
        toks = [[1, 2, 3]]
        a = Engine(model, CFG, batch_size=1, eos_token=-1).generate(
            toks, max_new_tokens=4
        )
        b = Engine(loaded, CFG, batch_size=1, eos_token=-1).generate(
            toks, max_new_tokens=4
        )
        assert a[0].tokens == b[0].tokens

    def test_attention_lora_trains_on_moe(self, model):
        """QLoRA on the attention projections works on an MoE base (the
        expert MLPs stay frozen; MLP targets raise)."""
        import optax

        from nf4_tpu.train import LoraConfig, init_lora, make_train_step

        with pytest.raises(ValueError, match="MoE"):
            init_lora(CFG, LoraConfig(rank=2))
        lcfg = LoraConfig(rank=4, targets=("wqkv", "wo"))
        lora = init_lora(CFG, lcfg, seed=0)
        opt = optax.adamw(5e-3)
        step = make_train_step(CFG, opt)
        rng = np.random.default_rng(0)
        toks = jnp.asarray(rng.integers(0, CFG.vocab_size, (2, 12)), jnp.int32)
        losses = []
        ost = opt.init(lora)
        for _ in range(6):
            lora, ost, loss = step(model, lora, ost, toks)
            losses.append(float(loss))
        assert losses[-1] < losses[0]


class TestMoELoader:
    def test_hf_config_parsing(self, tmp_path):
        import json

        from nf4_tpu.models.loader import hf_config_to_llama

        hf = {
            "vocab_size": 32000,
            "hidden_size": 4096,
            "intermediate_size": 14336,
            "num_hidden_layers": 32,
            "num_attention_heads": 32,
            "num_key_value_heads": 8,
            "rope_theta": 1000000.0,
            "max_position_embeddings": 32768,
            "num_local_experts": 8,
            "num_experts_per_tok": 2,
            "architectures": ["MixtralForCausalLM"],
        }
        path = tmp_path / "config.json"
        path.write_text(json.dumps(hf))
        cfg = hf_config_to_llama(str(path))
        assert cfg.num_experts == 8 and cfg.experts_per_token == 2

    def test_streaming_load_moe_checkpoint(self, tmp_path):
        """A synthetic Mixtral-keyed safetensors checkpoint loads through
        the streaming path and serves, with per-expert weights landing on
        the right experts (checked via quantize_layer equivalence)."""
        import json

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
            tensors[pre + "input_layernorm.weight"] = np.ones(h, np.float32)
            tensors[pre + "post_attention_layernorm.weight"] = np.ones(
                h, np.float32
            )
            tensors[pre + "block_sparse_moe.gate.weight"] = d(
                cfg.num_experts, h
            )
            for e in range(cfg.num_experts):
                ep = pre + f"block_sparse_moe.experts.{e}."
                tensors[ep + "w1.weight"] = d(inter, h)  # gate
                tensors[ep + "w3.weight"] = d(inter, h)  # up
                tensors[ep + "w2.weight"] = d(h, inter)  # down
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
                    "num_local_experts": cfg.num_experts,
                    "num_experts_per_tok": cfg.experts_per_token,
                }
            )
        )
        params, lcfg = load_hf_llama(str(tmp_path))
        assert lcfg.num_experts == cfg.num_experts
        assert params.layers.router.shape == (
            cfg.num_layers,
            cfg.num_experts,
            h,
        )
        # Expert 2's gate row 0 must come from expert 2's w1 tensor:
        # dequantize and compare against a direct quantize of that tensor.
        from nf4_tpu import quantize_for_tpu

        w1_e2 = tensors["model.layers.0.block_sparse_moe.experts.2.w1.weight"]
        w3_e2 = tensors["model.layers.0.block_sparse_moe.experts.2.w3.weight"]
        want = quantize_for_tpu(
            np.concatenate([w1_e2, w3_e2], axis=0), method="oracle"
        )
        got_packed = np.asarray(params.layers.w_gateup.packed[0, 2])
        np.testing.assert_array_equal(got_packed, np.asarray(want.packed))
        res = Engine(params, lcfg, batch_size=1, eos_token=-1).generate(
            [[1, 2, 3]], max_new_tokens=3
        )
        assert len(res[0].tokens) == 3


class TestMoEInt8:
    def test_int8_recode_serves_moe(self, model):
        """The int8-recode serving mode maps over the [L, E, ...] expert
        leaves (lax.map over layers, lead dims through the reshape) and
        decodes; values stay on the 4-bit grid so greedy tokens match the
        4-bit engine on this model."""
        from nf4_tpu.models.llama import recode_params_int8

        base = Engine(model, CFG, batch_size=1, eos_token=-1).generate(
            [[1, 2, 3]], max_new_tokens=5
        )
        p8 = recode_params_int8(model)
        r8 = Engine(p8, CFG, batch_size=1, eos_token=-1).generate(
            [[1, 2, 3]], max_new_tokens=5
        )
        assert len(r8[0].tokens) == 5
        assert r8[0].tokens == base[0].tokens


class TestMoETPGuard:
    def test_unrepacked_localize_raises_clearly(self, model):
        """MoE TP is supported (tests/test_parallel.py TestMoETP), but a
        shards=1 checkpoint still needs repack_tp first — the guard names
        the fix instead of failing deep inside shard_map."""
        from nf4_tpu.parallel.tp import localize_params, repack_tp

        with pytest.raises(AssertionError, match="repack_tp|tp_shards"):
            localize_params(model, 2)
        p2, cfg2 = repack_tp(model, CFG, 2)
        assert cfg2.tp_shards == 2
        localize_params(p2, 2)  # repacked checkpoints localize fine


class TestMoEDataParallel:
    def test_dp_only_mesh_serves_moe(self, model):
        """MoE over a dp-only mesh (tp=1): decode slots shard over dp,
        expert weights replicate — token-identical to single-device."""
        if len(jax.devices()) < 2:
            pytest.skip("needs 2 devices")
        from nf4_tpu.parallel.mesh import make_mesh

        prompts = [[1, 2, 3], [4, 5]]
        want = [
            r.tokens
            for r in Engine(model, CFG, batch_size=2, eos_token=-1).generate(
                prompts, max_new_tokens=4
            )
        ]
        mesh = make_mesh(tp=1, dp=2)
        got = [
            r.tokens
            for r in Engine(
                model, CFG, batch_size=2, eos_token=-1, mesh=mesh
            ).generate(prompts, max_new_tokens=4)
        ]
        assert got == want
