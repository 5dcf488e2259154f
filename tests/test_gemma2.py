"""Gemma-2 architecture: tanh logit softcapping (attention + final),
4-norm blocks (sublayer-output norms before the residual adds),
query_pre_attn_scalar scaling, and alternating local/global attention
(traced per-layer windows through the layer scan)."""

import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nf4_tpu.models.configs import TINY_GEMMA2, TINY_TEST
from nf4_tpu.models.llama import (
    _layer_windows,
    forward,
    init_kv_cache,
    init_params,
)
from nf4_tpu.serve.engine import Engine

CFG = TINY_GEMMA2


@pytest.fixture(scope="module")
def model():
    return init_params(CFG, seed=0)


class TestSoftcap:
    def test_attention_softcap_matches_manual(self):
        """naive_attention with logit_softcap == manual numpy attention
        with cap*tanh(scores/cap) before masking."""
        from nf4_tpu.ops.attention import naive_attention

        rng = np.random.default_rng(0)
        b, h, s, d = 1, 2, 6, 8
        q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
        pos = jnp.arange(s, dtype=jnp.int32)[None, :]
        lens = jnp.full((b,), s, jnp.int32)
        cap, scale = 5.0, d**-0.5
        got = np.asarray(
            naive_attention(
                q, k, v, pos, lens, scale=scale, logit_softcap=cap
            )
        )
        qn, kn, vn = (np.asarray(t, np.float32) for t in (q, k, v))
        want = np.zeros_like(got)
        for hh in range(h):
            sc = qn[0, hh] @ kn[0, hh].T * scale
            sc = cap * np.tanh(sc / cap)
            mask = np.tril(np.ones((s, s), bool))
            sc = np.where(mask, sc, -1e30)
            p = np.exp(sc - sc.max(-1, keepdims=True))
            p /= p.sum(-1, keepdims=True)
            want[0, hh] = p @ vn[0, hh]
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    def test_final_softcap_bounds_logits(self, model):
        toks = jnp.array([[1, 2, 3, 4]], jnp.int32)
        pos = jnp.broadcast_to(jnp.arange(4, dtype=jnp.int32), (1, 4))
        lens = jnp.full((1,), 4, jnp.int32)
        logits, _ = forward(
            model, CFG, toks, init_kv_cache(CFG, 1), pos, lens
        )
        assert float(jnp.abs(logits).max()) <= CFG.final_logit_softcapping
        # ...and without the cap the same weights exceed it (the cap is live).
        cfg_nc = dataclasses.replace(CFG, final_logit_softcapping=None)
        raw, _ = forward(
            model, cfg_nc, toks, init_kv_cache(cfg_nc, 1), pos, lens
        )
        assert not np.allclose(np.asarray(raw), np.asarray(logits))


class TestAlternatingWindows:
    def test_layer_windows_pattern(self):
        w = np.asarray(_layer_windows(CFG))
        assert w.tolist() == [16, 65, 16, 65]  # local, global, local, global
        assert _layer_windows(TINY_TEST) is None

    def test_global_layer_equals_unwindowed(self):
        """window > any position is exactly no window: the per-layer
        global sentinel loses nothing."""
        from nf4_tpu.ops.attention import naive_attention

        rng = np.random.default_rng(1)
        q = jnp.asarray(rng.standard_normal((1, 2, 8, 8)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((1, 2, 8, 8)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((1, 2, 8, 8)), jnp.bfloat16)
        pos = jnp.arange(8, dtype=jnp.int32)[None, :]
        lens = jnp.full((1,), 8, jnp.int32)
        a = naive_attention(
            q, k, v, pos, lens, scale=0.35,
            sliding_window=jnp.int32(CFG.max_seq_len + 1),
        )
        b = naive_attention(q, k, v, pos, lens, scale=0.35)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_alternation_is_live(self, model):
        """Making ALL layers local changes long-context output vs the
        alternating pattern (the traced per-layer windows really differ)."""
        cfg_all_local = dataclasses.replace(CFG, sliding_window_pattern=1)
        s = 40  # > window 16 so locality matters
        toks = jnp.asarray(
            np.random.default_rng(2).integers(0, CFG.vocab_size, (1, s)),
            jnp.int32,
        )
        pos = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (1, s))
        lens = jnp.full((1,), s, jnp.int32)
        la, _ = forward(model, CFG, toks, init_kv_cache(CFG, 1), pos, lens)
        lb, _ = forward(
            model, cfg_all_local, toks, init_kv_cache(cfg_all_local, 1),
            pos, lens,
        )
        assert not np.allclose(
            np.asarray(la[:, -1]), np.asarray(lb[:, -1]), rtol=1e-3
        )


class TestGemma2Serving:
    def test_engine_decode_and_checkpoint(self, model, tmp_path):
        from nf4_tpu.models.loader import load_packed, save_packed

        res = Engine(model, CFG, batch_size=2, eos_token=-1).generate(
            [[1, 2, 3], [4, 5]], max_new_tokens=5
        )
        assert [len(r.tokens) for r in res] == [5, 5]
        path = str(tmp_path / "g2.npz")
        save_packed(path, model, CFG)
        loaded = load_packed(path, CFG)
        np.testing.assert_array_equal(
            np.asarray(loaded.layers.post_ffw_norm),
            np.asarray(model.layers.post_ffw_norm),
        )
        res2 = Engine(loaded, CFG, batch_size=2, eos_token=-1).generate(
            [[1, 2, 3], [4, 5]], max_new_tokens=5
        )
        assert [r.tokens for r in res2] == [r.tokens for r in res]


class TestGemma2Loader:
    def test_hf_config_and_norm_remap(self, tmp_path):
        """A gemma2-keyed synthetic checkpoint: HF's
        post_attention_layernorm lands on the attention-OUTPUT norm,
        pre_feedforward_layernorm on the MLP pre-norm."""
        from safetensors.numpy import save_file

        from nf4_tpu.models.loader import hf_config_to_llama, load_hf_llama

        cfg = CFG
        rng = np.random.default_rng(0)
        h, inter = cfg.hidden_size, cfg.intermediate_size

        def d(m, n):
            return (rng.standard_normal((m, n)) * 0.05).astype(np.float32)

        # Distinct marker values per norm so the mapping is checkable.
        marks = {
            "input_layernorm": 0.125,
            "post_attention_layernorm": 0.25,
            "pre_feedforward_layernorm": 0.5,
            "post_feedforward_layernorm": 0.75,
        }
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
            tensors[pre + "mlp.gate_proj.weight"] = d(inter, h)
            tensors[pre + "mlp.up_proj.weight"] = d(inter, h)
            tensors[pre + "mlp.down_proj.weight"] = d(h, inter)
            for name, v in marks.items():
                tensors[pre + name + ".weight"] = np.full(h, v, np.float32)
        save_file(tensors, str(tmp_path / "model.safetensors"))
        (tmp_path / "config.json").write_text(
            json.dumps(
                {
                    "model_type": "gemma2",
                    "vocab_size": cfg.vocab_size,
                    "hidden_size": h,
                    "intermediate_size": inter,
                    "num_hidden_layers": cfg.num_layers,
                    "num_attention_heads": cfg.num_heads,
                    "num_key_value_heads": cfg.num_kv_heads,
                    "head_dim": cfg.head_dim,
                    "max_position_embeddings": cfg.max_seq_len,
                    "hidden_activation": "gelu_pytorch_tanh",
                    "attn_logit_softcapping": 50.0,
                    "final_logit_softcapping": 30.0,
                    "query_pre_attn_scalar": 64,
                    "sliding_window": 16,
                }
            )
        )
        lcfg = hf_config_to_llama(str(tmp_path / "config.json"))
        assert lcfg.attn_logit_softcapping == 50.0
        assert lcfg.sliding_window_pattern == 2
        assert lcfg.rmsnorm_one_plus and lcfg.scale_embeddings
        assert lcfg.activation == "gelu_tanh"

        params, lcfg = load_hf_llama(str(tmp_path))
        ln = params.layers
        assert float(ln.input_norm[0, 0]) == 0.125
        assert float(ln.post_attn_out_norm[0, 0]) == 0.25  # HF post_attn
        assert float(ln.post_attn_norm[0, 0]) == 0.5  # HF pre_ffw
        assert float(ln.post_ffw_norm[0, 0]) == 0.75
        res = Engine(params, lcfg, batch_size=1, eos_token=-1).generate(
            [[1, 2, 3]], max_new_tokens=3
        )
        assert len(res[0].tokens) == 3


class TestGemma2TP:
    def test_tp_engine_matches_single_device(self, model):
        """Gemma-2 through the TP layer: per-layer traced windows,
        softcapping, and the extra norms all ride shard_map —
        token-identical to single-device."""
        if len(jax.devices()) < 2:
            pytest.skip("needs 2 devices")
        import dataclasses as _dc

        from nf4_tpu.parallel.mesh import make_mesh
        from nf4_tpu.parallel.tp import repack_tp

        params_tp, cfg_tp = repack_tp(model, CFG, 2)
        prompts = [[1, 2, 3], [4, 5]]
        want = [
            r.tokens
            for r in Engine(model, CFG, batch_size=2, eos_token=-1).generate(
                prompts, max_new_tokens=4
            )
        ]
        mesh = make_mesh(tp=2)
        got = [
            r.tokens
            for r in Engine(
                params_tp, cfg_tp, batch_size=2, eos_token=-1, mesh=mesh
            ).generate(prompts, max_new_tokens=4)
        ]
        assert got == want


class TestGemma3:
    """Gemma-3: dual rope (local layers at rope_local_theta unscaled,
    global layers at rope_theta + scaling) selected per layer inside the
    scan; 5:1 pattern; q/k norms; no softcapping."""

    CFG3 = dataclasses.replace(
        TINY_GEMMA2,
        num_layers=6,
        attn_logit_softcapping=None,
        final_logit_softcapping=None,
        rope_theta=1000000.0,
        rope_local_theta=10000.0,
        rope_scaling=("linear", 8.0),
        qk_norm=True,
        sliding_window_pattern=3,
    )

    def test_local_tables_are_unscaled_local_theta(self):
        from nf4_tpu.models.llama import local_rope_tables, rope_tables

        pos = jnp.arange(8, dtype=jnp.int32)[None, :]
        loc = local_rope_tables(self.CFG3, pos)
        ref_cfg = dataclasses.replace(
            self.CFG3, rope_theta=10000.0, rope_scaling=None,
            rope_local_theta=None,
        )
        want = rope_tables(ref_cfg, pos)
        np.testing.assert_array_equal(np.asarray(loc[0]), np.asarray(want[0]))
        # ...and they differ from the global tables (selection matters).
        glob = rope_tables(self.CFG3, pos)
        assert not np.allclose(np.asarray(loc[0]), np.asarray(glob[0]))

    def test_dual_rope_is_live(self):
        """Zeroing rope_local_theta (single global rope) changes outputs:
        the per-layer selection really routes different tables."""
        from nf4_tpu.models.llama import forward, init_kv_cache

        params = init_params(self.CFG3, seed=0)
        single = dataclasses.replace(self.CFG3, rope_local_theta=None)
        s = 24
        toks = jnp.asarray(
            np.random.default_rng(0).integers(0, 256, (1, s)), jnp.int32
        )
        pos = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (1, s))
        lens = jnp.full((1,), s, jnp.int32)
        la, _ = forward(
            params, self.CFG3, toks, init_kv_cache(self.CFG3, 1), pos, lens
        )
        lb, _ = forward(
            params, single, toks, init_kv_cache(single, 1), pos, lens
        )
        assert not np.allclose(np.asarray(la), np.asarray(lb), rtol=1e-3)

    def test_engine_and_train(self):
        import optax

        from nf4_tpu.train import LoraConfig, init_lora, make_train_step

        params = init_params(self.CFG3, seed=0)
        res = Engine(params, self.CFG3, batch_size=2, eos_token=-1).generate(
            [[1, 2, 3], [4, 5]], max_new_tokens=4
        )
        assert [len(r.tokens) for r in res] == [4, 4]
        lora = init_lora(self.CFG3, LoraConfig(rank=2), seed=0)
        opt = optax.adamw(5e-3)
        step = make_train_step(self.CFG3, opt)
        toks = jnp.asarray(
            np.random.default_rng(1).integers(0, 256, (2, 10)), jnp.int32
        )
        _, _, loss = step(params, lora, opt.init(lora), toks)
        assert np.isfinite(float(loss))

    def test_hf_config_parsing(self, tmp_path):
        from nf4_tpu.models.loader import hf_config_to_llama

        (tmp_path / "config.json").write_text(
            json.dumps(
                {
                    "model_type": "gemma3_text",
                    "vocab_size": 1024,
                    "hidden_size": 128,
                    "intermediate_size": 256,
                    "num_hidden_layers": 6,
                    "num_attention_heads": 4,
                    "num_key_value_heads": 2,
                    "head_dim": 32,
                    "max_position_embeddings": 4096,
                    "hidden_activation": "gelu_pytorch_tanh",
                    "rope_theta": 1000000.0,
                    "rope_local_base_freq": 10000.0,
                    "rope_scaling": {"rope_type": "linear", "factor": 8.0},
                    "sliding_window": 512,
                    "sliding_window_pattern": 6,
                    "query_pre_attn_scalar": 32,
                }
            )
        )
        cfg = hf_config_to_llama(str(tmp_path / "config.json"))
        assert cfg.rope_local_theta == 10000.0
        assert cfg.sliding_window_pattern == 6
        assert cfg.qk_norm and cfg.rmsnorm_one_plus and cfg.scale_embeddings
        assert cfg.rope_scaling == ("linear", 8.0)
        assert cfg.attn_logit_softcapping is None
