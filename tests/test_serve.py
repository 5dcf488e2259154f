"""Serving engine tests: continuous batching, sampling, determinism."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nf4_tpu.models import configs
from nf4_tpu.models.llama import init_params
from nf4_tpu.serve.engine import Engine
from nf4_tpu.serve.sampling import SamplingParams, sample


@pytest.fixture(scope="module")
def engine_setup():
    cfg = configs.TINY_TEST
    params = init_params(cfg, seed=0)
    return cfg, params


class TestSampling:
    def test_greedy(self):
        logits = jnp.asarray([[0.1, 2.0, 0.5], [3.0, -1.0, 0.0]])
        toks = sample(logits, SamplingParams(temperature=0.0))
        np.testing.assert_array_equal(np.asarray(toks), [1, 0])

    def test_temperature_valid_distribution(self):
        key = jax.random.PRNGKey(0)
        logits = jnp.asarray([[0.0, 10.0, 0.0]])
        toks = [
            int(sample(logits, SamplingParams(temperature=1.0), jax.random.fold_in(key, i))[0])
            for i in range(20)
        ]
        # Overwhelmingly the argmax given the 10-logit gap.
        assert sum(t == 1 for t in toks) >= 19

    def test_top_k_restricts(self):
        key = jax.random.PRNGKey(0)
        logits = jnp.asarray([[1.0, 2.0, 3.0, 4.0]])
        for i in range(20):
            t = int(
                sample(
                    logits,
                    SamplingParams(temperature=5.0, top_k=2),
                    jax.random.fold_in(key, i),
                )[0]
            )
            assert t in (2, 3)

    def test_top_p_keeps_top_token(self):
        key = jax.random.PRNGKey(0)
        logits = jnp.asarray([[10.0, 0.0, 0.0, 0.0]])
        t = int(
            sample(logits, SamplingParams(temperature=1.0, top_p=0.1), key)[0]
        )
        assert t == 0


class TestEngine:
    def test_greedy_generation_deterministic(self, engine_setup):
        cfg, params = engine_setup
        eng = Engine(params, cfg, batch_size=2, eos_token=-1)
        prompts = [[1, 2, 3], [4, 5]]
        a = eng.generate(prompts, max_new_tokens=5)
        b = eng.generate(prompts, max_new_tokens=5)
        assert [r.tokens for r in a] == [r.tokens for r in b]
        assert all(len(r.tokens) == 5 for r in a)

    def test_continuous_batching_matches_sequential(self, engine_setup):
        """More requests than slots: batched scheduling must produce the
        same greedy outputs as one-at-a-time generation."""
        cfg, params = engine_setup
        prompts = [[1, 2, 3], [7, 8], [9], [10, 11, 12, 13]]

        eng_batched = Engine(params, cfg, batch_size=2, eos_token=-1)
        batched = eng_batched.generate(prompts, max_new_tokens=4)

        eng_seq = Engine(params, cfg, batch_size=1, eos_token=-1)
        sequential = []
        for p in prompts:
            sequential += eng_seq.generate([p], max_new_tokens=4)

        assert [r.tokens for r in batched] == [r.tokens for r in sequential]

    def test_eos_stops_generation(self, engine_setup):
        cfg, params = engine_setup
        eng = Engine(params, cfg, batch_size=1, eos_token=-1)
        probe = eng.generate([[1, 2, 3]], max_new_tokens=6)[0]
        assert len(probe.tokens) >= 2
        eos = probe.tokens[1]  # force EOS = the 2nd generated token
        eng2 = Engine(params, cfg, batch_size=1, eos_token=eos)
        r = eng2.generate([[1, 2, 3]], max_new_tokens=6)[0]
        assert r.finished
        assert r.tokens == probe.tokens[:1]

    def test_empty_and_overlong_prompts(self, engine_setup):
        cfg, params = engine_setup
        eng = Engine(params, cfg, batch_size=2, eos_token=-1)
        too_long = list(range(cfg.max_seq_len + 5))
        rs = eng.generate([[], too_long, [1, 2]], max_new_tokens=3)
        assert len(rs) == 3
        assert rs[0].tokens == [] and rs[1].tokens == []
        assert len(rs[2].tokens) == 3

    def test_context_limit_respected(self, engine_setup):
        cfg, params = engine_setup
        eng = Engine(params, cfg, batch_size=1, eos_token=-1)
        prompt = list(np.arange(cfg.max_seq_len - 3) % cfg.vocab_size)
        r = eng.generate([prompt], max_new_tokens=50)[0]
        # Can generate at most up to the context limit.
        assert len(r.tokens) <= 3


class TestEngineStress:
    def test_many_mixed_prompts_continuous_batching(self):
        """More prompts than slots, mixed lengths: all must complete, slots
        must be reused, and per-prompt results must be independent of
        scheduling (greedy decode is deterministic)."""
        from nf4_tpu.models import configs
        from nf4_tpu.models.llama import init_params
        from nf4_tpu.serve.engine import Engine
        from nf4_tpu.serve.sampling import SamplingParams

        cfg = configs.TINY_TEST
        params = init_params(cfg, seed=0)
        rng = np.random.default_rng(11)
        prompts = [
            list(rng.integers(3, cfg.vocab_size, size=int(n)))
            for n in rng.integers(1, 20, size=13)
        ]
        eng = Engine(
            params, cfg, batch_size=3, sampling=SamplingParams(temperature=0.0)
        )
        res = eng.generate(prompts, max_new_tokens=5)
        assert len(res) == len(prompts)
        for r in res:
            assert 1 <= len(r.tokens) <= 5 or r.finished

        # Same prompts through a single-slot engine: identical outputs.
        # Strict equality only on the CPU reference platform — on TPU,
        # batch width changes kernel tiling and bf16 accumulation order, so
        # a near-tie argmax on a random-init model can legitimately flip
        # (the same platform sensitivity as test_models._tol()).
        import jax

        eng1 = Engine(
            params, cfg, batch_size=1, sampling=SamplingParams(temperature=0.0)
        )
        res1 = eng1.generate(prompts, max_new_tokens=5)
        if jax.default_backend() == "tpu":
            agree = sum(a.tokens == b.tokens for a, b in zip(res, res1))
            assert agree >= len(prompts) - 2, f"only {agree}/{len(prompts)} agree"
        else:
            for a, b in zip(res, res1):
                assert a.tokens == b.tokens, (a.tokens, b.tokens)


class TestSamplingExtras:
    def test_min_p_filters_tail(self):
        import jax

        from nf4_tpu.serve.sampling import SamplingParams, sample

        logits = jnp.asarray([[10.0, 9.9, 0.0, -5.0]])
        p = SamplingParams(temperature=1.0, min_p=0.5)
        counts = set()
        for i in range(24):
            tok = int(sample(logits, p, jax.random.PRNGKey(i))[0])
            counts.add(tok)
        # Only the two near-max tokens survive min_p=0.5.
        assert counts <= {0, 1}
        assert len(counts) == 2

    def test_repetition_penalty_discourages_repeats(self):
        from nf4_tpu.serve.sampling import SamplingParams, sample

        logits = jnp.asarray([[1.0, 0.9, 0.0]])
        mask = jnp.asarray([[True, False, False]])  # token 0 already emitted
        p = SamplingParams(temperature=0.0, repetition_penalty=2.0)
        tok = int(sample(logits, p, generated_mask=mask)[0])
        assert tok == 1  # penalized 1.0/2 = 0.5 < 0.9

    def test_engine_repetition_penalty_runs(self):
        from nf4_tpu.models import configs
        from nf4_tpu.models.llama import init_params
        from nf4_tpu.serve.engine import Engine
        from nf4_tpu.serve.sampling import SamplingParams

        cfg = configs.TINY_TEST
        params = init_params(cfg, seed=0)
        eng = Engine(
            params,
            cfg,
            batch_size=2,
            sampling=SamplingParams(temperature=0.0, repetition_penalty=1.3),
        )
        res = eng.generate([[3, 5, 7], [11, 13]], max_new_tokens=6)
        assert len(res) == 2
        for r in res:
            # With greedy + penalty the same token cannot repeat immediately
            # unless everything else is heavily penalized too; just require
            # valid completions.
            assert all(0 <= t < cfg.vocab_size for t in r.tokens)


class TestLogprobs:
    def test_generate_with_logprobs(self):
        from nf4_tpu.models import configs
        from nf4_tpu.models.llama import init_params
        from nf4_tpu.serve.engine import Engine
        from nf4_tpu.serve.sampling import SamplingParams

        cfg = configs.TINY_TEST
        params = init_params(cfg, seed=0)
        eng = Engine(params, cfg, batch_size=2, sampling=SamplingParams(temperature=0.0))
        res = eng.generate([[3, 5, 7], [11, 13, 17, 19]], max_new_tokens=4,
                           return_logprobs=True)
        for r in res:
            assert r.logprobs is not None
            assert len(r.logprobs) == len(r.tokens)
            assert all(lp <= 0.0 for lp in r.logprobs)
        # Without the flag: logprobs stay None.
        res2 = eng.generate([[3, 5, 7]], max_new_tokens=2)
        assert res2[0].logprobs is None


class TestStopAndStreaming:
    def test_stop_tokens_and_on_token(self):
        from nf4_tpu.models import configs
        from nf4_tpu.models.llama import init_params
        from nf4_tpu.serve.engine import Engine
        from nf4_tpu.serve.sampling import SamplingParams

        cfg = configs.TINY_TEST
        params = init_params(cfg, seed=0)
        eng = Engine(params, cfg, batch_size=2, sampling=SamplingParams(temperature=0.0))

        # Baseline greedy output, then rerun with its second token as a stop.
        base = eng.generate([[3, 5, 7]], max_new_tokens=6)[0]
        assert len(base.tokens) >= 2
        stop = base.tokens[1]
        stopped = eng.generate([[3, 5, 7]], max_new_tokens=6, stop_tokens=[stop])[0]
        assert stopped.finished
        assert stopped.tokens == base.tokens[:1]

        streamed = []
        res = eng.generate(
            [[3, 5, 7]],
            max_new_tokens=4,
            on_token=lambda r, t: streamed.append((r, t)),
        )[0]
        assert [t for _r, t in streamed] == res.tokens


class TestTPEngine:
    """The engine served through the tensor-parallel layer on the virtual
    8-device CPU mesh must reproduce single-device generation."""

    @pytest.fixture(scope="class")
    def tp_setup(self):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 devices")
        from nf4_tpu.models.llama import LlamaConfig
        from nf4_tpu.parallel.mesh import make_mesh

        cfg = LlamaConfig(
            vocab_size=256,
            hidden_size=256,
            intermediate_size=512,
            num_layers=2,
            num_heads=8,
            num_kv_heads=4,
            head_dim=128,
            max_seq_len=32,
            tp_shards=4,
        )
        mesh = make_mesh(tp=4, dp=2)
        params = init_params(cfg, seed=0)
        return cfg, params, mesh

    def test_tp_generate_matches_single_device(self, tp_setup):
        cfg, params, mesh = tp_setup
        prompts = [[3, 5, 7], [11, 13]]

        ref = Engine(params, cfg, batch_size=2, eos_token=-1)
        want = [r.tokens for r in ref.generate(prompts, max_new_tokens=5)]

        eng = Engine(params, cfg, batch_size=2, eos_token=-1, mesh=mesh)
        got = [r.tokens for r in eng.generate(prompts, max_new_tokens=5)]
        assert got == want

    def test_tp_continuous_batching(self, tp_setup):
        cfg, params, mesh = tp_setup
        eng = Engine(params, cfg, batch_size=2, eos_token=-1, mesh=mesh)
        prompts = [[i + 1, i + 2] for i in range(5)]
        res = eng.generate(prompts, max_new_tokens=3)
        assert len(res) == 5
        assert all(len(r.tokens) == 3 for r in res)

    def test_dp_slots_sharded(self, tp_setup):
        """On a dp=2 x tp=4 mesh the engine auto-shards the slot batch over
        dp: the KV cache batch axis must actually be split across dp."""
        cfg, params, mesh = tp_setup
        eng = Engine(params, cfg, batch_size=2, eos_token=-1, mesh=mesh)
        assert eng.data_axis == "dp"
        cache = eng._init_cache()
        spec = cache.k.sharding.spec
        assert spec[1] == "dp", f"cache batch axis not dp-sharded: {spec}"

    def test_tp_moe_generate_matches_single_device(self, tp_setup):
        """A Mixtral-style MoE model served over the dp x tp mesh: expert
        weights shard on their column/K dims (router replicated) and
        generation is token-identical to the single-device engine."""
        import dataclasses

        cfg, _params, mesh = tp_setup
        moe_cfg = dataclasses.replace(cfg, num_experts=2, experts_per_token=2)
        params = init_params(moe_cfg, seed=4)
        prompts = [[3, 5, 7], [11, 13]]

        ref = Engine(params, moe_cfg, batch_size=2, eos_token=-1)
        want = [r.tokens for r in ref.generate(prompts, max_new_tokens=5)]

        eng = Engine(params, moe_cfg, batch_size=2, eos_token=-1, mesh=mesh)
        got = [r.tokens for r in eng.generate(prompts, max_new_tokens=5)]
        assert got == want

    def test_tp_multistep_decode_matches_single_step(self, tp_setup):
        """The lax.scan-over-shard_map decode path (decode_chunk > 1) under
        the dp x tp mesh must emit exactly the single-step TP tokens."""
        cfg, params, mesh = tp_setup
        prompts = [[3, 5, 7], [11, 13]]

        single = Engine(
            params, cfg, batch_size=2, eos_token=-1, mesh=mesh, decode_chunk=1
        )
        want = [r.tokens for r in single.generate(prompts, max_new_tokens=6)]

        multi = Engine(
            params, cfg, batch_size=2, eos_token=-1, mesh=mesh, decode_chunk=2
        )
        got = [r.tokens for r in multi.generate(prompts, max_new_tokens=6)]
        assert got == want


class TestSegmentedPrefill:
    def test_long_prompts_match_unsegmented(self, engine_setup, monkeypatch):
        """Prompts longer than PREFILL_SEGMENT prefill as a scan over
        segments inside the jitted call; generation must be identical."""
        cfg, params = engine_setup
        prompts = [list(range(3, 40)), list(range(5, 30)), [7, 8, 9]]

        ref = Engine(params, cfg, batch_size=2, eos_token=-1)
        want = [r.tokens for r in ref.generate(prompts, max_new_tokens=4)]

        monkeypatch.setattr(Engine, "PREFILL_SEGMENT", 16)
        seg = Engine(params, cfg, batch_size=2, eos_token=-1)
        got = [r.tokens for r in seg.generate(prompts, max_new_tokens=4)]
        assert got == want


class TestTPSegmentedPrefill:
    def test_tp_segmented_prefill(self, monkeypatch):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 devices")
        from nf4_tpu.models.llama import LlamaConfig
        from nf4_tpu.parallel.mesh import make_mesh

        cfg = LlamaConfig(
            vocab_size=256, hidden_size=256, intermediate_size=512,
            num_layers=2, num_heads=8, num_kv_heads=4, head_dim=128,
            max_seq_len=32, tp_shards=4,
        )
        mesh = make_mesh(tp=4, dp=2)
        params = init_params(cfg, seed=0)
        prompts = [list(range(3, 25))]
        ref = Engine(params, cfg, batch_size=2, eos_token=-1, mesh=mesh)
        want = [r.tokens for r in ref.generate(prompts, max_new_tokens=3)]
        monkeypatch.setattr(Engine, "PREFILL_SEGMENT", 16)
        seg = Engine(params, cfg, batch_size=2, eos_token=-1, mesh=mesh)
        got = [r.tokens for r in seg.generate(prompts, max_new_tokens=3)]
        assert got == want


class TestMultiStepDecode:
    def test_chunked_equals_single_step(self, engine_setup):
        cfg, params = engine_setup
        prompts = [[3, 5, 7], [11, 13]]
        single = Engine(params, cfg, batch_size=2, eos_token=-1, decode_chunk=1)
        want = [r.tokens for r in single.generate(prompts, max_new_tokens=9)]
        multi = Engine(params, cfg, batch_size=2, eos_token=-1, decode_chunk=4)
        got = [r.tokens for r in multi.generate(prompts, max_new_tokens=9)]
        assert got == want

    def test_stop_token_mid_chunk(self, engine_setup):
        """A stop token landing inside a device-side chunk must truncate the
        output exactly as single-stepping would."""
        cfg, params = engine_setup
        single = Engine(params, cfg, batch_size=1, eos_token=-1, decode_chunk=1)
        base = single.generate([[3, 5, 7]], max_new_tokens=8)[0]
        assert len(base.tokens) >= 3
        stop = base.tokens[2]  # lands mid-chunk for decode_chunk=8

        want = single.generate(
            [[3, 5, 7]], max_new_tokens=8, stop_tokens=[stop]
        )[0]
        multi = Engine(params, cfg, batch_size=1, eos_token=-1, decode_chunk=8)
        got = multi.generate([[3, 5, 7]], max_new_tokens=8, stop_tokens=[stop])[0]
        assert got.finished == want.finished
        assert got.tokens == want.tokens

    def test_streaming_order_preserved(self, engine_setup):
        cfg, params = engine_setup
        eng = Engine(params, cfg, batch_size=1, eos_token=-1, decode_chunk=4)
        streamed = []
        res = eng.generate(
            [[3, 5, 7]], max_new_tokens=6,
            on_token=lambda r, t: streamed.append(t),
        )[0]
        assert streamed == res.tokens


class TestTPEngineFP4:
    """quant_type='fp4' checkpoints serve through the TP layer too: the
    static PackedNF4 field survives localize/shard_map and every device
    compiles the fp4 byte tables (token-identical to single-device)."""

    def test_fp4_tp_matches_single_device(self):
        if len(jax.devices()) < 4:
            pytest.skip("needs 4 devices")
        import dataclasses

        from nf4_tpu.models.llama import LlamaConfig
        from nf4_tpu.parallel.mesh import make_mesh

        cfg = LlamaConfig(
            vocab_size=256,
            hidden_size=256,
            intermediate_size=512,
            num_layers=2,
            num_heads=8,
            num_kv_heads=4,
            head_dim=128,
            max_seq_len=32,
            tp_shards=4,
            quant_type="fp4",
        )
        params = init_params(cfg, seed=0)
        assert params.layers.wqkv.quant_type == "fp4"
        prompts = [[3, 5, 7], [11, 13]]
        want = [
            r.tokens
            for r in Engine(params, cfg, batch_size=2, eos_token=-1).generate(
                prompts, max_new_tokens=5
            )
        ]
        mesh = make_mesh(tp=4)
        got = [
            r.tokens
            for r in Engine(
                params, cfg, batch_size=2, eos_token=-1, mesh=mesh
            ).generate(prompts, max_new_tokens=5)
        ]
        assert got == want
