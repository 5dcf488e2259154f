"""Presence / frequency penalties (OpenAI-style additive token-history
penalties) through the counts-aware batched sampler and the engine.

Semantics under test: logits' = rep(logits) - presence * (count > 0)
- frequency * count, with count = times the token was generated for this
request; counts reset on slot refill and carry across decode chunks.
(The reference package has no sampling at all — SURVEY.md §2.)
"""

import numpy as np
import pytest

import jax.numpy as jnp

from nf4_tpu.models import configs
from nf4_tpu.models.llama import init_params
from nf4_tpu.serve.engine import Engine
from nf4_tpu.serve.sampling import (
    BatchedSampling,
    SamplingParams,
    sample_batched,
)


class TestSampler:
    def test_greedy_additive_penalty_math(self):
        """argmax(logits - p*(cnt>0) - f*cnt) exactly."""
        logits = jnp.asarray(
            [[5.0, 4.0, 3.0, 0.0], [5.0, 4.0, 3.0, 0.0]], jnp.float32
        )
        counts = jnp.asarray(
            [[3, 0, 0, 0], [3, 0, 0, 0]], jnp.int32
        )
        bp = BatchedSampling.stack(
            [
                # 3 * 0.8 = 2.4 > 5-4: token 0 drops below token 1.
                SamplingParams(frequency_penalty=0.8),
                # presence 0.5 only: 5-0.5 still beats 4.
                SamplingParams(presence_penalty=0.5),
            ]
        )
        toks = np.asarray(sample_batched(logits, bp, generated_mask=counts))
        assert list(toks) == [1, 0]

    def test_presence_vs_frequency_distinction(self):
        """presence is flat per emitted token; frequency scales with the
        count — a count of 1 must behave identically for p=x,f=0 and
        p=0,f=x, and differ at count 4."""
        logits = jnp.asarray([[2.0, 1.5, 0.0]], jnp.float32)
        bp_p = BatchedSampling.stack([SamplingParams(presence_penalty=1.0)])
        bp_f = BatchedSampling.stack([SamplingParams(frequency_penalty=1.0)])
        c1 = jnp.asarray([[1, 0, 0]], jnp.int32)
        c4 = jnp.asarray([[4, 0, 0]], jnp.int32)
        # count 1: both penalties subtract 1.0 -> token 1 wins either way.
        assert int(sample_batched(logits, bp_p, generated_mask=c1)[0]) == 1
        assert int(sample_batched(logits, bp_f, generated_mask=c1)[0]) == 1
        # count 4: presence still subtracts 1.0 (token 1 wins by 0.5);
        # frequency subtracts 4.0 (token 1 wins by a lot) — and with a
        # weaker frequency penalty the count still matters.
        bp_f_weak = BatchedSampling.stack(
            [SamplingParams(frequency_penalty=0.2)]
        )
        # 2.0 - 0.2*4 = 1.2 < 1.5 -> token 1; at count 1, 1.8 > 1.5 -> 0.
        assert int(sample_batched(logits, bp_f_weak, generated_mask=c4)[0]) == 1
        assert int(sample_batched(logits, bp_f_weak, generated_mask=c1)[0]) == 0

    def test_bool_mask_still_supported(self):
        """Repetition-only callers keep passing a bool mask."""
        logits = jnp.asarray([[2.0, 1.0]], jnp.float32)
        mask = jnp.asarray([[True, False]])
        bp = BatchedSampling.stack([SamplingParams(repetition_penalty=4.0)])
        assert int(sample_batched(logits, bp, generated_mask=mask)[0]) == 1

    def test_combined_with_repetition_penalty(self):
        """CTRL division applies first, additive penalties after."""
        logits = jnp.asarray([[4.0, 1.5, 0.0]], jnp.float32)
        counts = jnp.asarray([[2, 0, 0]], jnp.int32)
        bp = BatchedSampling.stack(
            [
                SamplingParams(
                    repetition_penalty=2.0, frequency_penalty=0.3
                )
            ]
        )
        # 4/2 - 0.3*2 = 1.4 < 1.5 -> token 1.
        assert int(sample_batched(logits, bp, generated_mask=counts)[0]) == 1


@pytest.fixture(scope="module")
def setup():
    cfg = configs.TINY_TEST
    params = init_params(cfg, seed=0)
    return cfg, params


class TestEnginePenalties:
    def test_high_presence_penalty_forbids_repeats(self, setup):
        cfg, params = setup
        eng = Engine(params, cfg, batch_size=1, eos_token=-1)
        res = eng.generate(
            [[3, 5, 7]],
            max_new_tokens=10,
            sampling=SamplingParams(presence_penalty=1000.0),
        )
        toks = res[0].tokens
        assert len(toks) == 10
        assert len(set(toks)) == len(toks), f"repeat in {toks}"

    def test_multi_step_matches_single_step(self, setup):
        """Counts carry across decode chunks: chunked greedy decode with a
        frequency penalty is identical to single-stepping."""
        cfg, params = setup
        prompts = [[3, 5, 7], [2, 4]]
        sp = SamplingParams(frequency_penalty=1.5)
        single = Engine(
            params, cfg, batch_size=2, eos_token=-1, decode_chunk=1
        ).generate(prompts, max_new_tokens=9, sampling=sp)
        multi = Engine(
            params, cfg, batch_size=2, eos_token=-1, decode_chunk=4
        ).generate(prompts, max_new_tokens=9, sampling=sp)
        assert [r.tokens for r in multi] == [r.tokens for r in single]

    def test_counts_reset_on_refill(self, setup):
        """4 requests through 1 slot: each stream equals a fresh
        single-request run (no penalty state leaks between requests)."""
        cfg, params = setup
        prompts = [[10 + i, 3, 7] for i in range(4)]
        sp = SamplingParams(presence_penalty=5.0)
        eng = Engine(params, cfg, batch_size=1, eos_token=-1)
        res = eng.generate(prompts, max_new_tokens=6, sampling=sp)
        for i, p in enumerate(prompts):
            fresh = Engine(params, cfg, batch_size=1, eos_token=-1).generate(
                [p], max_new_tokens=6, sampling=sp
            )
            assert res[i].tokens == fresh[0].tokens, f"request {i}"

    def test_per_request_mix_with_plain(self, setup):
        """A penalized request next to a plain one: the plain stream is
        untouched, the penalized one matches its solo run."""
        cfg, params = setup
        prompts = [[3, 5, 7], [2, 4, 6]]
        pen = SamplingParams(frequency_penalty=2.0)

        plain = Engine(params, cfg, batch_size=2, eos_token=-1).generate(
            prompts, max_new_tokens=8
        )
        solo = Engine(params, cfg, batch_size=1, eos_token=-1).generate(
            [prompts[0]], max_new_tokens=8, sampling=pen
        )
        eng = Engine(params, cfg, batch_size=2, eos_token=-1)
        res = eng.generate(
            prompts, max_new_tokens=8, sampling=[pen, SamplingParams()]
        )
        assert res[0].tokens == solo[0].tokens
        assert res[1].tokens == plain[1].tokens

    def test_logit_bias_bans_and_forces(self, setup):
        """-1000 bans the greedy token; +1000 forces a chosen one — in
        the refill first-token, multi-step, and single-step paths."""
        cfg, params = setup
        base = Engine(params, cfg, batch_size=1, eos_token=-1).generate(
            [[3, 5, 7]], max_new_tokens=6
        )[0].tokens
        banned = base[0]

        for chunk in (1, 4):
            eng = Engine(
                params, cfg, batch_size=1, eos_token=-1, decode_chunk=chunk
            )
            res = eng.generate(
                [[3, 5, 7]],
                max_new_tokens=6,
                sampling=SamplingParams(logit_bias=((banned, -1000.0),)),
            )
            assert banned not in res[0].tokens, f"chunk {chunk}"

            forced = eng.generate(
                [[3, 5, 7]],
                max_new_tokens=4,
                sampling=SamplingParams(logit_bias=((9, 1000.0),)),
            )
            assert forced[0].tokens == [9, 9, 9, 9], f"chunk {chunk}"

    def test_logit_bias_per_request_isolation(self, setup):
        """A biased request next to a plain one leaves the plain stream
        untouched, including across a refill."""
        cfg, params = setup
        prompts = [[3, 5, 7], [2, 4, 6], [8, 1, 5]]
        plain = Engine(params, cfg, batch_size=2, eos_token=-1).generate(
            prompts, max_new_tokens=5
        )
        eng = Engine(params, cfg, batch_size=2, eos_token=-1)
        res = eng.generate(
            prompts,
            max_new_tokens=5,
            sampling=[
                SamplingParams(logit_bias=((9, 1000.0),)),
                SamplingParams(),
                SamplingParams(),
            ],
        )
        assert res[0].tokens == [9] * 5
        assert res[1].tokens == plain[1].tokens
        assert res[2].tokens == plain[2].tokens

    def test_spec_falls_back(self, setup):
        cfg, params = setup
        eng = Engine(params, cfg, batch_size=1, eos_token=-1, spec_k=3)
        eng.generate(
            [[1, 2, 3, 1, 2, 3]],
            max_new_tokens=6,
            sampling=SamplingParams(presence_penalty=0.5),
        )
        assert eng.spec_stats["steps"] == 0
