"""Per-request sampling parameters.

``Engine.generate`` accepts one SamplingParams per prompt; internally the
parameters ride a traced BatchedSampling pytree so one compiled decode
program serves every parameter mix.  Correctness bar: a uniform batch is
token-identical to the scalar path, and each request's stream matches
what a whole-batch run with its parameters would produce.  (The
reference package has no sampling at all — SURVEY.md §2.2.)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nf4_tpu.models import configs
from nf4_tpu.models.llama import init_params
from nf4_tpu.serve.engine import Engine
from nf4_tpu.serve.sampling import (
    BatchedSampling,
    SamplingParams,
    sample,
    sample_batched,
)


@pytest.fixture(scope="module")
def setup():
    cfg = configs.TINY_TEST
    params = init_params(cfg, seed=0)
    return cfg, params


class TestSampleBatched:
    """sample_batched with uniform rows must equal the scalar sample()
    with the same key — the op-for-op mirror claim."""

    CASES = [
        SamplingParams(),
        SamplingParams(temperature=0.7),
        SamplingParams(temperature=1.3, top_k=5),
        SamplingParams(temperature=0.9, top_p=0.8),
        SamplingParams(temperature=1.0, min_p=0.1),
        SamplingParams(temperature=0.8, top_k=7, top_p=0.9, min_p=0.05),
        SamplingParams(repetition_penalty=2.0),
        SamplingParams(temperature=0.6, repetition_penalty=1.5),
    ]

    @pytest.mark.parametrize("sp", CASES)
    def test_uniform_matches_scalar(self, sp):
        rng = np.random.default_rng(3)
        logits = jnp.asarray(rng.standard_normal((4, 32)) * 3, jnp.float32)
        mask = jnp.asarray(rng.random((4, 32)) < 0.2)
        key = jax.random.PRNGKey(7)

        want = sample(
            logits, sp, None if sp.temperature == 0.0 else key,
            generated_mask=mask,
        )
        got = sample_batched(
            logits, BatchedSampling.stack([sp] * 4), key, generated_mask=mask
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_mixed_rows_independent(self):
        """Each row's outcome only depends on its own parameters: greedy
        rows ignore the key; a filtered row respects its own top_k."""
        logits = jnp.asarray(
            [[0.0, 5.0, 1.0, 2.0], [0.0, 5.0, 1.0, 2.0]], jnp.float32
        )
        bp = BatchedSampling.stack(
            [SamplingParams(), SamplingParams(temperature=9.0, top_k=1)]
        )
        for i in range(10):
            toks = sample_batched(logits, bp, jax.random.PRNGKey(i))
            assert int(toks[0]) == 1  # greedy argmax
            assert int(toks[1]) == 1  # top_k=1 collapses to argmax too


class TestEnginePerRequest:
    def test_uniform_list_matches_scalar_greedy(self, setup):
        cfg, params = setup
        prompts = [[3, 5, 7], [2, 4], [9, 1, 6, 8]]

        plain = Engine(params, cfg, batch_size=2, eos_token=-1)
        want = [r.tokens for r in plain.generate(prompts, max_new_tokens=7)]

        eng = Engine(params, cfg, batch_size=2, eos_token=-1)
        got = [
            r.tokens
            for r in eng.generate(
                prompts, max_new_tokens=7,
                sampling=[SamplingParams()] * len(prompts),
            )
        ]
        assert got == want

    def test_mixed_greedy_rows_match_all_greedy_run(self, setup):
        """A greedy request in a batch with a stochastic neighbour emits
        exactly the tokens it gets in an all-greedy batch (slots are
        independent)."""
        cfg, params = setup
        prompts = [[3, 5, 7], [2, 4, 6]]

        plain = Engine(params, cfg, batch_size=2, eos_token=-1)
        want = [r.tokens for r in plain.generate(prompts, max_new_tokens=8)]

        eng = Engine(params, cfg, batch_size=2, eos_token=-1)
        res = eng.generate(
            prompts, max_new_tokens=8,
            sampling=[SamplingParams(), SamplingParams(temperature=1.0)],
        )
        assert res[0].tokens == want[0]
        assert len(res[1].tokens) == 8

    def test_per_request_repetition_penalty_matches_scalar(self, setup):
        """Request i under per-request params must emit what a whole-batch
        run with params_i emits (greedy, so key-free)."""
        cfg, params = setup
        prompts = [[3, 5, 7], [2, 4, 6]]
        pen = SamplingParams(repetition_penalty=8.0)

        w_pen = Engine(params, cfg, batch_size=2, eos_token=-1).generate(
            prompts, max_new_tokens=8, sampling=pen
        )
        w_plain = Engine(params, cfg, batch_size=2, eos_token=-1).generate(
            prompts, max_new_tokens=8
        )

        eng = Engine(params, cfg, batch_size=2, eos_token=-1)
        res = eng.generate(
            prompts, max_new_tokens=8, sampling=[pen, SamplingParams()]
        )
        assert res[0].tokens == w_pen[0].tokens
        assert res[1].tokens == w_plain[1].tokens

    def test_multi_step_path_matches_single_step(self, setup):
        """decode_chunk > 1 routes per-request mode through the traced
        BatchedSampling scan; greedy output must be identical."""
        cfg, params = setup
        prompts = [[3, 5, 7], [2, 4]]
        sps = [SamplingParams(), SamplingParams(repetition_penalty=3.0)]

        single = Engine(
            params, cfg, batch_size=2, eos_token=-1, decode_chunk=1
        )
        want = [
            r.tokens
            for r in single.generate(prompts, max_new_tokens=8, sampling=sps)
        ]

        multi = Engine(
            params, cfg, batch_size=2, eos_token=-1, decode_chunk=4
        )
        got = [
            r.tokens
            for r in multi.generate(prompts, max_new_tokens=8, sampling=sps)
        ]
        assert got == want

    def test_refill_carries_per_request_params(self, setup):
        """5 requests through 2 slots: params follow their request through
        continuous-batching refills."""
        cfg, params = setup
        prompts = [[10 + i, 20 + i, 3] for i in range(5)]
        pen = SamplingParams(repetition_penalty=8.0)
        sps = [pen if i % 2 == 0 else SamplingParams() for i in range(5)]

        w_pen = Engine(params, cfg, batch_size=2, eos_token=-1).generate(
            prompts, max_new_tokens=6, sampling=pen
        )
        w_plain = Engine(params, cfg, batch_size=2, eos_token=-1).generate(
            prompts, max_new_tokens=6
        )

        eng = Engine(params, cfg, batch_size=2, eos_token=-1)
        res = eng.generate(prompts, max_new_tokens=6, sampling=sps)
        for i in range(5):
            want = w_pen[i].tokens if i % 2 == 0 else w_plain[i].tokens
            assert res[i].tokens == want, f"request {i}"

    def test_per_request_max_new_tokens(self, setup):
        """SamplingParams.max_new_tokens overrides the call budget per
        request; each stream matches a whole-batch run at that budget."""
        cfg, params = setup
        prompts = [[3, 5, 7], [2, 4, 6]]

        w3 = Engine(params, cfg, batch_size=2, eos_token=-1).generate(
            prompts, max_new_tokens=3
        )
        w9 = Engine(params, cfg, batch_size=2, eos_token=-1).generate(
            prompts, max_new_tokens=9
        )

        eng = Engine(params, cfg, batch_size=2, eos_token=-1)
        res = eng.generate(
            prompts,
            max_new_tokens=9,
            sampling=[SamplingParams(max_new_tokens=3), SamplingParams()],
        )
        assert res[0].tokens == w3[0].tokens
        assert res[1].tokens == w9[1].tokens
        assert len(res[0].tokens) == 3 and len(res[1].tokens) == 9

    def test_per_request_stop_tokens(self, setup):
        """A request-level stop token ends only that request's stream."""
        cfg, params = setup
        prompts = [[3, 5, 7], [2, 4, 6]]

        base = Engine(params, cfg, batch_size=2, eos_token=-1).generate(
            prompts, max_new_tokens=8
        )
        stop = base[0].tokens[2]  # stop request 0 at this token...
        cut = base[0].tokens.index(stop)  # ...wherever it FIRST appears

        eng = Engine(params, cfg, batch_size=2, eos_token=-1)
        res = eng.generate(
            prompts,
            max_new_tokens=8,
            sampling=[
                SamplingParams(stop_tokens=(stop,)),
                SamplingParams(),
            ],
        )
        assert res[0].tokens == base[0].tokens[:cut]
        assert res[0].finished
        assert res[1].tokens == base[1].tokens

    def test_uniform_sampling_budget_override(self, setup):
        """A single SamplingParams with max_new_tokens set overrides the
        call-level budget in scalar mode too."""
        cfg, params = setup
        prompts = [[3, 5, 7]]
        want = Engine(params, cfg, batch_size=1, eos_token=-1).generate(
            prompts, max_new_tokens=4
        )
        got = Engine(params, cfg, batch_size=1, eos_token=-1).generate(
            prompts,
            max_new_tokens=64,
            sampling=SamplingParams(max_new_tokens=4),
        )
        assert got[0].tokens == want[0].tokens
        assert len(got[0].tokens) == 4

    def test_mixed_budgets_multi_step_refill(self, setup):
        """Different budgets across 5 requests through 2 slots with
        decode_chunk=4: budgets bind exactly despite chunked decode and
        continuous-batching refills."""
        cfg, params = setup
        prompts = [[10 + i, 20 + i, 3] for i in range(5)]
        budgets = [2, 7, 3, 9, 5]

        singles = {}
        for b in sorted(set(budgets)):
            singles[b] = Engine(
                params, cfg, batch_size=2, eos_token=-1, decode_chunk=4
            ).generate(prompts, max_new_tokens=b)

        eng = Engine(params, cfg, batch_size=2, eos_token=-1, decode_chunk=4)
        res = eng.generate(
            prompts,
            max_new_tokens=64,
            sampling=[SamplingParams(max_new_tokens=b) for b in budgets],
        )
        for i, b in enumerate(budgets):
            assert res[i].tokens == singles[b][i].tokens, f"request {i}"
            assert len(res[i].tokens) == b

    def test_seeded_stream_independent_of_batch_and_chunking(self, setup):
        """SamplingParams.seed makes a request's stream a pure function of
        (seed, step): identical alone, next to a stochastic neighbour,
        and under a different decode_chunk."""
        cfg, params = setup
        sp = SamplingParams(temperature=1.2, seed=123)

        alone = Engine(
            params, cfg, batch_size=1, eos_token=-1, seed=5
        ).generate([[3, 5, 7]], max_new_tokens=10, sampling=sp)
        paired = Engine(
            params, cfg, batch_size=2, eos_token=-1, seed=99
        ).generate(
            [[3, 5, 7], [2, 4, 6]],
            max_new_tokens=10,
            sampling=[sp, SamplingParams(temperature=0.8)],
        )
        chunked = Engine(
            params, cfg, batch_size=1, eos_token=-1, seed=7, decode_chunk=3
        ).generate([[3, 5, 7]], max_new_tokens=10, sampling=sp)

        assert paired[0].tokens == alone[0].tokens
        assert chunked[0].tokens == alone[0].tokens

    def test_different_seeds_diverge(self, setup):
        cfg, params = setup
        eng = Engine(params, cfg, batch_size=2, eos_token=-1)
        res = eng.generate(
            [[3, 5, 7], [3, 5, 7]],
            max_new_tokens=16,
            sampling=[
                SamplingParams(temperature=2.0, seed=1),
                SamplingParams(temperature=2.0, seed=2),
            ],
        )
        assert res[0].tokens != res[1].tokens

    def test_same_seed_same_prompt_same_stream(self, setup):
        """Two requests with the same seed and prompt in one batch emit
        identical streams — the reproducibility contract, visible."""
        cfg, params = setup
        eng = Engine(params, cfg, batch_size=2, eos_token=-1)
        res = eng.generate(
            [[3, 5, 7], [3, 5, 7]],
            max_new_tokens=10,
            sampling=SamplingParams(temperature=1.0, seed=42),
        )
        assert res[0].tokens == res[1].tokens

    def test_seeded_request_skips_speculation(self, setup):
        cfg, params = setup
        eng = Engine(params, cfg, batch_size=1, eos_token=-1, spec_k=3)
        alone = Engine(params, cfg, batch_size=1, eos_token=-1).generate(
            [[1, 2, 3, 1, 2, 3]],
            max_new_tokens=8,
            sampling=SamplingParams(temperature=1.0, seed=9),
        )
        res = eng.generate(
            [[1, 2, 3, 1, 2, 3]],
            max_new_tokens=8,
            sampling=SamplingParams(temperature=1.0, seed=9),
        )
        assert eng.spec_stats["steps"] == 0
        assert res[0].tokens == alone[0].tokens

    def test_wrong_length_raises(self, setup):
        cfg, params = setup
        eng = Engine(params, cfg, batch_size=2, eos_token=-1)
        with pytest.raises(AssertionError):
            eng.generate(
                [[1, 2], [3, 4]], max_new_tokens=2,
                sampling=[SamplingParams()],
            )


class TestMinNewTokens:
    """min_new_tokens bans eos + the request's stop tokens until the
    minimum is reached — then generation may stop normally."""

    def test_min_tokens_overrides_instant_eos(self, setup):
        """An engine whose eos would be emitted immediately must still
        produce min_new_tokens tokens, and none of them may be a stop."""
        from nf4_tpu.serve.engine import Engine

        CFG, model = setup
        # Find the token the base model emits first (greedy), then make it
        # the eos: without a ban, generation stops after 1 token.
        probe = Engine(model, CFG, batch_size=1, eos_token=-1).generate(
            [[1, 2, 3]], max_new_tokens=8
        )[0].tokens
        eos = probe[0]
        short = Engine(model, CFG, batch_size=1, eos_token=eos).generate(
            [[1, 2, 3]], max_new_tokens=8
        )[0]
        assert short.tokens == [] and short.finished

        res = Engine(model, CFG, batch_size=1, eos_token=eos).generate(
            [[1, 2, 3]],
            max_new_tokens=8,
            sampling=SamplingParams(min_new_tokens=4),
        )[0]
        assert len(res.tokens) >= 4
        assert eos not in res.tokens[:4]

    def test_min_tokens_mixed_wave_and_chunks(self, setup):
        """A banned slot and a free slot share a wave; the chunked decode
        path (decode_chunk=2) must not straddle the crossing — outputs
        equal the single-step engine's."""
        from nf4_tpu.serve.engine import Engine

        CFG, model = setup
        probe = Engine(model, CFG, batch_size=1, eos_token=-1).generate(
            [[1, 2, 3]], max_new_tokens=1
        )[0].tokens
        eos = probe[0]
        prompts = [[1, 2, 3], [5, 6, 7]]
        sp = [SamplingParams(min_new_tokens=3), SamplingParams()]
        fast = Engine(
            model, CFG, batch_size=2, eos_token=eos, decode_chunk=2
        ).generate(prompts, max_new_tokens=6, sampling=sp)
        slow = Engine(
            model, CFG, batch_size=2, eos_token=eos, decode_chunk=1
        ).generate(prompts, max_new_tokens=6, sampling=sp)
        assert [r.tokens for r in fast] == [r.tokens for r in slow]
        assert len(fast[0].tokens) >= 3

    def test_ban_lifts_after_min(self, setup):
        """Once the minimum is reached the ban must lift: with
        min_new_tokens=2 and an eos the model wants to emit, generation
        ends at the first allowed opportunity, not at the budget."""
        from nf4_tpu.serve.engine import Engine

        CFG, model = setup
        probe = Engine(model, CFG, batch_size=1, eos_token=-1).generate(
            [[1, 2, 3]], max_new_tokens=1
        )[0].tokens
        eos = probe[0]
        res = Engine(model, CFG, batch_size=1, eos_token=eos).generate(
            [[1, 2, 3]],
            max_new_tokens=16,
            sampling=SamplingParams(min_new_tokens=2),
        )[0]
        assert res.finished, "ban never lifted — ran to budget"
        assert 2 <= len(res.tokens) < 16


class TestGuidedChoice:
    """Guided choice: the output is exactly one of the given token
    sequences (per-step masks restrict sampling to tokens consistent with
    a remaining option; the first full match finishes the request)."""

    def test_greedy_output_is_a_choice(self, setup):
        CFG, model = setup
        from nf4_tpu.serve.engine import Engine

        free = Engine(model, CFG, batch_size=1, eos_token=-1).generate(
            [[1, 2, 3]], max_new_tokens=6
        )[0].tokens
        # Choices deliberately exclude the unconstrained output.
        choices = ((7, 8, 9), (7, 8, 10, 11), (12,))
        assert tuple(free[:3]) not in choices
        res = Engine(model, CFG, batch_size=1, eos_token=-1).generate(
            [[1, 2, 3]],
            max_new_tokens=2,  # auto-extended to the longest choice
            sampling=SamplingParams(choices=choices),
        )[0]
        assert tuple(res.tokens) in choices
        assert res.finished

    def test_shared_prefix_choices(self, setup):
        """Options sharing a prefix: after the prefix the mask narrows to
        the continuations, and the FIRST full match wins — so an option
        that is a strict prefix of another terminates generation there."""
        CFG, model = setup
        from nf4_tpu.serve.engine import Engine

        choices = ((5, 6), (5, 6, 7))
        res = Engine(model, CFG, batch_size=1, eos_token=-1).generate(
            [[1, 2, 3]], max_new_tokens=8,
            sampling=SamplingParams(choices=choices),
        )[0]
        assert tuple(res.tokens) == (5, 6)

    def test_stochastic_stays_in_choices(self, setup):
        CFG, model = setup
        from nf4_tpu.serve.engine import Engine

        choices = ((4, 5), (6,), (7, 8, 9))
        for seed in range(4):
            res = Engine(model, CFG, batch_size=1, eos_token=-1).generate(
                [[2, 3]], max_new_tokens=6,
                sampling=SamplingParams(
                    temperature=1.0, seed=seed, choices=choices
                ),
            )[0]
            assert tuple(res.tokens) in choices, (seed, res.tokens)

    def test_mixed_wave_constrained_and_free(self, setup):
        """One constrained slot next to a free one: the free request is
        token-identical to its solo run; the constrained one is a choice."""
        CFG, model = setup
        from nf4_tpu.serve.engine import Engine

        choices = ((9, 8), (7,))
        prompts = [[1, 2, 3], [4, 5, 6]]
        sp = [SamplingParams(choices=choices), SamplingParams()]
        res = Engine(model, CFG, batch_size=2, eos_token=-1).generate(
            prompts, max_new_tokens=5, sampling=sp
        )
        assert tuple(res[0].tokens) in choices
        solo = Engine(model, CFG, batch_size=2, eos_token=-1).generate(
            [prompts[1]], max_new_tokens=5
        )[0]
        assert res[1].tokens == solo.tokens


class TestGuidedChoiceWithBans:
    def test_choice_overrides_min_token_ban(self, setup):
        """A choice whose continuation IS a stop token must stay
        reachable even under min_new_tokens (the collapse bug: both
        mechanisms writing -1e9 to the same row)."""
        CFG, model = setup
        from nf4_tpu.serve.engine import Engine

        choices = ((7, 9),)
        res = Engine(model, CFG, batch_size=1, eos_token=7).generate(
            [[1, 2, 3]],
            max_new_tokens=4,
            sampling=SamplingParams(choices=choices, min_new_tokens=2),
        )[0]
        assert tuple(res.tokens) == (7, 9)
        assert res.finished


class TestGuidedChoiceStreaming:
    def test_stream_delivers_stop_id_choice_tokens(self, setup):
        """A stop id emitted as PART of a guided choice must still reach
        the on_token stream (the stop-suppression guard is disabled under
        choices, matching the non-streaming result)."""
        CFG, model = setup
        from nf4_tpu.serve.engine import Engine

        choices = ((7, 9),)
        got = []
        res = Engine(model, CFG, batch_size=1, eos_token=7).generate(
            [[1, 2, 3]],
            max_new_tokens=4,
            sampling=SamplingParams(choices=choices),
            on_token=lambda r, t: got.append(t),
        )[0]
        assert tuple(res.tokens) == (7, 9)
        assert got == list(res.tokens)
