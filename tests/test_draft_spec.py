"""Draft-MODEL speculative decoding: a small LM proposes the spec_k
drafts (Engine(draft=(draft_params, draft_cfg))) instead of prompt
lookup — covering novel text where n-gram lookup never hits.

The verify step makes the output independent of draft quality: greedy
waves must be token-identical to the plain engine for ANY draft model.
The draft keeps its own KV cache in lockstep with slot_pos (accepted
positions' KV is already correct; gaps from adaptive pauses or fully-
accepted runs are caught up by continuation prefills) — these tests
drive that invariant through pauses, stops, and continuous-batching
refills.  Reference: the upstream package has no serving/spec stack at
all (SURVEY.md §2.2); this extends the speculative subsystem beyond
prompt lookup.
"""

import numpy as np
import pytest

from nf4_tpu.models.configs import TINY_TEST
from nf4_tpu.models.llama import init_params
from nf4_tpu.serve.engine import Engine
from nf4_tpu.serve.sampling import SamplingParams


@pytest.fixture(scope="module")
def params():
    return init_params(TINY_TEST, seed=0)


@pytest.fixture(scope="module")
def draft_params():
    return init_params(TINY_TEST, seed=1)  # a DIFFERENT model


def make(params, draft=None, **kw):
    kw.setdefault("batch_size", 2)
    kw.setdefault("eos_token", -1)
    return Engine(params, TINY_TEST, draft=draft, **kw)


PROMPTS = [[11, 23, 5], [17, 3, 29]]  # novel text: n-gram lookup useless


class TestDraftGreedy:
    def test_self_draft_full_acceptance(self, params):
        """Draft == target: every draft is the target's own greedy token,
        so acceptance is k everywhere and output matches plain greedy."""
        plain = make(params)
        ref = plain.generate(PROMPTS, max_new_tokens=24)
        eng = make(params, draft=(params, TINY_TEST), spec_k=3)
        got = eng.generate(PROMPTS, max_new_tokens=24)
        assert [r.tokens for r in got] == [r.tokens for r in ref]
        s = eng.spec_stats
        # Full acceptance: all 23 post-prefill tokens per slot arrive via
        # spec (B=2), and the device-chained draft chunk serves the whole
        # budget in ~one chunk (decode_chunk=8 rounds; at k+1=4 per round
        # 6 rounds suffice — budget-overshoot rounds are discarded at
        # consume).
        assert s["emitted"] == 2 * 23
        assert s["steps"] <= 12  # chunked: not ~1 host round per step

    def test_any_draft_is_token_identical(self, params, draft_params):
        """Verify guarantees correctness for ANY draft model."""
        plain = make(params)
        ref = plain.generate(PROMPTS, max_new_tokens=24)
        eng = make(params, draft=(draft_params, TINY_TEST), spec_k=3)
        eng.spec_min_accept = 0.0  # keep spec engaged at any acceptance
        got = eng.generate(PROMPTS, max_new_tokens=24)
        assert [r.tokens for r in got] == [r.tokens for r in ref]

    def test_adaptive_pause_then_catchup(self, params, draft_params):
        """A low-acceptance draft triggers the adaptive pause; plain
        rounds advance the target while the draft cache goes stale, and
        the catch-up prefill restores the lockstep invariant on re-probe
        — output stays token-identical throughout."""
        plain = make(params)
        ref = plain.generate(PROMPTS, max_new_tokens=48)
        eng = make(params, draft=(draft_params, TINY_TEST), spec_k=3)
        eng.spec_min_accept = 0.5  # random-draft acceptance sits below
        eng.spec_cooldown = 2      # short pauses -> several re-probes
        got = eng.generate(PROMPTS, max_new_tokens=48)
        assert [r.tokens for r in got] == [r.tokens for r in ref]
        assert eng.spec_stats["pauses"] >= 1

    def test_stop_token_and_budget(self, params):
        eng = make(params, draft=(params, TINY_TEST), spec_k=3)
        ref = make(params).generate(PROMPTS, max_new_tokens=24)
        stop = ref[0].tokens[5]
        got = eng.generate(
            PROMPTS,
            sampling=[
                SamplingParams(stop_tokens=(stop,)),
                SamplingParams(max_new_tokens=7),
            ],
            max_new_tokens=24,
        )
        # Engine convention: the stop token is excluded from the result.
        assert got[0].tokens == ref[0].tokens[: ref[0].tokens.index(stop)]
        assert got[0].finished
        assert len(got[1].tokens) == 7

    def test_refill_prefills_draft_cache(self, params, draft_params):
        """Continuous batching: a queued request refilling a freed slot
        gets a fresh draft-cache prefill; its output matches a solo run."""
        eng = make(params, draft=(draft_params, TINY_TEST), spec_k=3)
        eng.spec_min_accept = 0.0
        three = PROMPTS + [[9, 8, 7]]
        got = eng.generate(
            three,
            sampling=[
                SamplingParams(max_new_tokens=4),
                SamplingParams(max_new_tokens=20),
                SamplingParams(max_new_tokens=12),
            ],
            max_new_tokens=20,
        )
        solo = make(params).generate([[9, 8, 7]], max_new_tokens=12)
        assert got[2].tokens == solo[0].tokens


class TestDraftStochastic:
    def test_runs_and_is_seed_deterministic(self, params, draft_params):
        sp = SamplingParams(temperature=0.8)
        a = make(params, draft=(draft_params, TINY_TEST), spec_k=3,
                 seed=7)
        got1 = a.generate(PROMPTS, max_new_tokens=16, sampling=sp)
        b = make(params, draft=(draft_params, TINY_TEST), spec_k=3,
                 seed=7)
        got2 = b.generate(PROMPTS, max_new_tokens=16, sampling=sp)
        assert [r.tokens for r in got1] == [r.tokens for r in got2]
        assert all(len(r.tokens) == 16 for r in got1)


class TestDraftValidation:
    def test_requires_spec_k(self, params):
        with pytest.raises(AssertionError, match="spec_k"):
            make(params, draft=(params, TINY_TEST))

    def test_vocab_mismatch_rejected(self, params):
        import dataclasses

        bad = dataclasses.replace(TINY_TEST, vocab_size=99)
        with pytest.raises(AssertionError, match="vocab"):
            make(params, draft=(params, bad), spec_k=3)
