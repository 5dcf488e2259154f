"""Device-chained speculative decoding (serve/speculative.py spec_chunk).

The host-stepped spec path pays a host readback per verify step (drafts
were computed host-side from the emitted tokens); PERF_NOTES measures that
sync erasing the speculative win on small models.  spec_chunk chains n
draft+verify steps fully on device — drafting via draft_ngram_device — so
greedy spec costs one sync per chunk, like the multi-step decode path.
Greedy spec output is token-identical to plain decode REGARDLESS of draft
quality (the accept rule only keeps tokens the model would emit), which is
what these tests pin.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nf4_tpu.models.configs import TINY_TEST
from nf4_tpu.models.llama import init_params
from nf4_tpu.serve.engine import Engine
from nf4_tpu.serve.sampling import SamplingParams
from nf4_tpu.serve.speculative import draft_ngram_device, propose_ngram


@pytest.fixture(scope="module")
def params():
    return init_params(TINY_TEST, seed=0)


PROMPTS = [[3, 1, 4, 1, 5, 9, 2, 6], [2, 7, 1, 8], [5, 5, 5, 5, 5, 5]]


class TestDeviceDrafter:
    @pytest.mark.parametrize(
        "ctx",
        [
            [1, 2, 3, 4, 1, 2, 3, 4, 1, 2, 3],  # periodic -> 3-gram hit
            [5, 6, 7, 8, 9, 10],  # no recurrence -> repeat last
            [3, 3, 3, 3, 3],  # constant
            [1, 2],  # shorter than the n-gram
            [4, 9, 4, 9, 4],  # 2-gram period
        ],
    )
    def test_matches_host_drafter(self, ctx):
        k, S = 5, 32
        host = propose_ngram(ctx, k, 3)
        hist = np.zeros((1, S), np.int32)
        hist[0, : len(ctx)] = ctx
        dev = np.asarray(
            draft_ngram_device(
                jnp.asarray(hist), jnp.asarray([len(ctx)], jnp.int32), k, 3
            )
        )[0]
        np.testing.assert_array_equal(dev, host)

    def test_batch_rows_independent(self):
        k, S = 4, 32
        ctxs = [[1, 2, 3, 1, 2], [7, 8, 9], [2, 2, 2, 2, 2, 2, 2]]
        hist = np.zeros((len(ctxs), S), np.int32)
        hlen = np.zeros(len(ctxs), np.int32)
        for b, c in enumerate(ctxs):
            hist[b, : len(c)] = c
            hlen[b] = len(c)
        dev = np.asarray(
            draft_ngram_device(jnp.asarray(hist), jnp.asarray(hlen), k, 3)
        )
        for b, c in enumerate(ctxs):
            np.testing.assert_array_equal(dev[b], propose_ngram(c, k, 3))


class TestChunkedSpecEngine:
    def test_token_identical_to_plain_decode(self, params):
        plain = Engine(params, TINY_TEST, batch_size=2, eos_token=-1)
        ref = plain.generate(PROMPTS, max_new_tokens=24)
        spec = Engine(
            params, TINY_TEST, batch_size=2, eos_token=-1,
            spec_k=3, decode_chunk=4,
        )
        got = spec.generate(PROMPTS, max_new_tokens=24)
        assert [r.tokens for r in got] == [r.tokens for r in ref]
        # The chunked program actually ran (not the host-stepped fallback).
        assert (3, 4) in spec._spec_chunk_cache
        assert spec.spec_stats["steps"] > 0

    def test_logprobs_match_plain_decode(self, params):
        plain = Engine(params, TINY_TEST, batch_size=2, eos_token=-1)
        ref = plain.generate(
            PROMPTS[:2], max_new_tokens=16, return_logprobs=True
        )
        spec = Engine(
            params, TINY_TEST, batch_size=2, eos_token=-1,
            spec_k=2, decode_chunk=4,
        )
        got = spec.generate(
            PROMPTS[:2], max_new_tokens=16, return_logprobs=True
        )
        for g, r in zip(got, ref):
            assert g.tokens == r.tokens
            np.testing.assert_allclose(g.logprobs, r.logprobs, atol=1e-4)

    def test_acceptance_matches_host_stepped_drafting(self, params):
        """The device drafter must accept exactly as much as the host
        drafter on the same greedy stream (decode_chunk=1 forces the
        host-stepped path) — drafting parity is what keeps the chunked
        path's speedup claims honest."""
        stats = {}
        for chunk in (1, 4):
            eng = Engine(
                params, TINY_TEST, batch_size=1, eos_token=-1,
                spec_k=3, decode_chunk=chunk,
            )
            # Adaptivity off: the two paths gather acceptance evidence at
            # different granularity (per step vs per chunk), so pauses
            # could diverge; this test pins DRAFTING parity.
            eng.spec_min_accept = 0.0
            eng.generate([[1, 2, 3] * 5], max_new_tokens=40)
            stats[chunk] = dict(eng.spec_stats)
        assert stats[4] == stats[1]
        assert stats[4]["emitted"] > stats[4]["steps"]  # drafts accepted

    def test_stop_token_mid_chunk(self, params):
        """A stop token landing inside a chunk truncates the output at the
        stop, exactly like plain decode."""
        plain = Engine(params, TINY_TEST, batch_size=2, eos_token=-1)
        ref = plain.generate(PROMPTS[:2], max_new_tokens=30)
        # Pick a token the plain stream actually emits mid-way.
        stop = ref[0].tokens[12]
        ref_stopped = plain.generate(
            PROMPTS[:2], max_new_tokens=30, stop_tokens=[stop]
        )
        spec = Engine(
            params, TINY_TEST, batch_size=2, eos_token=-1,
            spec_k=3, decode_chunk=4,
        )
        got = spec.generate(
            PROMPTS[:2], max_new_tokens=30, stop_tokens=[stop]
        )
        assert [r.tokens for r in got] == [r.tokens for r in ref_stopped]
        assert [r.finished for r in got] == [r.finished for r in ref_stopped]

    def test_continuous_batching_refill(self, params):
        """More prompts than slots: retired slots refill and the chunked
        spec path keeps the stream token-identical."""
        plain = Engine(params, TINY_TEST, batch_size=2, eos_token=-1)
        prompts = PROMPTS + [[6, 2, 8], [9, 9, 1, 2, 3]]
        ref = plain.generate(prompts, max_new_tokens=20)
        spec = Engine(
            params, TINY_TEST, batch_size=2, eos_token=-1,
            spec_k=3, decode_chunk=4,
        )
        got = spec.generate(prompts, max_new_tokens=20)
        assert [r.tokens for r in got] == [r.tokens for r in ref]

    def test_budget_tail_falls_back(self, params):
        """Budgets below the chunk length still work (host-stepped spec or
        plain decode takes over) and stay token-identical."""
        plain = Engine(params, TINY_TEST, batch_size=2, eos_token=-1)
        ref = plain.generate(PROMPTS[:2], max_new_tokens=5)
        spec = Engine(
            params, TINY_TEST, batch_size=2, eos_token=-1,
            spec_k=3, decode_chunk=8,
        )
        got = spec.generate(PROMPTS[:2], max_new_tokens=5)
        assert [r.tokens for r in got] == [r.tokens for r in ref]

    def test_pipelined_spec_chunks_token_identical(self, params):
        """Spec chunks pipeline like decode chunks (chunk c+1 launches
        from c's device handles); output must be identical with the
        pipeline on or off, and speculative successors must actually
        launch (and be discarded at stops rollback-free)."""
        outs = {}
        for pipe in (False, True):
            eng = Engine(
                params, TINY_TEST, batch_size=2, eos_token=-1,
                spec_k=3, decode_chunk=2, pipeline_decode=pipe,
            )
            outs[pipe] = [
                r.tokens
                for r in eng.generate(PROMPTS[:2], max_new_tokens=24)
            ]
            if pipe:
                assert eng.pipeline_stats["launched"] > 0
        assert outs[True] == outs[False]

    def test_stochastic_requests_use_sampled_chunks(self, params):
        """A stochastic wave chains on device too, through the SAMPLED
        chunk program (rejection sampling per step, PRNG key carried in
        the chunk) — never the greedy chunk program."""
        spec = Engine(
            params, TINY_TEST, batch_size=2, eos_token=-1,
            spec_k=3, decode_chunk=4,
            sampling=SamplingParams(temperature=0.8, seed=None),
        )
        got = spec.generate(PROMPTS[:2], max_new_tokens=12)
        assert all(len(r.tokens) == 12 for r in got)
        assert not spec._spec_chunk_cache  # greedy chunk never built
        assert (3, 4) in spec._spec_chunk_sampled_cache
        assert spec.spec_stats["emitted"] >= spec.spec_stats["steps"]

    def test_sampled_chunks_pipeline_and_respect_budget(self, params):
        """Stochastic spec chunks pipeline like greedy ones (chunk c+1
        launches from c's device handles incl. the advanced key) and
        never overshoot a request's budget."""
        eng = Engine(
            params, TINY_TEST, batch_size=2, eos_token=-1,
            spec_k=2, decode_chunk=2, pipeline_decode=True,
            sampling=SamplingParams(temperature=0.9),
        )
        got = eng.generate(PROMPTS[:2], max_new_tokens=17)
        assert all(len(r.tokens) == 17 for r in got)
        assert eng.pipeline_stats["launched"] > 0
        assert (2, 2) in eng._spec_chunk_sampled_cache

    def test_sampled_chunk_stop_token_mid_chunk(self, params):
        """A stop token emitted inside a stochastic chunk retires the
        request at the stop, exactly like the greedy chunk path."""
        eng = Engine(
            params, TINY_TEST, batch_size=2, eos_token=-1,
            spec_k=2, decode_chunk=4,
            sampling=SamplingParams(temperature=1.2),
        )
        probe = eng.generate(PROMPTS[:2], max_new_tokens=12)
        stop = probe[0].tokens[4]
        eng2 = Engine(
            params, TINY_TEST, batch_size=2, eos_token=-1,
            spec_k=2, decode_chunk=4,
            sampling=SamplingParams(temperature=1.2),
        )
        got = eng2.generate(
            PROMPTS[:2], max_new_tokens=12,
            sampling=[
                SamplingParams(temperature=1.2, stop_tokens=(stop,)),
                SamplingParams(temperature=1.2),
            ],
        )
        # Same engine seed + same key schedule until the stop: row 0 is
        # the probe's prefix before the stop token (which is stripped).
        assert got[0].tokens == probe[0].tokens[:4]
        assert got[0].finished


class TestAdaptiveSpec:
    def test_low_acceptance_pauses_then_probes(self, params):
        """On a workload with ~zero draft acceptance, the engine pauses
        speculation after a probe (plain chunks serve the cooldown) and
        stays token-identical to the plain engine — the adversarial-
        workload floor is ~plain throughput, not verify overhead."""
        prompts = [[11, 23, 5], [17, 3, 29]]  # no self-repetition
        plain = Engine(params, TINY_TEST, batch_size=2, eos_token=-1)
        ref = plain.generate(prompts, max_new_tokens=40)
        eng = Engine(
            params, TINY_TEST, batch_size=2, eos_token=-1,
            spec_k=3, decode_chunk=4,
        )
        got = eng.generate(prompts, max_new_tokens=40)
        assert [r.tokens for r in got] == [r.tokens for r in ref]
        assert eng.spec_stats["pauses"] >= 1
        # Fewer verify steps than the non-adaptive engine spent on the
        # same workload: cooldown rounds ran plain chunks instead.
        always = Engine(
            params, TINY_TEST, batch_size=2, eos_token=-1,
            spec_k=3, decode_chunk=4,
        )
        always.spec_min_accept = 0.0
        got2 = always.generate(prompts, max_new_tokens=40)
        assert [r.tokens for r in got2] == [r.tokens for r in ref]
        assert eng.spec_stats["steps"] < always.spec_stats["steps"]

    def test_high_acceptance_never_pauses(self, params):
        eng = Engine(
            params, TINY_TEST, batch_size=1, eos_token=-1,
            spec_k=3, decode_chunk=4,
        )
        eng.generate([[1, 2, 3] * 5], max_new_tokens=24)
        # Greedy on a periodic prompt locks into the cycle: acceptance
        # stays high, the adaptive controller never fires.
        assert eng.spec_stats["pauses"] == 0
        assert eng.spec_stats["emitted"] > eng.spec_stats["steps"]

    def test_consecutive_failed_probes_back_off(self, params):
        """Cooldown doubles per consecutive low-acceptance probe (capped),
        so a persistently adversarial stream pays the probe tax at a
        vanishing rate; any good probe resets the backoff to base."""
        eng = Engine(
            params, TINY_TEST, batch_size=2, eos_token=-1,
            spec_k=3, decode_chunk=4,
        )
        eng.spec_cooldown = 2
        eng.spec_cooldown_max = 16
        # Unreachable threshold: EVERY probe fails, so failures are
        # consecutive by construction and the backoff must escalate
        # geometrically from base to cap.
        eng.spec_min_accept = 99.0
        eng.generate([[11, 23, 5], [17, 3, 29]], max_new_tokens=96)
        pauses = eng.spec_stats["pauses"]
        assert pauses >= 2
        assert eng._spec_backoff == min(16, 2 * 2 ** (pauses - 1))
        # A good probe resets the backoff to base (same known-high-
        # acceptance workload as test_high_acceptance_never_pauses).
        good = Engine(
            params, TINY_TEST, batch_size=1, eos_token=-1,
            spec_k=3, decode_chunk=4,
        )
        good._spec_backoff = 16
        good.generate([[1, 2, 3] * 5], max_new_tokens=24)
        assert good.spec_stats["pauses"] == 0
        assert good._spec_backoff == 0

    def test_pause_disabled_by_threshold_zero(self, params):
        eng = Engine(
            params, TINY_TEST, batch_size=2, eos_token=-1,
            spec_k=3, decode_chunk=4,
        )
        eng.spec_min_accept = 0.0
        eng.generate([[11, 23, 5], [17, 3, 29]], max_new_tokens=24)
        assert eng.spec_stats["pauses"] == 0


class TestIdleSlotsSpec:
    def test_spec_chunks_survive_early_retirement(self, params):
        """Heterogeneous budgets under spec: after the short request
        retires, the surviving slot keeps device-chained spec chunks
        (idle slots frozen in the chunk) and stays token-identical to
        its solo greedy run."""
        budgets = [SamplingParams(max_new_tokens=4),
                   SamplingParams(max_new_tokens=28)]
        eng = Engine(
            params, TINY_TEST, batch_size=2, eos_token=-1,
            spec_k=2, decode_chunk=4,
        )
        eng.spec_min_accept = 0.0  # adaptivity off: this tests chunking
        res = eng.generate(PROMPTS[:2], max_new_tokens=28, sampling=budgets)
        assert len(res[0].tokens) == 4 and len(res[1].tokens) == 28
        # Verify steps continue past the first chunk (the tail would be
        # plain single-step decode without idle-tolerant spec chunks).
        assert eng.spec_stats["steps"] > 4
        solo = Engine(
            params, TINY_TEST, batch_size=1, eos_token=-1,
            spec_k=2, decode_chunk=4,
        ).generate([PROMPTS[1]], max_new_tokens=28)[0]
        assert res[1].tokens == solo.tokens

    def test_sampled_spec_chunks_survive_early_retirement(self, params):
        """Same with stochastic sampling: the tail keeps rejection-
        sampling spec chunks; budgets are exact and the run completes."""
        budgets = [
            SamplingParams(temperature=0.8, max_new_tokens=4),
            SamplingParams(temperature=0.8, max_new_tokens=24),
        ]
        eng = Engine(
            params, TINY_TEST, batch_size=2, eos_token=-1,
            spec_k=2, decode_chunk=4,
        )
        eng.spec_min_accept = 0.0  # adaptivity off: this tests chunking
        res = eng.generate(PROMPTS[:2], max_new_tokens=24, sampling=budgets)
        assert len(res[0].tokens) == 4 and len(res[1].tokens) == 24
        assert (2, 4) in eng._spec_chunk_sampled_cache
        assert eng.spec_stats["steps"] > 4


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
class TestChunkedSpecTP:
    def test_dp_tp_mesh_token_identity(self, params):
        import dataclasses

        from nf4_tpu.models.configs import TINY_TP
        from nf4_tpu.parallel.mesh import make_mesh

        tp_params = init_params(TINY_TP, seed=0)
        mesh = make_mesh(tp=4, dp=2)
        plain = Engine(tp_params, TINY_TP, batch_size=2, eos_token=-1)
        ref = plain.generate(PROMPTS[:2], max_new_tokens=16)
        spec = Engine(
            tp_params, TINY_TP, batch_size=2, eos_token=-1,
            mesh=mesh, spec_k=3, decode_chunk=4,
        )
        got = spec.generate(PROMPTS[:2], max_new_tokens=16)
        assert [r.tokens for r in got] == [r.tokens for r in ref]
        assert (3, 4) in spec._spec_chunk_cache
