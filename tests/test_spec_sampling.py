"""Speculative decoding under stochastic sampling (rejection sampling).

Correctness bar: the emitted marginal at every position is exactly the
request's filtered sampling distribution (the speculative-sampling
theorem with deterministic point-mass drafts), greedy rows reduce to the
greedy accept rule, and the engine integration preserves the greedy
token-identity guarantee for greedy requests in mixed batches.  The
reference package has no serving loop (SURVEY.md §2).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nf4_tpu.models import configs
from nf4_tpu.models.llama import init_params
from nf4_tpu.serve.engine import Engine
from nf4_tpu.serve.sampling import BatchedSampling, SamplingParams
from nf4_tpu.serve.speculative import spec_verify, spec_verify_sampled


def _stub_fwd(logits):
    """fwd(params, tokens, cache, positions, seq_lens) returning fixed
    logits — isolates the accept/resample math from the model."""

    def fwd(params, tokens, cache, positions, seq_lens):
        return logits, cache

    return fwd


class TestVerifySampledUnit:
    B, K, V = 3, 4, 16

    def _logits(self, seed=0):
        rng = np.random.default_rng(seed)
        return jnp.asarray(
            rng.standard_normal((self.B, self.K + 1, self.V)) * 2, jnp.float32
        )

    def _call(self, logits, drafts, bp, key):
        return spec_verify_sampled(
            None,
            jnp.zeros(self.B, jnp.int32),
            drafts,
            None,
            jnp.zeros(self.B, jnp.int32),
            key,
            bp,
            fwd=_stub_fwd(logits),
            k=self.K,
        )

    def test_greedy_rows_reduce_to_greedy_rule(self):
        logits = self._logits()
        am = np.asarray(jnp.argmax(logits, axis=-1))
        drafts = (  # break row 1 at draft position 2 (stay inside vocab)
            jnp.asarray(am[:, :-1]).at[1, 2].set((am[1, 2] + 1) % self.V)
        )
        bp = BatchedSampling.stack([SamplingParams()] * self.B)
        t, acc, lps, _ = self._call(logits, drafts, bp, jax.random.PRNGKey(0))
        tg, accg, lpsg, _ = spec_verify(
            None,
            jnp.zeros(self.B, jnp.int32),
            drafts,
            None,
            jnp.zeros(self.B, jnp.int32),
            fwd=_stub_fwd(logits),
            k=self.K,
        )
        acc, accg = np.asarray(acc), np.asarray(accg)
        np.testing.assert_array_equal(acc, accg)
        assert list(acc) == [self.K, 2, self.K]
        # Emitted region (0..acc) must match the greedy verifier exactly.
        for b in range(self.B):
            np.testing.assert_array_equal(
                np.asarray(t)[b, : acc[b] + 1],
                np.asarray(tg)[b, : acc[b] + 1],
            )

    def test_collapsed_distribution_always_accepts_argmax_drafts(self):
        """top_k=1 at temperature 1: p is a point mass on the argmax, so
        argmax drafts are always accepted and the bonus is the argmax."""
        logits = self._logits(1)
        am = np.asarray(jnp.argmax(logits, axis=-1))
        drafts = jnp.asarray(am[:, :-1])
        bp = BatchedSampling.stack(
            [SamplingParams(temperature=1.0, top_k=1)] * self.B
        )
        for seed in range(5):
            t, acc, _, _ = self._call(
                logits, drafts, bp, jax.random.PRNGKey(seed)
            )
            assert list(np.asarray(acc)) == [self.K] * self.B
            np.testing.assert_array_equal(np.asarray(t), am)

    def test_collapsed_distribution_rejects_non_argmax_draft(self):
        """top_k=1 with a wrong draft at position 0: p(d)=0 -> always
        rejected, and the residual (p minus the draft) is the argmax."""
        logits = self._logits(2)
        am = np.asarray(jnp.argmax(logits, axis=-1))
        drafts = am[:, :-1].copy()
        drafts[:, 0] = (drafts[:, 0] + 1) % self.V  # wrong, inside vocab
        drafts = jnp.asarray(drafts)
        bp = BatchedSampling.stack(
            [SamplingParams(temperature=1.0, top_k=1)] * self.B
        )
        for seed in range(5):
            t, acc, _, _ = self._call(
                logits, drafts, bp, jax.random.PRNGKey(seed)
            )
            assert list(np.asarray(acc)) == [0] * self.B
            np.testing.assert_array_equal(np.asarray(t)[:, 0], am[:, 0])

    def test_first_position_marginal_is_target_distribution(self):
        """The emitted token at position 0 (draft if accepted, residual
        draw if not) must be distributed exactly as p — the theorem this
        path exists to satisfy."""
        V = 4
        logits_row = jnp.asarray([[1.2, 0.3, -0.5, 0.8]], jnp.float32)
        logits = jnp.broadcast_to(logits_row, (1, 2, V))  # [B=1, k+1=2, V]
        p = np.asarray(jax.nn.softmax(logits_row, axis=-1))[0]
        drafts = jnp.asarray([[2]], jnp.int32)  # a low-probability draft
        bp = BatchedSampling.stack([SamplingParams(temperature=1.0)])

        fn = jax.jit(
            lambda key: spec_verify_sampled(
                None,
                jnp.zeros(1, jnp.int32),
                drafts,
                None,
                jnp.zeros(1, jnp.int32),
                key,
                bp,
                fwd=_stub_fwd(logits),
                k=1,
            )[0][0, 0]
        )
        n = 4000
        keys = jax.random.split(jax.random.PRNGKey(42), n)
        toks = np.asarray(jax.vmap(fn)(keys))
        freq = np.bincount(toks, minlength=V) / n
        np.testing.assert_allclose(freq, p, atol=0.04)


class TestChunkSampledUnit:
    def test_every_step_marginal_is_target_distribution(self):
        """spec_chunk_sampled chains verify steps on device; with a stub
        forward whose logits are position/history-independent, the FIRST
        emitted token of every chained step must still be distributed
        exactly as p (the per-step key split preserves the theorem)."""
        from nf4_tpu.serve.speculative import spec_chunk_sampled

        V, k, n_steps, S = 4, 1, 3, 32
        logits_row = jnp.asarray([[1.2, 0.3, -0.5, 0.8]], jnp.float32)
        logits = jnp.broadcast_to(logits_row, (1, k + 1, V))
        p = np.asarray(jax.nn.softmax(logits_row, axis=-1))[0]
        bp = BatchedSampling.stack([SamplingParams(temperature=1.0)])
        hist = jnp.zeros((1, S), jnp.int32)

        def run(key):
            targets, accepted, _, _, _, _, _, _ = spec_chunk_sampled(
                None,
                jnp.zeros(1, jnp.int32),
                hist,
                None,
                jnp.zeros(1, jnp.int32),
                key,
                bp,
                fwd=_stub_fwd(logits),
                k=k,
                n_steps=n_steps,
            )
            return targets[:, 0, 0]  # first emitted token of each step

        n = 4000
        keys = jax.random.split(jax.random.PRNGKey(7), n)
        toks = np.asarray(jax.vmap(jax.jit(run))(keys))  # [n, n_steps]
        for step in range(n_steps):
            freq = np.bincount(toks[:, step], minlength=V) / n
            np.testing.assert_allclose(freq, p, atol=0.04)

    def test_greedy_rows_chain_argmax(self):
        """temperature-0 rows through the chained sampled path emit the
        stub's argmax at every position of every step."""
        from nf4_tpu.serve.speculative import spec_chunk_sampled

        V, k, n_steps, S = 5, 2, 3, 32
        logits_row = jnp.asarray([[0.1, 2.0, -1.0, 0.5, 0.0]], jnp.float32)
        logits = jnp.broadcast_to(logits_row, (1, k + 1, V))
        bp = BatchedSampling.stack([SamplingParams()])  # greedy
        targets, accepted, _, _, _, tok, pos, _ = spec_chunk_sampled(
            None,
            jnp.zeros(1, jnp.int32),
            jnp.zeros((1, S), jnp.int32),
            None,
            jnp.zeros(1, jnp.int32),
            jax.random.PRNGKey(0),
            bp,
            fwd=_stub_fwd(logits),
            k=k,
            n_steps=n_steps,
        )
        t, a = np.asarray(targets), np.asarray(accepted)
        for step in range(n_steps):
            emitted = t[step, 0, : a[step, 0] + 1]  # past that: stale drafts
            assert np.all(emitted == 1), (step, t[step])
        assert int(tok[0]) == 1


@pytest.fixture(scope="module")
def setup():
    cfg = configs.TINY_TEST
    params = init_params(cfg, seed=0)
    return cfg, params


class TestEngineSpecSampling:
    def test_topk1_spec_matches_nonspec(self, setup):
        """temperature=1 + top_k=1 is deterministic (argmax), so the spec
        engine must be token-identical to the plain engine."""
        cfg, params = setup
        prompts = [[1, 2, 3, 1, 2, 3, 1, 2], [4, 5, 6]]
        sp = SamplingParams(temperature=1.0, top_k=1)

        plain = Engine(params, cfg, batch_size=2, eos_token=-1).generate(
            prompts, max_new_tokens=10, sampling=sp
        )
        spec_eng = Engine(params, cfg, batch_size=2, eos_token=-1, spec_k=3)
        spec = spec_eng.generate(prompts, max_new_tokens=10, sampling=sp)
        assert [r.tokens for r in spec] == [r.tokens for r in plain]
        assert spec_eng.spec_stats["steps"] > 0

    def test_stochastic_spec_runs_and_emits(self, setup):
        cfg, params = setup
        prompts = [[1, 2, 3, 1, 2, 3, 1, 2], [4, 5, 6]]
        eng = Engine(params, cfg, batch_size=2, eos_token=-1, spec_k=3)
        res = eng.generate(
            prompts,
            max_new_tokens=12,
            sampling=SamplingParams(temperature=0.9),
        )
        assert all(len(r.tokens) == 12 for r in res)
        assert eng.spec_stats["steps"] > 0
        assert eng.spec_stats["emitted"] >= eng.spec_stats["steps"]

    def test_mixed_batch_greedy_row_stays_token_identical(self, setup):
        """A greedy request next to a stochastic one, through the sampled
        verifier, still emits exactly the plain greedy stream."""
        cfg, params = setup
        prompts = [[1, 2, 3, 1, 2, 3, 1, 2], [4, 5, 6]]

        plain = Engine(params, cfg, batch_size=2, eos_token=-1).generate(
            prompts, max_new_tokens=10
        )
        eng = Engine(params, cfg, batch_size=2, eos_token=-1, spec_k=3)
        res = eng.generate(
            prompts,
            max_new_tokens=10,
            sampling=[SamplingParams(), SamplingParams(temperature=1.0)],
        )
        assert res[0].tokens == plain[0].tokens
        assert eng.spec_stats["steps"] > 0

    def test_repetition_penalty_falls_back_to_plain_decode(self, setup):
        cfg, params = setup
        prompts = [[1, 2, 3, 1, 2], [4, 5, 6]]
        sp = SamplingParams(repetition_penalty=2.0)

        plain = Engine(params, cfg, batch_size=2, eos_token=-1).generate(
            prompts, max_new_tokens=8, sampling=sp
        )
        eng = Engine(params, cfg, batch_size=2, eos_token=-1, spec_k=3)
        res = eng.generate(prompts, max_new_tokens=8, sampling=sp)
        assert [r.tokens for r in res] == [r.tokens for r in plain]
        assert eng.spec_stats["steps"] == 0
