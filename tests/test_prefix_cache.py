"""Shared-prefix caching: token-identical to plain generation.

``Engine(prefix_cache=True)`` prefills the common prompt prefix once,
broadcasts its KV to every slot, and prefills only each prompt's
remainder (continuation prefill with a position offset).  The reference
package has no serving layer (SURVEY.md §2.2); this targets the
few-shot / RAG / long-system-prompt serving workloads behind BASELINE's
tokens/s rows.  Correctness bar: same tokens (and logprobs) as the
plain engine on the same prompts.
"""

import dataclasses

import numpy as np
import pytest

import jax

from nf4_tpu.models import configs
from nf4_tpu.models.llama import init_params
from nf4_tpu.serve.engine import Engine, _common_prefix_len


@pytest.fixture(scope="module")
def setup():
    cfg = dataclasses.replace(configs.TINY_TEST, max_seq_len=128)
    params = init_params(cfg, seed=0)
    return cfg, params


PREFIX = [7, 3, 11, 5, 2, 9, 13, 4, 8, 6, 1, 12, 10, 14, 15, 3, 7, 2, 5, 9]


def _prompts(n):
    return [PREFIX + [20 + i, 21 + i, 22 + (i % 3)] for i in range(n)]


def test_common_prefix_len():
    assert _common_prefix_len([[1, 2, 3], [1, 2, 4], [1, 2]]) == 2
    assert _common_prefix_len([[1, 2], [3, 4]]) == 0
    assert _common_prefix_len([[5, 6, 7]]) == 3


def test_prefix_matches_plain_with_refill(setup):
    """5 requests through 2 slots: later requests reuse the prefix KV left
    in freed slots (the [0, Lp) region is never overwritten)."""
    cfg, params = setup
    prompts = _prompts(5)

    plain = Engine(params, cfg, batch_size=2, eos_token=-1)
    want = plain.generate(prompts, max_new_tokens=8, return_logprobs=True)

    eng = Engine(params, cfg, batch_size=2, eos_token=-1, prefix_cache=True)
    got = eng.generate(prompts, max_new_tokens=8, return_logprobs=True)

    assert eng.prefix_stats["prefix_len"] == len(PREFIX)
    assert eng.prefix_stats["tokens_saved"] == len(PREFIX) * 4
    assert [r.tokens for r in got] == [r.tokens for r in want]
    for g, w in zip(got, want):
        np.testing.assert_allclose(g.logprobs, w.logprobs, atol=1e-5)


def test_cross_call_prefix_reuse(setup):
    """A second generate() with the same prefix reuses the saved KV row
    (no prefix prefill at all); a different prefix re-prefills."""
    cfg, params = setup

    eng = Engine(params, cfg, batch_size=2, eos_token=-1, prefix_cache=True)
    first = eng.generate(_prompts(3), max_new_tokens=6)
    assert eng.prefix_stats["reused"] is False

    calls = []
    orig = eng._prefill_g
    eng._prefill_g = lambda *a, **kw: (calls.append(kw["bucket"]), orig(*a, **kw))[1]
    second = eng.generate(_prompts(3), max_new_tokens=6)
    assert eng.prefix_stats["reused"] is True
    # Only the 3 continuation prefills ran — no prefix-sized bucket.
    assert all(b < len(PREFIX) for b in calls)
    assert [r.tokens for r in second] == [r.tokens for r in first]

    other = [[9, 9] + PREFIX + [40 + i] for i in range(3)]
    eng._prefill_g = orig
    plain = Engine(params, cfg, batch_size=2, eos_token=-1)
    want = [r.tokens for r in plain.generate(other, max_new_tokens=6)]
    got = [r.tokens for r in eng.generate(other, max_new_tokens=6)]
    assert eng.prefix_stats["reused"] is False
    assert got == want


def test_short_lcp_disables_prefix(setup):
    """An LCP under the 16-token floor must leave the plain path untouched."""
    cfg, params = setup
    prompts = [[1, 2, 3, 40 + i, 50 + i] for i in range(3)]

    plain = Engine(params, cfg, batch_size=2, eos_token=-1)
    want = [r.tokens for r in plain.generate(prompts, max_new_tokens=5)]

    eng = Engine(params, cfg, batch_size=2, eos_token=-1, prefix_cache=True)
    got = [r.tokens for r in eng.generate(prompts, max_new_tokens=5)]

    assert eng.prefix_stats["prefix_len"] == 0
    assert got == want


def test_prompt_equal_to_prefix_edge(setup):
    """A prompt that IS the shared prefix: Lp caps one short so the request
    still prefills its final token (which produces its first logits)."""
    cfg, params = setup
    prompts = [list(PREFIX), PREFIX + [30], PREFIX + [31, 32]]

    plain = Engine(params, cfg, batch_size=3, eos_token=-1)
    want = [r.tokens for r in plain.generate(prompts, max_new_tokens=6)]

    eng = Engine(params, cfg, batch_size=3, eos_token=-1, prefix_cache=True)
    got = [r.tokens for r in eng.generate(prompts, max_new_tokens=6)]

    assert eng.prefix_stats["prefix_len"] == len(PREFIX) - 1
    assert got == want


def test_prefix_with_kv_quant(setup):
    """int8 KV: the broadcast copies quantized planes + scales; generation
    must match the plain int8-KV engine."""
    cfg, params = setup
    cfg8 = dataclasses.replace(cfg, kv_quant=True)
    prompts = _prompts(4)

    plain = Engine(params, cfg8, batch_size=2, eos_token=-1)
    want = [r.tokens for r in plain.generate(prompts, max_new_tokens=6)]

    eng = Engine(params, cfg8, batch_size=2, eos_token=-1, prefix_cache=True)
    got = [r.tokens for r in eng.generate(prompts, max_new_tokens=6)]
    assert got == want


def test_prefix_with_speculative(setup):
    """prefix_cache composes with spec_k: both are token-identical paths."""
    cfg, params = setup
    prompts = _prompts(4)

    plain = Engine(params, cfg, batch_size=2, eos_token=-1)
    want = [r.tokens for r in plain.generate(prompts, max_new_tokens=10)]

    eng = Engine(
        params, cfg, batch_size=2, eos_token=-1, prefix_cache=True, spec_k=3
    )
    got = [r.tokens for r in eng.generate(prompts, max_new_tokens=10)]
    assert got == want


class TestTPPrefix:
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
            max_seq_len=64,
            tp_shards=4,
        )
        mesh = make_mesh(tp=4, dp=2)
        params = init_params(cfg, seed=0)
        return cfg, params, mesh

    def test_tp_prefix_matches_plain(self, tp_setup):
        cfg, params, mesh = tp_setup
        prompts = _prompts(4)

        plain = Engine(params, cfg, batch_size=2, eos_token=-1)
        want = [r.tokens for r in plain.generate(prompts, max_new_tokens=5)]

        eng = Engine(
            params, cfg, batch_size=2, eos_token=-1, mesh=mesh,
            prefix_cache=True,
        )
        got = [r.tokens for r in eng.generate(prompts, max_new_tokens=5)]
        assert eng.prefix_stats["prefix_len"] == len(PREFIX)
        assert got == want
