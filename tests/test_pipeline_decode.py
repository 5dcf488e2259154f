"""Pipelined multi-step decode: chunk c+1 launched from chunk c's device
handles before c's readback (serve/engine.py generate(), multi-step branch).

Contract: greedy output is TOKEN-IDENTICAL with the pipeline on or off —
including mid-chunk stops (which force the speculative chunk to be
discarded), budget tails, continuous-batching refills, and per-request
sampling mixes with seeded rows.  The discard needs no rollback because the
device side is purely functional (each chunk returns fresh buffers).
"""

import numpy as np
import pytest

from nf4_tpu.models import configs
from nf4_tpu.models.llama import init_params
from nf4_tpu.serve.engine import Engine
from nf4_tpu.serve.sampling import SamplingParams


@pytest.fixture(scope="module")
def setup():
    cfg = configs.TINY_TEST
    params = init_params(cfg, seed=0)
    return cfg, params


def _tokens(engine, prompts, **kw):
    return [r.tokens for r in engine.generate(prompts, **kw)]


class TestPipelinedDecode:
    def test_engages_and_matches_plain(self, setup):
        cfg, params = setup
        prompts = [[1, 2, 3], [4, 5]]
        pipe = Engine(params, cfg, batch_size=2, eos_token=-1, decode_chunk=4)
        plain = Engine(
            params, cfg, batch_size=2, eos_token=-1, decode_chunk=4,
            pipeline_decode=False,
        )
        a = _tokens(pipe, prompts, max_new_tokens=24)
        b = _tokens(plain, prompts, max_new_tokens=24)
        assert a == b
        assert pipe.pipeline_stats["launched"] > 0
        assert plain.pipeline_stats["launched"] == 0

    def test_mid_chunk_stop_discards_speculative_chunk(self, setup):
        """A stop token landing mid-chunk retires the slot; the speculative
        chunk in flight must be dropped and the result must still equal the
        unpipelined engine's."""
        cfg, params = setup
        probe = Engine(params, cfg, batch_size=1, eos_token=-1, decode_chunk=4)
        ref = probe.generate([[1, 2, 3]], max_new_tokens=24)[0].tokens
        assert len(ref) >= 10
        stop = ref[9]  # lands mid-chunk (position 9 inside chunk 3 of 4)

        pipe = Engine(params, cfg, batch_size=1, eos_token=-1, decode_chunk=4)
        plain = Engine(
            params, cfg, batch_size=1, eos_token=-1, decode_chunk=4,
            pipeline_decode=False,
        )
        a = pipe.generate(
            [[1, 2, 3]], max_new_tokens=24, stop_tokens=[stop]
        )[0]
        b = plain.generate(
            [[1, 2, 3]], max_new_tokens=24, stop_tokens=[stop]
        )[0]
        assert a.tokens == b.tokens == ref[:9]
        assert pipe.pipeline_stats["discarded"] >= 1

    def test_continuous_batching_refill(self, setup):
        """More prompts than slots: retirement + refill between pipelined
        runs must reproduce the unpipelined schedule's outputs."""
        cfg, params = setup
        prompts = [[1, 2, 3], [7, 8], [9], [10, 11, 12, 13], [2], [3, 4]]
        pipe = Engine(params, cfg, batch_size=2, eos_token=-1, decode_chunk=4)
        plain = Engine(
            params, cfg, batch_size=2, eos_token=-1, decode_chunk=4,
            pipeline_decode=False,
        )
        assert _tokens(pipe, prompts, max_new_tokens=13) == _tokens(
            plain, prompts, max_new_tokens=13
        )

    def test_per_request_sampling_seeded_rows_identical(self, setup):
        """Seeded rows are a pure function of (seed, step) — pipeline
        on/off, and even discarded speculative chunks, must not change
        them.  Greedy rows ride along."""
        cfg, params = setup
        sps = [
            SamplingParams(temperature=0.8, top_k=8, seed=11),
            SamplingParams(temperature=0.0),
        ]
        prompts = [[1, 2, 3], [4, 5]]
        pipe = Engine(params, cfg, batch_size=2, eos_token=-1, decode_chunk=4)
        plain = Engine(
            params, cfg, batch_size=2, eos_token=-1, decode_chunk=4,
            pipeline_decode=False,
        )
        a = _tokens(pipe, prompts, max_new_tokens=16, sampling=sps)
        b = _tokens(plain, prompts, max_new_tokens=16, sampling=sps)
        assert a == b
        assert pipe.pipeline_stats["launched"] > 0

    def test_budget_tail_single_steps(self, setup):
        """max_new_tokens not a multiple of the chunk: the tail single-steps
        and the pipeline never launches a chunk past the budget."""
        cfg, params = setup
        pipe = Engine(params, cfg, batch_size=2, eos_token=-1, decode_chunk=4)
        plain = Engine(
            params, cfg, batch_size=2, eos_token=-1, decode_chunk=4,
            pipeline_decode=False,
        )
        prompts = [[1, 2, 3], [4, 5]]
        a = _tokens(pipe, prompts, max_new_tokens=10)
        b = _tokens(plain, prompts, max_new_tokens=10)
        assert a == b
        assert all(len(t) == 10 for t in a)

    def test_idle_slots_keep_chunking(self, setup):
        """Heterogeneous budgets: after the short request retires (queue
        empty), the surviving slot keeps CHUNKED decode — idle slots ride
        along frozen inside the compiled chunk — instead of collapsing to
        per-token host syncs.  Output token-identical to solo runs."""
        cfg, params = setup
        prompts = [[1, 2, 3], [4, 5]]
        budgets = [SamplingParams(max_new_tokens=4),
                   SamplingParams(max_new_tokens=20)]
        eng = Engine(params, cfg, batch_size=2, eos_token=-1, decode_chunk=4)
        res = eng.generate(prompts, max_new_tokens=20, sampling=budgets)
        assert len(res[0].tokens) == 4 and len(res[1].tokens) == 20
        # The 16-token tail runs as 4 chunks; the pipelined lookahead
        # launches for it (it cannot launch while the short request's
        # budget caps chunk_ok(1)).  Without idle-slot chunking this is 0.
        assert eng.pipeline_stats["launched"] >= 3
        for p, r in zip(prompts, res):
            solo = Engine(
                params, cfg, batch_size=1, eos_token=-1, decode_chunk=4
            ).generate([p], max_new_tokens=len(r.tokens))[0]
            assert r.tokens == solo.tokens

    def test_idle_slot_refills_after_frozen_chunks(self, setup):
        """A slot that idled through frozen chunks serves a later admitted
        request token-identically (its garbage KV window is invisible /
        overwritten by the refill prefill)."""
        cfg, params = setup
        fed = []

        def admit(features):
            # Admit once the wave is already running with slot 1 idle.
            if fed:
                return []
            fed.append(True)
            return [([7, 8, 9], SamplingParams(max_new_tokens=6), None)]

        eng = Engine(params, cfg, batch_size=2, eos_token=-1, decode_chunk=4)
        res = eng.generate(
            [[1, 2, 3]], max_new_tokens=16, admit=admit,
        )
        assert len(res) == 2 and fed
        solo = Engine(
            params, cfg, batch_size=1, eos_token=-1, decode_chunk=4
        ).generate([[7, 8, 9]], max_new_tokens=6)[0]
        assert res[1].tokens == solo.tokens

    def test_eos_default_engine(self, setup):
        """The stock engine (pipeline on by default) still honors EOS."""
        cfg, params = setup
        probe = Engine(params, cfg, batch_size=1, eos_token=-1)
        ref = probe.generate([[1, 2, 3]], max_new_tokens=12)[0].tokens
        eos = ref[5]
        eng = Engine(params, cfg, batch_size=1, eos_token=eos)
        r = eng.generate([[1, 2, 3]], max_new_tokens=12)[0]
        assert r.finished
        assert r.tokens == ref[:5]
