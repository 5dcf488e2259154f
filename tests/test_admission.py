"""Cross-request continuous batching: Engine.generate(admit=...) and the
HTTP dispatcher's mid-wave admission.

The reference package has no serving loop at all (SURVEY.md §2.2); this is
the framework's answer to the "late request waits for the whole wave"
problem: a request arriving while a wave decodes joins it the moment a slot
frees, provided the running call's compiled machinery can serve it
(Engine.admissible); otherwise it leads the next wave.
"""

import numpy as np
import pytest

from nf4_tpu.models.configs import TINY_TEST
from nf4_tpu.models.llama import init_params
from nf4_tpu.serve.api import CompletionServer, _Pending
from nf4_tpu.serve.engine import Engine
from nf4_tpu.serve.sampling import SamplingParams


@pytest.fixture(scope="module")
def params():
    return init_params(TINY_TEST, seed=0)


def make_engine(params, **kw):
    kw.setdefault("batch_size", 2)
    kw.setdefault("eos_token", -1)
    return Engine(params, TINY_TEST, **kw)


class TestEngineAdmit:
    def test_admitted_request_token_identical_to_solo(self, params):
        """A request admitted mid-flight gets the same greedy tokens as a
        solo generate() — its slot's KV rows are independent."""
        eng = make_engine(params)
        p3 = [9, 8, 7]
        fed = []

        def admit(features):
            if fed:
                return []
            fed.append(True)
            return [(p3, SamplingParams(max_new_tokens=6), None)]

        results = eng.generate(
            [[3, 1, 4], [1, 5, 9, 2]],
            max_new_tokens=4,
            sampling=[
                SamplingParams(max_new_tokens=2),  # retires first -> admit
                SamplingParams(max_new_tokens=10),
            ],
            admit=admit,
        )
        assert len(results) == 3 and fed
        assert len(results[0].tokens) == 2
        assert len(results[1].tokens) == 10
        solo = make_engine(params).generate([p3], max_new_tokens=6)[0]
        assert results[2].tokens == solo.tokens

    def test_admit_polled_until_idle(self, params):
        """admit() keeps being polled as slots free; returning [] ends the
        call once all work drains."""
        eng = make_engine(params)
        calls = []

        def admit(features):
            calls.append(len(features))
            return []

        results = eng.generate([[1, 2, 3]], max_new_tokens=3, admit=admit)
        assert len(results) == 1 and len(results[0].tokens) == 3
        assert len(calls) >= 1  # at least the initial refill polls

    def test_peek_admits_into_frozen_idle_slot_mid_run(self, params):
        """With ``admit.peek``, a request that arrives while an idle slot
        rides frozen through a pipelined chunk run is admitted within a
        chunk — its tokens interleave with the running request's —
        instead of waiting for the run to end."""
        eng = make_engine(params, decode_chunk=4)
        order = []  # (request_idx, token) in emission order
        fed = []
        arrived = []

        def admit(features):
            if fed or not arrived:
                return []
            fed.append(True)
            return [([9, 8, 7], SamplingParams(max_new_tokens=8), None)]

        def peek():
            # "Arrives" once the running request has emitted a few
            # tokens — i.e. mid-chunk-run, with slot 1 idle-frozen.
            if not arrived and len(order) >= 4:
                arrived.append(True)
            return bool(arrived) and not fed

        admit.peek = peek

        res = eng.generate(
            [[3, 1, 4]], max_new_tokens=48, admit=admit,
            on_token=lambda r, t: order.append((r, t)),
        )
        assert len(res) == 2 and fed
        assert len(res[1].tokens) == 8
        first_new = next(i for i, (r, _) in enumerate(order) if r != 0)
        last_r0 = max(i for i, (r, _) in enumerate(order) if r == 0)
        assert first_new < last_r0, (
            "admitted request's tokens should interleave with the running "
            "request (admitted mid-run, not after it)"
        )

    def test_peek_admits_during_spec_chunk_run(self, params):
        """Same contract through the SPECULATIVE chunk loop: a waiting
        request breaks a pipelined spec run at the next chunk when a
        slot is idle."""
        eng = make_engine(params, decode_chunk=4, spec_k=2)
        eng.spec_min_accept = 0.0  # keep spec engaged regardless of acc
        order = []
        fed = []
        arrived = []

        def admit(features):
            if fed or not arrived:
                return []
            fed.append(True)
            return [([9, 8, 7], SamplingParams(max_new_tokens=8), None)]

        def peek():
            if not arrived and len(order) >= 4:
                arrived.append(True)
            return bool(arrived) and not fed

        admit.peek = peek

        res = eng.generate(
            [[3, 1, 4] * 3], max_new_tokens=48, admit=admit,
            on_token=lambda r, t: order.append((r, t)),
        )
        assert len(res) == 2 and fed
        assert len(res[1].tokens) == 8
        first_new = next(i for i, (r, _) in enumerate(order) if r != 0)
        last_r0 = max(i for i, (r, _) in enumerate(order) if r == 0)
        assert first_new < last_r0

    def test_incompatible_admission_asserts(self, params):
        """admit() returning a request the call cannot serve is a caller
        bug — loud assertion, not silent misbehavior."""
        eng = make_engine(params)

        def admit(features):
            return [([5, 6], SamplingParams(repetition_penalty=1.5), None)]

        with pytest.raises(AssertionError, match="admissible"):
            eng.generate([[1, 2]], max_new_tokens=2, admit=admit)


class TestAdmissible:
    BASE = {
        "use_mask": False, "use_counts": False, "use_bias": False,
        "top_lp_k": 0, "return_logprobs": False, "adapters": False,
        "num_adapters": 0, "prefix": (), "max_prompt_len": 63,
    }

    def test_plain_greedy_admissible(self):
        assert Engine.admissible(self.BASE, [1, 2], SamplingParams())

    def test_machinery_gates(self):
        f = self.BASE
        assert not Engine.admissible(
            f, [1], SamplingParams(repetition_penalty=1.3)
        )
        assert not Engine.admissible(
            f, [1], SamplingParams(presence_penalty=0.5)
        )
        assert not Engine.admissible(
            f, [1], SamplingParams(logit_bias=((3, 1.0),))
        )
        assert not Engine.admissible(f, [1], SamplingParams(min_new_tokens=2))
        assert not Engine.admissible(f, [1], SamplingParams(top_logprobs=3))
        assert not Engine.admissible(f, [1], SamplingParams(), logprobs=True)
        assert not Engine.admissible(f, [1], SamplingParams(), adapter=0)
        rich = dict(
            f, use_mask=True, use_counts=True, use_bias=True,
            top_lp_k=5, return_logprobs=True, adapters=True,
            num_adapters=2,
        )
        assert Engine.admissible(
            rich, [1],
            SamplingParams(
                repetition_penalty=1.3, presence_penalty=0.5,
                logit_bias=((3, 1.0),), min_new_tokens=2, top_logprobs=5,
            ),
            logprobs=True, adapter=0,
        )
        # counts machinery alone doesn't cover a penalty needing the mask
        assert not Engine.admissible(
            dict(f, use_counts=True), [1],
            SamplingParams(presence_penalty=0.5),
        )
        # adapter index must be inside the bank the call was built with
        assert not Engine.admissible(rich, [1], SamplingParams(), adapter=2)
        assert not Engine.admissible(rich, [1], SamplingParams(), adapter=-2)
        assert Engine.admissible(rich, [1], SamplingParams(), adapter=1)

    def test_prompt_length_gate(self):
        f = self.BASE
        assert not Engine.admissible(f, [], SamplingParams())
        assert not Engine.admissible(f, list(range(64)), SamplingParams())
        assert Engine.admissible(f, list(range(63)), SamplingParams())

    def test_prefix_gate(self):
        f = dict(self.BASE, prefix=(7, 8, 9))
        assert Engine.admissible(f, [7, 8, 9, 1], SamplingParams())
        assert not Engine.admissible(f, [7, 8, 9], SamplingParams())  # no tail
        assert not Engine.admissible(f, [7, 8, 1, 2], SamplingParams())

    def test_prefix_cached_wave_admits_matching_prompt(self, params):
        """End to end: a prefix-cached call admits a prompt that extends
        the shared prefix and serves it token-identically."""
        eng = make_engine(params, batch_size=2, prefix_cache=True)
        shared = list(range(1, 21))
        late = shared + [31, 32]
        fed = []

        def admit(features):
            if fed or not Engine.admissible(
                features, late, SamplingParams()
            ):
                return []
            fed.append(True)
            return [(late, SamplingParams(max_new_tokens=4), None)]

        results = eng.generate(
            [shared + [25], shared + [26, 27]],
            max_new_tokens=3,
            sampling=[
                SamplingParams(max_new_tokens=1),
                SamplingParams(max_new_tokens=8),
            ],
            admit=admit,
        )
        assert len(results) == 3 and fed
        solo = make_engine(params).generate([late], max_new_tokens=4)[0]
        assert results[2].tokens == solo.tokens


class TestServerAdmission:
    def _pending(self, tokens, **kw):
        body_params = kw.pop("params", SamplingParams(max_new_tokens=4))
        return _Pending(
            tokens=list(tokens), params=body_params,
            logprobs=kw.pop("logprobs", False), **kw,
        )

    def test_queued_request_joins_running_wave(self, params):
        """A request sitting in the HTTP queue when the wave's first
        refill happens is admitted into the SAME engine call."""
        eng = make_engine(params)
        server = CompletionServer(eng, model_name="t")
        p1 = self._pending([3, 1, 4])
        p2 = self._pending([9, 8, 7], params=SamplingParams(max_new_tokens=6))
        server._queue.put(p2)
        deferred = server._run_wave([p1])
        assert deferred == []
        assert server.stats["admitted"] == 1
        assert server.stats["waves"] == 1
        assert p1.done.is_set() and p2.done.is_set()
        assert p1.error is None and p2.error is None
        solo = make_engine(params).generate([[9, 8, 7]], max_new_tokens=6)[0]
        assert p2.result.tokens == solo.tokens

    def test_incompatible_request_defers_to_next_wave(self, params):
        """A queued request needing machinery the running call lacks is
        returned deferred, then served by its own wave."""
        eng = make_engine(params)
        server = CompletionServer(eng, model_name="t")
        p1 = self._pending([3, 1, 4])
        p2 = self._pending(
            [9, 8, 7],
            params=SamplingParams(max_new_tokens=3, repetition_penalty=1.5),
        )
        server._queue.put(p2)
        deferred = server._run_wave([p1])
        assert deferred == [p2]
        assert server.stats["admitted"] == 0
        assert not p2.done.is_set()
        assert server._run_wave(deferred) == []
        assert p2.done.is_set() and p2.error is None
        assert len(p2.result.tokens) == 3

    def test_admitted_stream_receives_tokens(self, params):
        """An admitted request's SSE stream gets every token even when no
        initial request streams."""
        import queue as queue_mod

        eng = make_engine(params)
        server = CompletionServer(eng, model_name="t")
        p1 = self._pending([3, 1, 4])
        p2 = self._pending(
            [9, 8, 7], params=SamplingParams(max_new_tokens=5),
            stream_q=queue_mod.Queue(),
        )
        server._queue.put(p2)
        server._run_wave([p1])
        got = []
        while True:
            t = p2.stream_q.get_nowait()
            if t is None:
                break
            got.append(t)
        assert got == p2.result.tokens

    def test_scoring_only_request_defers(self, params):
        """echo/scoring requests (max_tokens=0) never join a running wave;
        they defer and are handled by their own wave's scoring pass."""
        eng = make_engine(params)
        server = CompletionServer(eng, model_name="t")
        p1 = self._pending([3, 1, 4])
        p2 = self._pending(
            [9, 8, 7], params=SamplingParams(max_new_tokens=0), echo=True,
        )
        server._queue.put(p2)
        deferred = server._run_wave([p1])
        assert deferred == [p2]
