"""Request cancellation: Engine.generate(cancel=...) and the HTTP server's
client-disconnect handling.

The reference package has no serving loop (SURVEY.md §2.2); a production
engine must stop spending chip time on a request whose client went away.
``cancel(request_idx)`` is polled at every host sync — a cancelled request
retires within one decode chunk (its result carries whatever was generated,
``finished=False``) and its slot refills from the queue / ``admit``.  The
HTTP dispatcher wires it to a per-request flag set when an SSE socket write
fails (client disconnect).
"""

import json
import socket
import threading
import time
import urllib.request

import pytest

from nf4_tpu.models.configs import TINY_TEST
from nf4_tpu.models.llama import init_params
from nf4_tpu.serve.api import CompletionServer
from nf4_tpu.serve.engine import Engine
from nf4_tpu.serve.sampling import SamplingParams


@pytest.fixture(scope="module")
def params():
    return init_params(TINY_TEST, seed=0)


def make_engine(params, **kw):
    kw.setdefault("batch_size", 2)
    kw.setdefault("eos_token", -1)
    return Engine(params, TINY_TEST, **kw)


class TestEngineCancel:
    def test_cancel_mid_decode_frees_early(self, params):
        """Cancelling request 0 after a few tokens retires it well short of
        its budget (within the pipelined-chunk horizon), finished=False;
        the surviving request is untouched (token-identical to solo)."""
        eng = make_engine(params)
        cancelled = [False]

        def on_token(r, t):
            if r == 0 and not cancelled[0]:
                on_token.count += 1
                if on_token.count >= 3:
                    cancelled[0] = True

        on_token.count = 0

        results = eng.generate(
            [[3, 1, 4], [1, 5, 9]],
            max_new_tokens=40,
            on_token=on_token,
            cancel=lambda r: r == 0 and cancelled[0],
        )
        assert not results[0].finished
        # >= the 3 tokens that triggered the cancel, but far short of the
        # 40-token budget even with one consumed + one discarded chunk.
        assert 3 <= len(results[0].tokens) < 40
        solo = make_engine(params).generate([[1, 5, 9]], max_new_tokens=40)[0]
        assert results[1].tokens == solo.tokens

    def test_cancel_while_queued_never_prefills(self, params):
        """A request cancelled before a slot opens completes empty."""
        eng = make_engine(params, batch_size=2)
        results = eng.generate(
            [[3, 1, 4], [1, 5, 9], [2, 6, 5]],
            max_new_tokens=4,
            cancel=lambda r: r == 2,
        )
        assert results[2].tokens == [] and not results[2].finished
        assert len(results[0].tokens) == 4 and len(results[1].tokens) == 4

    def test_cancelled_slot_admits_new_request(self, params):
        """The freed slot goes to an admitted request, which decodes
        token-identically to its solo run."""
        eng = make_engine(params, batch_size=1)
        cancelled = [False]
        fed = []

        def on_token(r, t):
            if r == 0:
                cancelled[0] = True

        def admit(features):
            if fed:
                return []
            fed.append(True)
            return [([9, 8, 7], SamplingParams(max_new_tokens=5), None)]

        results = eng.generate(
            [[3, 1, 4]],
            max_new_tokens=30,
            on_token=on_token,
            admit=admit,
            cancel=lambda r: r == 0 and cancelled[0],
        )
        assert len(results) == 2 and fed
        assert not results[0].finished and len(results[0].tokens) < 30
        solo = make_engine(params).generate([[9, 8, 7]], max_new_tokens=5)[0]
        assert results[1].tokens == solo.tokens

    def test_never_cancelled_is_identity(self, params):
        """A cancel callback that always says False changes nothing."""
        base = make_engine(params).generate(
            [[3, 1, 4], [1, 5, 9]], max_new_tokens=8
        )
        with_cb = make_engine(params).generate(
            [[3, 1, 4], [1, 5, 9]], max_new_tokens=8, cancel=lambda r: False
        )
        for a, b in zip(base, with_cb):
            assert a.tokens == b.tokens and a.finished == b.finished

    def test_cancel_with_spec_decoding(self, params):
        """Cancellation composes with speculative decoding (device-chained
        greedy waves poll cancel between chunks)."""
        eng = make_engine(params, spec_k=3)
        cancelled = [False]

        def on_token(r, t):
            if r == 0:
                cancelled[0] = True

        results = eng.generate(
            [[3, 1, 4], [1, 5, 9]],
            max_new_tokens=40,
            on_token=on_token,
            cancel=lambda r: r == 0 and cancelled[0],
        )
        assert not results[0].finished and len(results[0].tokens) < 40
        solo = make_engine(params).generate([[1, 5, 9]], max_new_tokens=40)[0]
        assert results[1].tokens == solo.tokens


class TestHTTPDisconnect:
    @pytest.fixture(scope="class")
    def served(self, params):
        engine = Engine(params, TINY_TEST, batch_size=2, eos_token=-1)
        server = CompletionServer(engine)
        port = server.start(port=0)
        yield f"127.0.0.1:{port}", server
        server.stop()

    def test_disconnect_mid_stream_cancels(self, served):
        """Closing the socket mid-SSE flags the request cancelled; the
        wave retires it (nf4tpu cancelled counter) and the server keeps
        serving new requests."""
        addr, server = served
        host, port = addr.split(":")
        body = json.dumps(
            {"prompt": [4, 5, 6], "max_tokens": 50, "stream": True}
        ).encode()
        s = socket.create_connection((host, int(port)), timeout=60)
        s.sendall(
            b"POST /v1/completions HTTP/1.1\r\nHost: x\r\n"
            b"Content-Type: application/json\r\n"
            + f"Content-Length: {len(body)}\r\n\r\n".encode()
            + body
        )
        # Read until at least two SSE data lines arrived, then vanish.
        buf = b""
        while buf.count(b"data: ") < 2:
            chunk = s.recv(4096)
            assert chunk, "server closed before streaming two tokens"
            buf += chunk
        s.close()

        deadline = time.time() + 120
        while server.stats["cancelled"] < 1 and time.time() < deadline:
            time.sleep(0.05)
        assert server.stats["cancelled"] == 1

        # The engine survives and serves the next request normally.
        req = urllib.request.Request(
            f"http://{addr}/v1/completions",
            data=json.dumps({"prompt": [3, 5, 7], "max_tokens": 4}).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=300) as resp:
            out = json.loads(resp.read())
        assert len(out["choices"][0]["tokens"]) == 4

    def test_cancelled_finish_reason_abort(self, served):
        """A cancelled-and-unfinished request reports finish_reason
        'abort' (vLLM's name), distinguishable from budget exhaustion;
        a request whose socket closed AFTER finishing stays 'stop'."""
        from nf4_tpu.serve.api import _Pending
        from nf4_tpu.serve.engine import GenerationResult
        from nf4_tpu.serve.sampling import SamplingParams as SP

        _, server = served
        cut = _Pending(tokens=[1, 2], params=SP(), logprobs=False)
        cut.cancelled = True
        cut.result = GenerationResult([1, 2], [7, 8], False)
        assert server._choice(cut, 0)["finish_reason"] == "abort"

        late_close = _Pending(tokens=[1, 2], params=SP(), logprobs=False)
        late_close.cancelled = True
        late_close.result = GenerationResult([1, 2], [7, 8], True)
        assert server._choice(late_close, 0)["finish_reason"] == "stop"

        budget = _Pending(tokens=[1, 2], params=SP(), logprobs=False)
        budget.result = GenerationResult([1, 2], [7, 8], False)
        assert server._choice(budget, 0)["finish_reason"] == "length"

    def test_metrics_exposes_cancelled_counter(self, served):
        addr, server = served
        with urllib.request.urlopen(
            f"http://{addr}/metrics", timeout=60
        ) as r:
            text = r.read().decode()
        assert "nf4tpu_cancelled_total" in text
