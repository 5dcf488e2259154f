"""Top-k logprobs (OpenAI completions' integer ``logprobs`` / chat's
``top_logprobs``): per generated position, the top-k (token, logprob) of
the model's RAW next-token distribution — the same distribution the
chosen-token logprob is read from, so greedy decoding's top-1 must equal
the emitted token and its recorded logprob exactly."""

import json
import urllib.request

import jax.numpy as jnp
import numpy as np
import pytest

from nf4_tpu.models.configs import TINY_TEST
from nf4_tpu.models.llama import init_params
from nf4_tpu.serve.engine import Engine
from nf4_tpu.serve.sampling import SamplingParams

CFG = TINY_TEST


@pytest.fixture(scope="module")
def model():
    return init_params(CFG, seed=0)


class TestEngineTopLogprobs:
    def test_greedy_top1_is_the_emitted_token(self, model):
        eng = Engine(model, CFG, batch_size=2, eos_token=-1)
        res = eng.generate(
            [[1, 2, 3, 4], [5, 6]],
            max_new_tokens=5,
            sampling=SamplingParams(top_logprobs=3),
            return_logprobs=True,
        )
        for r in res:
            assert r.top_logprobs is not None
            assert len(r.top_logprobs) == len(r.tokens)
            for pos, (tok, lp, row) in enumerate(
                zip(r.tokens, r.logprobs, r.top_logprobs)
            ):
                assert len(row) == 3
                ids = [t for t, _ in row]
                vals = [v for _, v in row]
                assert ids[0] == tok, f"pos {pos}: top-1 != greedy token"
                np.testing.assert_allclose(vals[0], lp, rtol=1e-6)
                assert vals == sorted(vals, reverse=True)

    def test_per_request_k_is_respected(self, model):
        """Mixed wave: one request wants k=4, one k=0 — the device computes
        top-max(k) once, each request gets its own slice."""
        eng = Engine(model, CFG, batch_size=2, eos_token=-1)
        res = eng.generate(
            [[1, 2, 3], [4, 5, 6]],
            max_new_tokens=4,
            sampling=[SamplingParams(top_logprobs=4), SamplingParams()],
        )
        assert res[0].top_logprobs is not None
        assert all(len(row) == 4 for row in res[0].top_logprobs)
        assert res[1].top_logprobs is None

    def test_chunked_decode_matches_single_step(self, model):
        a = Engine(
            model, CFG, batch_size=2, eos_token=-1, decode_chunk=3
        ).generate(
            [[1, 2, 3, 4], [5, 6]],
            max_new_tokens=9,
            sampling=SamplingParams(top_logprobs=2),
        )
        b = Engine(
            model, CFG, batch_size=2, eos_token=-1, decode_chunk=1
        ).generate(
            [[1, 2, 3, 4], [5, 6]],
            max_new_tokens=9,
            sampling=SamplingParams(top_logprobs=2),
        )
        for ra, rb in zip(a, b):
            assert ra.tokens == rb.tokens
            assert len(ra.top_logprobs) == len(rb.top_logprobs)
            for rowa, rowb in zip(ra.top_logprobs, rb.top_logprobs):
                assert [t for t, _ in rowa] == [t for t, _ in rowb]
                np.testing.assert_allclose(
                    [v for _, v in rowa], [v for _, v in rowb], rtol=1e-5
                )

    def test_stochastic_rows_record_alternatives(self, model):
        eng = Engine(model, CFG, batch_size=1, eos_token=-1)
        res = eng.generate(
            [[1, 2, 3]],
            max_new_tokens=4,
            sampling=SamplingParams(temperature=1.0, seed=3, top_logprobs=2),
        )
        r = res[0]
        assert len(r.top_logprobs) == len(r.tokens)
        # logprobs are from the RAW distribution: finite, <= 0, sorted.
        for row in r.top_logprobs:
            vals = [v for _, v in row]
            assert all(np.isfinite(vals)) and vals[0] <= 0.0
            assert vals == sorted(vals, reverse=True)


class TestHTTPTopLogprobs:
    def test_completions_integer_logprobs(self, model):
        from nf4_tpu.serve.api import CompletionServer

        eng = Engine(model, CFG, batch_size=2, eos_token=-1)
        server = CompletionServer(eng)
        port = server.start(port=0)
        url = f"http://127.0.0.1:{port}/v1/completions"
        try:
            req = urllib.request.Request(
                url,
                data=json.dumps(
                    {"prompt": [1, 2, 3, 4], "max_tokens": 4, "logprobs": 3}
                ).encode(),
                headers={"Content-Type": "application/json"},
                method="POST",
            )
            with urllib.request.urlopen(req, timeout=300) as resp:
                body = json.loads(resp.read())
            ch = body["choices"][0]
            lp = ch["logprobs"]
            assert len(lp["token_logprobs"]) == len(ch["tokens"])
            assert len(lp["top_logprobs"]) == len(ch["tokens"])
            for tok, chosen_lp, row in zip(
                ch["tokens"], lp["token_logprobs"], lp["top_logprobs"]
            ):
                assert len(row) == 3
                # greedy: the chosen token's logprob is the max of the row
                assert abs(max(row.values()) - chosen_lp) < 1e-5
                assert str(tok) in row  # no tokenizer -> id keys
        finally:
            server.stop()
