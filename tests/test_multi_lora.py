"""Multi-LoRA serving: many adapters over ONE frozen 4-bit base.

The reference package's ecosystem (bnb/PEFT) serves one adapter per model
replica; here a bank of adapters rides a single Engine, selected per
request (``generate(..., adapter=[i, None, ...])``) with no recompile
across adapter mixes — the S-LoRA-style multiplexing a 4-bit base makes
cheap.  The selection math is a one-hot mask on the rank-r intermediate
between two full-bank einsums (no [B, out, r] gathers), so correctness
splits cleanly into: (a) the banked delta equals the single-adapter
delta, (b) bank indexing selects the right adapter, (c) batched rows are
independent, (d) no-adapter rows are bitwise the base model.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from nf4_tpu.models.configs import TINY_TEST
from nf4_tpu.models.llama import _lora_delta, init_params
from nf4_tpu.serve.engine import Engine
from nf4_tpu.train import LoraConfig, init_lora, make_train_step
from nf4_tpu.train.lora import LoraAB, stack_adapters

CFG = TINY_TEST


@pytest.fixture(scope="module")
def model():
    return init_params(CFG, seed=0)


def _adapters(n, rank=4, seed0=10):
    """n randomly-initialized adapters with NONZERO B (init_lora zeros B,
    which would make every delta 0 and the tests vacuous)."""
    out = []
    for i in range(n):
        lo = init_lora(CFG, LoraConfig(rank=rank, alpha=2 * rank), seed=seed0 + i)
        rng = np.random.default_rng(100 + i)

        def bump(ab):
            if ab is None:
                return None
            return LoraAB(
                a=ab.a,
                b=jnp.asarray(
                    rng.standard_normal(ab.b.shape).astype(np.float32) * 0.2
                ),
                scaling=ab.scaling,
            )

        out.append(
            lo.replace(
                layers=lo.layers.replace(
                    **{
                        f: bump(getattr(lo.layers, f))
                        for f in ("qkv", "o", "gateup", "down")
                    }
                )
            )
        )
    return out


class TestStackAdapters:
    def test_shapes_and_scaling_fold(self):
        l0, l1 = _adapters(2, rank=4)
        bank = stack_adapters([l0, l1])
        qkv = bank.layers.qkv
        L, A, r, in_d = qkv.a.shape
        assert (A, r) == (2, 4) and L == CFG.num_layers
        assert qkv.scaling == 1.0
        # scaling folded into a: bank.a[l, 0] == l0.a[l] * l0.scaling
        np.testing.assert_allclose(
            np.asarray(qkv.a[:, 0]),
            np.asarray(l0.layers.qkv.a) * l0.layers.qkv.scaling,
            rtol=0,
        )

    def test_rank_padding(self):
        l0 = _adapters(1, rank=2)[0]
        l1 = _adapters(1, rank=8, seed0=20)[0]
        bank = stack_adapters([l0, l1])
        assert bank.layers.qkv.a.shape[2] == 8
        # padded rows are zero
        np.testing.assert_array_equal(
            np.asarray(bank.layers.qkv.a[:, 0, 2:]), 0.0
        )


class TestBankedDelta:
    def test_banked_equals_single_per_row(self):
        """For each batch row, the banked one-hot delta equals the plain
        single-adapter delta of that row's adapter."""
        l0, l1 = _adapters(2)
        bank = stack_adapters([l0, l1])
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((3, 5, CFG.hidden_size)), jnp.float32)
        ids = jnp.asarray([0, 1, -1], jnp.int32)

        layer = 0
        ab_bank = LoraAB(
            a=bank.layers.qkv.a[layer], b=bank.layers.qkv.b[layer], scaling=1.0
        )
        got = np.asarray(_lora_delta(x, ab_bank, ids))
        for row, lo in ((0, l0), (1, l1)):
            ab = LoraAB(
                a=lo.layers.qkv.a[layer],
                b=lo.layers.qkv.b[layer],
                scaling=lo.layers.qkv.scaling,
            )
            want = np.asarray(_lora_delta(x[row : row + 1], ab))[0]
            np.testing.assert_allclose(got[row], want, rtol=2e-5, atol=2e-5)
        np.testing.assert_array_equal(got[2], 0.0)


class TestEngineMultiLora:
    def test_no_adapter_rows_match_base_engine(self, model):
        bank = _adapters(2)
        prompts = [[1, 2, 3, 4], [5, 6]]
        base = Engine(model, CFG, batch_size=2, eos_token=-1).generate(
            prompts, max_new_tokens=6
        )
        banked = Engine(
            model, CFG, batch_size=2, eos_token=-1, lora_bank=bank
        ).generate(prompts, max_new_tokens=6, adapter=[None, None])
        assert [r.tokens for r in banked] == [r.tokens for r in base]

    def test_bank_permutation_equivalence(self, model):
        """adapter i of bank [l0, l1] == adapter (1-i) of bank [l1, l0]."""
        l0, l1 = _adapters(2)
        prompts = [[1, 2, 3, 4], [5, 6, 7]]
        e01 = Engine(model, CFG, batch_size=2, eos_token=-1, lora_bank=[l0, l1])
        e10 = Engine(model, CFG, batch_size=2, eos_token=-1, lora_bank=[l1, l0])
        r01 = e01.generate(prompts, max_new_tokens=6, adapter=[0, 1])
        r10 = e10.generate(prompts, max_new_tokens=6, adapter=[1, 0])
        assert [r.tokens for r in r01] == [r.tokens for r in r10]
        # ...and the adapters genuinely change the output vs base
        rb = Engine(model, CFG, batch_size=2, eos_token=-1).generate(
            prompts, max_new_tokens=6
        )
        assert [r.tokens for r in r01] != [r.tokens for r in rb]

    def test_mixed_batch_rows_are_independent(self, model):
        """Each row of a mixed-adapter wave equals its own single-request
        run (token-identical — batching and slot assignment leak nothing)."""
        bank = _adapters(2)
        prompts = [[1, 2, 3, 4], [5, 6, 7], [8, 9]]
        adapters = [0, 1, None]
        eng = Engine(model, CFG, batch_size=4, eos_token=-1, lora_bank=bank)
        mixed = eng.generate(prompts, max_new_tokens=6, adapter=adapters)
        for i in range(3):
            solo = Engine(
                model, CFG, batch_size=4, eos_token=-1, lora_bank=bank
            ).generate([prompts[i]], max_new_tokens=6, adapter=[adapters[i]])
            assert mixed[i].tokens == solo[0].tokens, f"row {i} diverged"

    def test_multi_step_decode_chunk(self, model):
        """The lax.scan multi-step decode path carries the bundle too:
        decode_chunk=3 equals single-stepping."""
        bank = _adapters(2)
        prompts = [[1, 2, 3, 4], [5, 6, 7]]
        a = [0, 1]
        fast = Engine(
            model, CFG, batch_size=2, eos_token=-1, lora_bank=bank,
            decode_chunk=3,
        ).generate(prompts, max_new_tokens=9, adapter=a)
        slow = Engine(
            model, CFG, batch_size=2, eos_token=-1, lora_bank=bank,
            decode_chunk=1,
        ).generate(prompts, max_new_tokens=9, adapter=a)
        assert [r.tokens for r in fast] == [r.tokens for r in slow]

    def test_continuous_batching_refill_switches_adapter(self, model):
        """More requests than slots: a slot serves adapter 0, retires, and
        is refilled with adapter 1 — each request still matches its solo
        run."""
        bank = _adapters(2)
        prompts = [[1, 2, 3], [4, 5, 6], [7, 8], [9, 1]]
        adapters = [0, 1, 1, 0]
        eng = Engine(model, CFG, batch_size=2, eos_token=-1, lora_bank=bank)
        res = eng.generate(prompts, max_new_tokens=5, adapter=adapters)
        for i in range(4):
            solo = Engine(
                model, CFG, batch_size=2, eos_token=-1, lora_bank=bank
            ).generate([prompts[i]], max_new_tokens=5, adapter=[adapters[i]])
            assert res[i].tokens == solo[0].tokens, f"request {i} diverged"

    def test_trained_adapters_differ_end_to_end(self, model):
        """Two briefly-trained adapters steer generation differently —
        the bank serves real fine-tunes, not just noise."""
        rng = np.random.default_rng(0)
        opt = optax.adamw(5e-2)
        adapters = []
        for seed in (0, 1):
            lora = init_lora(CFG, LoraConfig(rank=4), seed=seed)
            step = make_train_step(CFG, opt)
            ost = opt.init(lora)
            toks = jnp.asarray(
                rng.integers(0, CFG.vocab_size, (2, 12)), jnp.int32
            )
            for _ in range(3):
                lora, ost, _ = step(model, lora, ost, toks)
            adapters.append(jax.device_get(lora))
        eng = Engine(model, CFG, batch_size=2, eos_token=-1, lora_bank=adapters)
        out = eng.generate(
            [[1, 2, 3, 4]] * 2, max_new_tokens=8, adapter=[0, 1]
        )
        base = Engine(model, CFG, batch_size=1, eos_token=-1).generate(
            [[1, 2, 3, 4]], max_new_tokens=8
        )
        assert out[0].tokens != out[1].tokens
        assert out[0].tokens != base[0].tokens

    def test_guards(self, model):
        bank = _adapters(2)
        eng = Engine(model, CFG, batch_size=2, eos_token=-1, lora_bank=bank)
        with pytest.raises(AssertionError, match="adapter indices"):
            eng.generate([[1, 2]], max_new_tokens=2, adapter=[5])
        with pytest.raises(AssertionError, match="lora_bank"):
            Engine(model, CFG, batch_size=2, lora_bank=bank, spec_k=2)
        plain = Engine(model, CFG, batch_size=2, eos_token=-1)
        with pytest.raises(AssertionError, match="lora_bank"):
            plain.generate([[1, 2]], max_new_tokens=2, adapter=[0])


class TestMultiLoraHTTP:
    """OpenAI "model" multiplexing: each adapter is its own served model
    id over one engine/base — through a real socket."""

    def test_model_field_selects_adapter(self, model):
        import json
        import urllib.request

        from nf4_tpu.serve.api import CompletionServer

        bank = _adapters(2)
        eng = Engine(model, CFG, batch_size=2, eos_token=-1, lora_bank=bank)
        server = CompletionServer(
            eng, model_name="base", adapters={"tune-a": 0, "tune-b": 1}
        )
        port = server.start(port=0)
        url = f"http://127.0.0.1:{port}"
        try:
            with urllib.request.urlopen(url + "/v1/models", timeout=30) as r:
                ids = [m["id"] for m in json.loads(r.read())["data"]]
            assert ids == ["base", "tune-a", "tune-b"]

            def post(body):
                req = urllib.request.Request(
                    url + "/v1/completions",
                    data=json.dumps(body).encode(),
                    headers={"Content-Type": "application/json"},
                    method="POST",
                )
                try:
                    with urllib.request.urlopen(req, timeout=300) as resp:
                        return resp.status, json.loads(resp.read())
                except urllib.error.HTTPError as e:
                    return e.code, json.loads(e.read())

            prompt = [1, 2, 3, 4]
            outs = {}
            for name in ("base", "tune-a", "tune-b"):
                st, body = post(
                    {"model": name, "prompt": prompt, "max_tokens": 6}
                )
                assert st == 200, body
                outs[name] = body["choices"][0]["tokens"]

            twin = Engine(
                model, CFG, batch_size=2, eos_token=-1, lora_bank=bank
            )
            for name, idx in (("base", None), ("tune-a", 0), ("tune-b", 1)):
                want = twin.generate(
                    [prompt], max_new_tokens=6, adapter=[idx]
                )[0].tokens
                assert outs[name] == want, name

            st, body = post(
                {"model": "nope", "prompt": prompt, "max_tokens": 4}
            )
            assert st == 400 and "unknown model" in body["error"]
        finally:
            server.stop()


class TestScoreWithAdapter:
    def test_score_honors_adapter(self, model):
        """Engine.score(adapter=[i]) scores through adapter i: it must
        match token_logprobs on the banked forward and DIFFER from the
        base model's scores."""
        from nf4_tpu.eval.ppl import token_logprobs

        bank = _adapters(2)
        eng = Engine(model, CFG, batch_size=2, eos_token=-1, lora_bank=bank)
        seqs = [[1, 2, 3, 4, 5], [6, 7, 8]]
        with_a = eng.score(seqs, adapter=[0, None])
        base = eng.score(seqs)
        # Row 1 had no adapter: identical to base.
        np.testing.assert_allclose(with_a[1], base[1], rtol=1e-6)
        # Row 0 went through adapter 0: different scores.
        assert not np.allclose(with_a[0], base[0], rtol=1e-4)
