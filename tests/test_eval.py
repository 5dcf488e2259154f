"""Tests for the perplexity evaluation harness (nf4_tpu.eval.ppl)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nf4_tpu.eval.ppl import perplexity, perplexity_report, sequence_nll
from nf4_tpu.models import configs
from nf4_tpu.models.llama import KVCache, forward, init_kv_cache, init_params


@pytest.fixture(scope="module")
def tiny_model():
    cfg = configs.TINY_TEST
    return init_params(cfg, seed=0), cfg


def _manual_nll(params, cfg, seq):
    """Reference NLL via a direct forward + numpy log-softmax."""
    T = len(seq)
    toks = jnp.asarray(np.asarray(seq, np.int32)[None, :])
    cache = init_kv_cache(cfg, 1)
    positions = jnp.arange(T, dtype=jnp.int32)[None, :]
    logits, _ = forward(
        params, cfg, toks, cache, positions, jnp.full((1,), T, jnp.int32)
    )
    lg = np.asarray(logits, np.float64)[0]
    lg = lg - lg.max(axis=-1, keepdims=True)
    logp = lg - np.log(np.exp(lg).sum(axis=-1, keepdims=True))
    return -sum(logp[t, seq[t + 1]] for t in range(T - 1))


class TestPerplexity:
    def test_matches_manual_nll(self, tiny_model):
        params, cfg = tiny_model
        seq = [3, 17, 92, 5, 44, 8, 101, 7]
        nll, ntok = sequence_nll(params, cfg, [seq])
        assert ntok == len(seq) - 1
        manual = _manual_nll(params, cfg, seq)
        np.testing.assert_allclose(nll, manual, rtol=2e-4)

    def test_batching_invariance(self, tiny_model):
        params, cfg = tiny_model
        rng = np.random.default_rng(1)
        seqs = [list(rng.integers(0, cfg.vocab_size, size=n)) for n in (5, 9, 12, 7)]
        a = perplexity(params, cfg, seqs, batch_size=1)
        b = perplexity(params, cfg, seqs, batch_size=4)
        # Batch width changes kernel tiling and bf16 accumulation order; on
        # TPU the spread is larger than on the CPU reference path.
        rtol = 5e-3 if jax.default_backend() == "tpu" else 2e-4
        np.testing.assert_allclose(a, b, rtol=rtol)

    def test_report_gate(self, tiny_model):
        params, cfg = tiny_model
        seqs = [[1, 2, 3, 4, 5, 6]]
        rep = perplexity_report(params, cfg, seqs, baseline_ppl=None)
        assert rep["perplexity"] > 0
        rep2 = perplexity_report(
            params, cfg, seqs, baseline_ppl=rep["perplexity"] + 0.05
        )
        assert rep2["within_gate"]
        rep3 = perplexity_report(
            params, cfg, seqs, baseline_ppl=rep["perplexity"] + 5.0
        )
        assert not rep3["within_gate"]

    def test_random_model_ppl_near_vocab(self, tiny_model):
        # A randomly initialized model is near-uniform: PPL ~ vocab size.
        params, cfg = tiny_model
        rng = np.random.default_rng(2)
        seqs = [list(rng.integers(0, cfg.vocab_size, size=32)) for _ in range(4)]
        ppl = perplexity(params, cfg, seqs)
        assert 0.2 * cfg.vocab_size < ppl < 5 * cfg.vocab_size


class TestEvalCLI:
    def test_cli_end_to_end(self, tiny_model, tmp_path, capsys):
        import json

        from nf4_tpu.eval.__main__ import main as eval_main
        from nf4_tpu.models.loader import save_packed

        params, cfg = tiny_model
        ckpt = str(tmp_path / "m.npz")
        save_packed(ckpt, params, cfg)
        rng = np.random.default_rng(4)
        toks = rng.integers(0, cfg.vocab_size, size=(2, 16)).astype(np.int32)
        tok_path = str(tmp_path / "t.npy")
        np.save(tok_path, toks)

        rc = eval_main(
            ["--model", "tiny-test", "--checkpoint", ckpt, "--tokens", tok_path]
        )
        report = json.loads(capsys.readouterr().out.strip())
        assert rc == 0 and report["perplexity"] > 0

        # Gate failure -> nonzero exit.
        rc2 = eval_main(
            [
                "--model", "tiny-test", "--checkpoint", ckpt,
                "--tokens", tok_path, "--baseline-ppl", "1.0",
            ]
        )
        assert rc2 == 1


class TestTokenLogprobs:
    def test_sums_match_sequence_nll(self, tiny_model):
        """token_logprobs is the per-token decomposition of sequence_nll:
        -sum over all sequences' entries == total NLL, counts match."""
        from nf4_tpu.eval.ppl import sequence_nll, token_logprobs

        params, cfg = tiny_model
        rng = np.random.default_rng(5)
        seqs = [
            rng.integers(0, cfg.vocab_size, rng.integers(2, 20)).tolist()
            for _ in range(7)
        ] + [[4]]  # length-1: no predictions
        lps = token_logprobs(params, cfg, seqs, batch_size=3)
        nll, ntok = sequence_nll(params, cfg, seqs, batch_size=3)
        assert lps[-1] == []
        assert [len(l) for l in lps[:-1]] == [len(s) - 1 for s in seqs[:-1]]
        assert sum(len(l) for l in lps) == ntok
        np.testing.assert_allclose(
            -sum(v for l in lps for v in l), nll, rtol=1e-5
        )
