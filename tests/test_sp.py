"""Sequence-parallel (ring-attention) prefill on the virtual CPU mesh.

The ring (parallel/sp.py) must reproduce the single-device prefill: K/V
cache bits IDENTICALLY (each shard computes its own K/V with no cross-shard
math), logits to fp32-rounding (the streaming softmax associates over ring
steps instead of KV chunks), and greedy next tokens exactly.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from nf4_tpu.models.configs import TINY_GEMMA2, TINY_TEST
from nf4_tpu.models.llama import (
    decode_step,
    init_params,
    prefill_chunked,
)
from nf4_tpu.parallel.sp import sp_prefill

N_SP = 4
B, S = 2, 32


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < N_SP:
        pytest.skip(f"needs {N_SP} devices")
    return Mesh(np.array(jax.devices()[:N_SP]), ("sp",))


@pytest.fixture(scope="module")
def tokens():
    rng = np.random.default_rng(7)
    return jnp.asarray(
        rng.integers(0, TINY_TEST.vocab_size, size=(B, S)), dtype=jnp.int32
    )


def _compare(cfg, mesh, tokens, logit_tol=2e-2, cache_tol=5e-2):
    params = init_params(cfg, seed=0)
    want_logits, want_cache = prefill_chunked(params, cfg, tokens)
    got_logits, got_cache, seq_lens = sp_prefill(
        params, cfg, tokens, mesh, axis="sp"
    )
    assert np.all(np.asarray(seq_lens) == S)

    # Layer 0's K/V see the exact same inputs (the embedding), so its cache
    # slots must match BIT for bit — this pins the ring's K/V production and
    # local-slot scatter.  Deeper layers inherit the attention path's
    # fp32-rounding differences (ring-step vs KV-chunk association), so they
    # get a bf16-level tolerance.
    np.testing.assert_array_equal(
        np.asarray(got_cache.k[0, :, :, :S]), np.asarray(want_cache.k[0, :, :, :S])
    )
    np.testing.assert_array_equal(
        np.asarray(got_cache.v[0, :, :, :S]), np.asarray(want_cache.v[0, :, :, :S])
    )
    if cfg.kv_quant:
        np.testing.assert_array_equal(
            np.asarray(got_cache.k_scale[0, :, :, :S]),
            np.asarray(want_cache.k_scale[0, :, :, :S]),
        )
    if not cfg.kv_quant:  # int8 codes flip at bin edges on rounding diffs
        np.testing.assert_allclose(
            np.asarray(got_cache.k[:, :, :, :S], np.float32),
            np.asarray(want_cache.k[:, :, :, :S], np.float32),
            rtol=cache_tol, atol=cache_tol,
        )
        np.testing.assert_allclose(
            np.asarray(got_cache.v[:, :, :, :S], np.float32),
            np.asarray(want_cache.v[:, :, :, :S], np.float32),
            rtol=cache_tol, atol=cache_tol,
        )

    g, w = np.asarray(got_logits), np.asarray(want_logits)
    np.testing.assert_allclose(
        g, w, rtol=logit_tol, atol=logit_tol * np.abs(w).max()
    )
    # The hard gate: the greedy continuation token is identical.
    np.testing.assert_array_equal(g.argmax(-1), w.argmax(-1))
    return params, got_cache, want_cache


class TestSpPrefill:
    def test_matches_single_device(self, mesh, tokens):
        _compare(TINY_TEST, mesh, tokens)

    def test_kv_quant(self, mesh, tokens):
        cfg = dataclasses.replace(TINY_TEST, kv_quant=True)
        _compare(cfg, mesh, tokens)

    def test_sliding_window(self, mesh, tokens):
        cfg = dataclasses.replace(TINY_TEST, sliding_window=8)
        _compare(cfg, mesh, tokens)

    def test_gemma2_softcap_alternating_windows(self, mesh, tokens):
        # Gemma-2's 4 layers of (1+w)-norm gains amplify the attention
        # path's rounding drift (measured: K diff grows 0 -> 0.05 -> 0.12
        # -> 0.21 per layer; logits 2.7% of scale, argmax identical).
        cfg = TINY_GEMMA2
        toks = tokens % cfg.vocab_size
        _compare(cfg, mesh, toks, logit_tol=5e-2, cache_tol=3e-1)

    def test_decode_continues_from_sp_cache(self, mesh, tokens):
        """Greedy decode from the SP-built cache matches decode from the
        single-device cache — the engine-handoff contract."""
        params, got_cache, want_cache = _compare(TINY_TEST, mesh, tokens)
        cfg = TINY_TEST
        tok = jnp.asarray([5, 9], dtype=jnp.int32)
        pos = jnp.full((B,), S, dtype=jnp.int32)
        cache_g, cache_w = got_cache, want_cache
        tg, tw = tok, tok
        for _ in range(4):
            lg, cache_g = decode_step(params, cfg, tg, cache_g, pos)
            lw, cache_w = decode_step(params, cfg, tw, cache_w, pos)
            tg = jnp.argmax(lg, axis=-1).astype(jnp.int32)
            tw = jnp.argmax(lw, axis=-1).astype(jnp.int32)
            np.testing.assert_array_equal(np.asarray(tg), np.asarray(tw))
            pos = pos + 1

    def test_rejects_indivisible_length(self, mesh):
        toks = jnp.zeros((1, 30), dtype=jnp.int32)  # 30 % 4 != 0
        with pytest.raises(AssertionError, match="divide"):
            sp_prefill(init_params(TINY_TEST, seed=0), TINY_TEST, toks, mesh)

    def test_right_padded_rows(self, mesh, tokens):
        """Per-row seq_lens: a right-padded batch attends only to real
        tokens and returns each row's logits at position len-1 — matching
        the single-device engine prefill convention, including lengths
        whose last token lands on an interior sequence shard."""
        cfg = TINY_TEST
        params = init_params(cfg, seed=0)
        # Row 0 full; row 1's last token sits inside shard 1 of 4.
        lens = jnp.asarray([S, S // 2 - 3], dtype=jnp.int32)
        toks = np.asarray(tokens).copy()
        toks[1, int(lens[1]):] = 0  # pad tokens must not influence output
        toks = jnp.asarray(toks)

        from nf4_tpu.models.llama import forward, init_kv_cache

        positions = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (B, S))
        want_logits, _ = forward(
            params, cfg, toks, init_kv_cache(cfg, B), positions, lens,
            last_only=True,
        )
        got_logits, _, out_lens = sp_prefill(
            params, cfg, toks, mesh, axis="sp", seq_lens=lens
        )
        np.testing.assert_array_equal(np.asarray(out_lens), np.asarray(lens))
        g, w = np.asarray(got_logits), np.asarray(want_logits)
        np.testing.assert_allclose(g, w, rtol=2e-2, atol=2e-2 * np.abs(w).max())
        np.testing.assert_array_equal(g.argmax(-1), w.argmax(-1))
        # Pad-token independence: different pad content, identical logits.
        toks2 = np.asarray(toks).copy()
        toks2[1, int(lens[1]):] = 7
        got2, _, _ = sp_prefill(
            params, cfg, jnp.asarray(toks2), mesh, axis="sp", seq_lens=lens
        )
        np.testing.assert_array_equal(np.asarray(got2), g)
