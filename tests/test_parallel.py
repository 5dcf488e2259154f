"""Tensor-parallel tests on the virtual 8-device CPU mesh.

The TP mapping (column/row-parallel packed weights + psum) must reproduce
the single-device forward bit-for-bit up to reduction order.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nf4_tpu.models.llama import LlamaConfig, init_params, prefill, init_kv_cache, decode_step
from nf4_tpu.parallel.mesh import make_mesh
from nf4_tpu.parallel.tp import (
    init_sharded_kv_cache,
    localize_params,
    shard_params,
    tp_decode_step,
    tp_local_config,
    tp_prefill,
)

TP = 4

# Dims chosen so every shard respects the 128-lane tile: q_dim=1024,
# kv_dim=512, intermediate=512 (col shards of 256/128/128 lanes at tp=4).
TP_CFG = LlamaConfig(
    vocab_size=256,
    hidden_size=256,
    intermediate_size=512,
    num_layers=2,
    num_heads=8,
    num_kv_heads=4,
    head_dim=128,
    max_seq_len=32,
    tp_shards=TP,
)


@pytest.fixture(scope="module")
def setup():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = make_mesh(tp=TP, dp=2)
    params = init_params(TP_CFG, seed=0)
    return mesh, params


class TestTPConfig:
    def test_local_config(self):
        local = tp_local_config(TP_CFG, TP)
        assert local.num_heads == 2 and local.num_kv_heads == 1
        assert local.intermediate_size == 128
        assert local.tp_shards == 1

    def test_rejects_indivisible_heads(self):
        with pytest.raises(AssertionError):
            tp_local_config(dataclasses.replace(TP_CFG, num_kv_heads=3), TP)


class TestTPForward:
    def test_prefill_matches_single_device(self, setup):
        mesh, params = setup
        tokens = jnp.arange(12, dtype=jnp.int32).reshape(2, 6) % TP_CFG.vocab_size

        ref_logits, ref_cache = prefill(params, TP_CFG, tokens)

        sharded, _ = shard_params(localize_params(params, TP), mesh)
        tp_logits, tp_cache = tp_prefill(sharded, TP_CFG, mesh, tokens)

        assert tp_logits.shape == ref_logits.shape
        np.testing.assert_allclose(
            np.asarray(tp_logits, np.float32),
            np.asarray(ref_logits, np.float32),
            rtol=2e-2,
            atol=2e-2,
        )
        np.testing.assert_allclose(
            np.asarray(tp_cache.k, np.float32),
            np.asarray(ref_cache.k, np.float32),
            rtol=2e-2,
            atol=2e-2,
        )

    def test_decode_matches_single_device(self, setup):
        mesh, params = setup
        rng = np.random.default_rng(0)
        seq = jnp.asarray(
            rng.integers(0, TP_CFG.vocab_size, size=(2, 4)), dtype=jnp.int32
        )

        _, ref_cache = prefill(params, TP_CFG, seq)
        _, tp_cache = tp_prefill(
            shard_params(localize_params(params, TP), mesh)[0], TP_CFG, mesh, seq
        )

        sharded = shard_params(localize_params(params, TP), mesh)[0]
        tok = jnp.asarray([5, 9], dtype=jnp.int32)
        pos = jnp.asarray([4, 4], dtype=jnp.int32)

        ref_logits, _ = decode_step(params, TP_CFG, tok, ref_cache, pos)
        tp_logits, _ = tp_decode_step(sharded, TP_CFG, mesh, tok, tp_cache, pos)

        np.testing.assert_allclose(
            np.asarray(tp_logits, np.float32),
            np.asarray(ref_logits, np.float32),
            rtol=2e-2,
            atol=2e-2,
        )
        # Greedy decisions must agree.
        np.testing.assert_array_equal(
            np.argmax(np.asarray(tp_logits, np.float32), -1),
            np.argmax(np.asarray(ref_logits, np.float32), -1),
        )

    def test_weights_actually_sharded(self, setup):
        mesh, params = setup
        sharded, _ = shard_params(localize_params(params, TP), mesh)
        wq_packed = sharded.layers.wqkv.packed
        # Each device holds 1/TP of the lane dim.
        shard_shapes = {
            s.data.shape for s in wq_packed.addressable_shards
        }
        full = wq_packed.shape
        assert shard_shapes == {(full[0], full[1], full[2] // TP)}

    def test_jit_tp_prefill(self, setup):
        """The whole sharded forward must be jittable end-to-end."""
        import functools

        mesh, params = setup
        sharded, _ = shard_params(localize_params(params, TP), mesh)
        tokens = jnp.arange(8, dtype=jnp.int32).reshape(2, 4)

        cache = init_sharded_kv_cache(TP_CFG, 2, mesh)
        positions = jnp.broadcast_to(jnp.arange(4, dtype=jnp.int32), (2, 4))
        seq_lens = jnp.full((2,), 4, dtype=jnp.int32)

        from nf4_tpu.parallel.tp import tp_forward

        jitted = jax.jit(
            functools.partial(tp_forward, cfg=TP_CFG, mesh=mesh)
        )
        logits, _ = jitted(
            sharded, tokens=tokens, cache=cache, positions=positions, seq_lens=seq_lens
        )
        ref, _ = prefill(params, TP_CFG, tokens)
        np.testing.assert_allclose(
            np.asarray(logits, np.float32),
            np.asarray(ref, np.float32),
            rtol=2e-2,
            atol=2e-2,
        )


class TestTPInt8:
    def test_int8_tp_matches_single_chip(self, setup):
        """TP forward over int8-recoded weights matches the single-chip int8
        forward (the production serving configuration)."""
        from nf4_tpu.models.llama import recode_params_int8

        mesh, params = setup
        p8 = recode_params_int8(params)
        sharded, _ = shard_params(localize_params(p8, TP), mesh)

        tokens = jnp.arange(8, dtype=jnp.int32).reshape(2, 4) % TP_CFG.vocab_size
        ref, _ = prefill(p8, TP_CFG, tokens)
        tp_logits, _ = tp_prefill(sharded, TP_CFG, mesh, tokens)
        np.testing.assert_allclose(
            np.asarray(tp_logits, np.float32),
            np.asarray(ref, np.float32),
            rtol=2e-2,
            atol=2e-2,
        )


class TestTPCheckpointRoundTrip:
    def test_save_load_localize_forward(self, setup, tmp_path):
        """A tp_shards>1 checkpoint must round-trip through save_packed /
        load_packed and still shard + forward (VERDICT r1: load_packed used
        to drop the ``shards`` field, breaking localize_params)."""
        from nf4_tpu.models.loader import load_packed, save_packed

        mesh, params = setup
        path = str(tmp_path / "tp_ckpt.npz")
        save_packed(path, params, TP_CFG)
        reloaded = load_packed(path, TP_CFG)

        # shards metadata must survive the round trip on row-parallel weights.
        assert reloaded.layers.wo.shards == TP
        assert reloaded.layers.w_down.shards == TP

        tokens = jnp.arange(8, dtype=jnp.int32).reshape(2, 4) % TP_CFG.vocab_size
        ref, _ = prefill(params, TP_CFG, tokens)
        sharded, _ = shard_params(localize_params(reloaded, TP), mesh)
        tp_logits, _ = tp_prefill(sharded, TP_CFG, mesh, tokens)
        np.testing.assert_allclose(
            np.asarray(tp_logits, np.float32),
            np.asarray(ref, np.float32),
            rtol=2e-2,
            atol=2e-2,
        )


class TestTPKVQuant:
    def test_kv_quant_tp_prefill(self, setup):
        """TP forward with the int8 KV cache matches single-chip."""
        mesh, _ = setup
        cfg = dataclasses.replace(TP_CFG, kv_quant=True)
        params = init_params(cfg, seed=0)
        sharded, _ = shard_params(localize_params(params, TP), mesh)
        tokens = jnp.arange(8, dtype=jnp.int32).reshape(2, 4) % cfg.vocab_size
        ref, _ = prefill(params, cfg, tokens)
        tp_logits, tp_cache = tp_prefill(sharded, cfg, mesh, tokens)
        assert tp_cache.k.dtype == jnp.int8
        np.testing.assert_allclose(
            np.asarray(tp_logits, np.float32),
            np.asarray(ref, np.float32),
            rtol=3e-2,
            atol=3e-2,
        )


class TestRepackTP:
    """repack_tp must bit-match quantizing with tp_shards=N directly."""

    def test_repack_bitmatch_quantize(self):
        from nf4_tpu.parallel.tp import repack_tp

        cfg1 = dataclasses.replace(TP_CFG, tp_shards=1)
        p1 = init_params(cfg1, seed=0)  # same dense draws as tp_shards=4
        pN = init_params(TP_CFG, seed=0)

        got, got_cfg = repack_tp(p1, cfg1, TP)
        assert got_cfg.tp_shards == TP

        def check(a, b, name):
            la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
            assert len(la) == len(lb)
            for x, y in zip(la, lb):
                assert np.array_equal(np.asarray(x), np.asarray(y)), name

        check(got.layers.wqkv, pN.layers.wqkv, "wqkv")
        check(got.layers.w_gateup, pN.layers.w_gateup, "w_gateup")
        check(got.layers.wo, pN.layers.wo, "wo")
        check(got.layers.w_down, pN.layers.w_down, "w_down")
        for w in ("wqkv", "wo"):
            pw = getattr(got.layers, w)
            ref = getattr(pN.layers, w)
            assert pw.shards == ref.shards and pw.padded_shape == ref.padded_shape

    def test_repack_roundtrip_identity(self):
        from nf4_tpu.parallel.tp import repack_tp

        cfg1 = dataclasses.replace(TP_CFG, tp_shards=1)
        p1 = init_params(cfg1, seed=1)
        pN, cfgN = repack_tp(p1, cfg1, TP)
        back, cfg_back = repack_tp(pN, cfgN, 1)
        assert cfg_back.tp_shards == 1
        for x, y in zip(jax.tree.leaves(back), jax.tree.leaves(p1)):
            assert np.array_equal(np.asarray(x), np.asarray(y))

    def test_repacked_tp_forward_matches(self, setup):
        """Serve a tp_shards=1 checkpoint at tp=4 after repack: the TP
        forward must match the single-device forward of the original."""
        from nf4_tpu.parallel.tp import repack_tp

        mesh, _ = setup
        cfg1 = dataclasses.replace(TP_CFG, tp_shards=1)
        p1 = init_params(cfg1, seed=2)
        pN, cfgN = repack_tp(p1, cfg1, TP)

        tokens = jnp.asarray([[3, 5, 7, 9], [2, 4, 6, 8]], jnp.int32)
        want, _ = prefill(p1, cfg1, tokens)

        sharded, _ = shard_params(localize_params(pN, TP), mesh)
        got, _ = tp_prefill(sharded, cfgN, mesh, tokens)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            rtol=2e-2, atol=2e-2 * np.abs(np.asarray(want, np.float32)).max(),
        )


class TestCollectiveMatmul:
    """NF4TPU_COLLECTIVE_MATMUL=N decomposes row-parallel psums into
    per-output-chunk partial psums (compute/comm overlap structure); the
    result must be BIT-IDENTICAL to the single-psum path."""

    def test_chunked_psum_bit_identical(self, setup, monkeypatch):
        mesh, params = setup
        tokens = jnp.asarray([[3, 5, 7, 9], [2, 4, 6, 8]], jnp.int32)

        sharded, _ = shard_params(localize_params(params, TP), mesh)
        want, want_cache = tp_prefill(sharded, TP_CFG, mesh, tokens)

        monkeypatch.setenv("NF4TPU_COLLECTIVE_MATMUL", "4")
        got, got_cache = tp_prefill(sharded, TP_CFG, mesh, tokens)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        np.testing.assert_array_equal(
            np.asarray(got_cache.k), np.asarray(want_cache.k)
        )

    def test_single_device_unaffected(self, monkeypatch):
        cfg = dataclasses.replace(TP_CFG, tp_shards=1)
        params = init_params(cfg, seed=0)
        tokens = jnp.asarray([[3, 5, 7, 9]], jnp.int32)
        want, _ = prefill(params, cfg, tokens)
        monkeypatch.setenv("NF4TPU_COLLECTIVE_MATMUL", "2")
        got, _ = prefill(params, cfg, tokens)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_bad_flag_rejected(self, monkeypatch):
        from nf4_tpu.utils import env

        monkeypatch.setenv("NF4TPU_COLLECTIVE_MATMUL", "banana")
        with pytest.raises(ValueError):
            env.collective_chunks()
        monkeypatch.setenv("NF4TPU_COLLECTIVE_MATMUL", "-1")
        with pytest.raises(ValueError):
            env.collective_chunks()


class TestMoETP:
    """MoE (Mixtral-style) models under tensor parallelism: each expert's
    gate/up columns and down K-chunks shard exactly like the dense MLP
    (models.llama._moe_mlp), the router is replicated, and the psum happens
    once on the accumulated expert sum."""

    MOE_CFG = dataclasses.replace(
        TP_CFG, num_experts=4, experts_per_token=2
    )

    @pytest.fixture(scope="class")
    def moe_setup(self):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 devices")
        mesh = make_mesh(tp=TP, dp=2)
        params = init_params(self.MOE_CFG, seed=3)
        return mesh, params

    def test_prefill_matches_single_device(self, moe_setup):
        mesh, params = moe_setup
        cfg = self.MOE_CFG
        tokens = jnp.arange(12, dtype=jnp.int32).reshape(2, 6) % cfg.vocab_size

        ref_logits, _ = prefill(params, cfg, tokens)
        sharded, _ = shard_params(localize_params(params, TP), mesh)
        tp_logits, _ = tp_prefill(sharded, cfg, mesh, tokens)

        np.testing.assert_allclose(
            np.asarray(tp_logits, np.float32),
            np.asarray(ref_logits, np.float32),
            rtol=2e-2,
            atol=2e-2,
        )
        np.testing.assert_array_equal(
            np.argmax(np.asarray(tp_logits, np.float32), -1),
            np.argmax(np.asarray(ref_logits, np.float32), -1),
        )

    def test_decode_matches_single_device(self, moe_setup):
        mesh, params = moe_setup
        cfg = self.MOE_CFG
        seq = jnp.asarray([[3, 5, 7, 9], [2, 4, 6, 8]], jnp.int32)

        _, ref_cache = prefill(params, cfg, seq)
        sharded, _ = shard_params(localize_params(params, TP), mesh)
        _, tp_cache = tp_prefill(sharded, cfg, mesh, seq)

        tok = jnp.asarray([5, 9], dtype=jnp.int32)
        pos = jnp.asarray([4, 4], dtype=jnp.int32)
        ref_logits, _ = decode_step(params, cfg, tok, ref_cache, pos)
        tp_logits, _ = tp_decode_step(sharded, cfg, mesh, tok, tp_cache, pos)

        np.testing.assert_array_equal(
            np.argmax(np.asarray(tp_logits, np.float32), -1),
            np.argmax(np.asarray(ref_logits, np.float32), -1),
        )

    def test_expert_weights_sharded_on_lanes(self, moe_setup):
        mesh, params = moe_setup
        sharded, _ = shard_params(localize_params(params, TP), mesh)
        gu = sharded.layers.w_gateup.packed  # [L, E, rows, lanes]
        assert gu.ndim == 4
        shard_shapes = {s.data.shape for s in gu.addressable_shards}
        full = gu.shape
        assert shard_shapes == {(full[0], full[1], full[2], full[3] // TP)}
        dn = sharded.layers.w_down.packed
        shard_shapes = {s.data.shape for s in dn.addressable_shards}
        full = dn.shape
        assert shard_shapes == {(full[0], full[1], full[2] // TP, full[3])}
        router = sharded.layers.router
        assert {s.data.shape for s in router.addressable_shards} == {router.shape}

    def test_repack_tp_moe(self, moe_setup):
        """A tp_shards=1 MoE checkpoint repacked to tp=TP bit-matches
        quantizing with tp_shards=TP, through the TP forward."""
        from nf4_tpu.parallel.tp import repack_tp

        mesh, params_tp = moe_setup
        cfg = self.MOE_CFG
        cfg1 = dataclasses.replace(cfg, tp_shards=1)
        params1 = init_params(cfg1, seed=3)  # same seed = same dense draws
        reparams, recfg = repack_tp(params1, cfg1, TP)
        assert recfg.tp_shards == TP

        np.testing.assert_array_equal(
            np.asarray(reparams.layers.w_gateup.packed),
            np.asarray(params_tp.layers.w_gateup.packed),
        )
        np.testing.assert_array_equal(
            np.asarray(reparams.layers.w_down.packed),
            np.asarray(params_tp.layers.w_down.packed),
        )
        np.testing.assert_array_equal(
            np.asarray(reparams.layers.w_down.scales),
            np.asarray(params_tp.layers.w_down.scales),
        )

        tokens = jnp.asarray([[3, 5, 7, 9], [2, 4, 6, 8]], jnp.int32)
        sharded, _ = shard_params(localize_params(reparams, TP), mesh)
        want, _ = tp_prefill(
            shard_params(localize_params(params_tp, TP), mesh)[0],
            cfg, mesh, tokens,
        )
        got, _ = tp_prefill(sharded, recfg, mesh, tokens)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


class TestMoEEP:
    """moe_shard="expert": the EXPERT axis shards over tp — each device
    scans num_experts/tp FULL-WIDTH local experts masked by global expert
    id (ep_axis offset), router replicated.  Covers the E_loc == 1 edge
    (tp == num_experts), where the dense-vs-MoE branch must key on the
    router's presence, not the local expert count."""

    EP_CFG = dataclasses.replace(
        TP_CFG, num_experts=TP, experts_per_token=2, moe_shard="expert"
    )

    @pytest.fixture(scope="class")
    def ep_setup(self):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 devices")
        mesh = make_mesh(tp=TP, dp=2)
        params = init_params(self.EP_CFG, seed=5)
        return mesh, params

    def _shard(self, params, mesh):
        return shard_params(
            localize_params(params, TP, "expert"), mesh, moe_shard="expert"
        )[0]

    def test_prefill_decode_match_single_device(self, ep_setup):
        mesh, params = ep_setup
        cfg = self.EP_CFG
        tokens = jnp.asarray([[3, 5, 7, 9], [2, 4, 6, 8]], jnp.int32)

        ref_logits, ref_cache = prefill(params, cfg, tokens)
        sharded = self._shard(params, mesh)
        tp_logits, tp_cache = tp_prefill(sharded, cfg, mesh, tokens)
        np.testing.assert_allclose(
            np.asarray(tp_logits, np.float32),
            np.asarray(ref_logits, np.float32),
            rtol=2e-2,
            atol=2e-2,
        )
        tok = jnp.asarray([5, 9], jnp.int32)
        pos = jnp.asarray([4, 4], jnp.int32)
        rl, _ = decode_step(params, cfg, tok, ref_cache, pos)
        tl, _ = tp_decode_step(sharded, cfg, mesh, tok, tp_cache, pos)
        np.testing.assert_array_equal(
            np.argmax(np.asarray(tl, np.float32), -1),
            np.argmax(np.asarray(rl, np.float32), -1),
        )

    def test_experts_sharded_full_width(self, ep_setup):
        mesh, params = ep_setup
        sharded = self._shard(params, mesh)
        gu = sharded.layers.w_gateup.packed  # [L, E, rows, lanes]
        shapes = {s.data.shape for s in gu.addressable_shards}
        assert shapes == {(gu.shape[0], gu.shape[1] // TP, gu.shape[2], gu.shape[3])}
        dn = sharded.layers.w_down.packed
        shapes = {s.data.shape for s in dn.addressable_shards}
        assert shapes == {(dn.shape[0], dn.shape[1] // TP, dn.shape[2], dn.shape[3])}

    def test_engine_ep_generate(self, ep_setup):
        """Engine over the dp x tp mesh with two local experts per device
        (num_experts = 2 * tp) is token-identical to single device."""
        from nf4_tpu.serve.engine import Engine

        mesh, _ = ep_setup
        cfg = dataclasses.replace(self.EP_CFG, num_experts=2 * TP)
        params = init_params(cfg, seed=6)
        prompts = [[3, 5, 7], [11, 13]]
        want = [
            r.tokens
            for r in Engine(params, cfg, batch_size=2, eos_token=-1).generate(
                prompts, max_new_tokens=4
            )
        ]
        got = [
            r.tokens
            for r in Engine(
                params, cfg, batch_size=2, eos_token=-1, mesh=mesh
            ).generate(prompts, max_new_tokens=4)
        ]
        assert got == want

    def test_indivisible_experts_rejected(self):
        cfg = dataclasses.replace(self.EP_CFG, num_experts=3)
        with pytest.raises(AssertionError):
            tp_local_config(cfg, TP)

    def test_repack_tp_leaves_experts_alone(self, ep_setup):
        from nf4_tpu.parallel.tp import repack_tp

        _, params = ep_setup
        cfg1 = dataclasses.replace(self.EP_CFG, tp_shards=1)
        params1 = init_params(cfg1, seed=5)
        reparams, recfg = repack_tp(params1, cfg1, TP)
        assert recfg.tp_shards == TP
        # Expert weights are tp-independent in expert mode: byte-identical.
        np.testing.assert_array_equal(
            np.asarray(reparams.layers.w_gateup.packed),
            np.asarray(params.layers.w_gateup.packed),
        )
        np.testing.assert_array_equal(
            np.asarray(reparams.layers.wqkv.packed),
            np.asarray(params.layers.wqkv.packed),
        )
