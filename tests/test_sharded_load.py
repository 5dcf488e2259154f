"""Shard-on-read checkpoint loading (load_packed_sharded).

The multi-host / large-model loading path: every leaf materializes directly
under its tensor-parallel sharding via jax.make_array_from_callback, and the
checkpoint file is read in per-shard slices (safetensors get_slice) instead
of whole tensors.  The reference has no checkpoint system at all (SURVEY.md
§5) — this subsystem exists for BASELINE's Llama-3-70B multi-host config,
where eager loading would need the full ~37 GB artifact per host.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding

from nf4_tpu.models.configs import TINY_TP
from nf4_tpu.models.llama import init_params, prefill
from nf4_tpu.models.loader import (
    load_packed_auto,
    load_packed_sharded,
    save_packed,
)
from nf4_tpu.parallel.mesh import make_mesh
from nf4_tpu.parallel.tp import localize_params, param_specs, tp_prefill

TP = 4


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    return make_mesh(tp=TP, dp=2)


@pytest.fixture(scope="module", params=["safetensors", "npz"])
def ckpt(request, tmp_path_factory):
    params = init_params(TINY_TP, seed=0)
    path = str(
        tmp_path_factory.mktemp("sharded") / f"tiny_tp.{request.param}"
    )
    save_packed(path, params, TINY_TP)
    return path, params


class TestShardedLoad:
    def test_leaves_match_eager_load(self, mesh, ckpt):
        path, _ = ckpt
        sharded, cfg_s = load_packed_sharded(path, mesh)
        eager, cfg_e = load_packed_auto(path)
        assert cfg_s == cfg_e
        s_leaves = jax.tree_util.tree_leaves_with_path(sharded)
        e_leaves = jax.tree_util.tree_leaves_with_path(eager)
        assert len(s_leaves) == len(e_leaves)
        for (kp, a), (_, b) in zip(s_leaves, e_leaves):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b), err_msg=str(kp)
            )

    def test_shardings_match_param_specs(self, mesh, ckpt):
        path, _ = ckpt
        sharded, cfg = load_packed_sharded(path, mesh)
        specs = param_specs(sharded, "tp", cfg.moe_shard)

        def check(leaf, spec):
            assert leaf.sharding == NamedSharding(mesh, spec)

        jax.tree.map(check, sharded, specs)

    def test_reads_are_per_shard_slices(self, mesh, ckpt):
        """tp-sharded tensors are read in 1/TP slices; replicated tensors
        exactly once (the memo collapses the per-device callbacks)."""
        path, _ = ckpt
        stats = {}
        load_packed_sharded(path, mesh, read_stats=stats)
        full_lanes = None
        idxs = stats["layers.wqkv.packed"]
        assert len(idxs) == TP  # 4 distinct lane slices, dp replicas memoized
        for idx in idxs:
            lane = idx[-1]
            if full_lanes is None:
                full_lanes = TP * (lane.stop - (lane.start or 0))
            assert (lane.stop - (lane.start or 0)) == full_lanes // TP
        assert len(stats["embed"]) == 1
        assert len(stats["layers.input_norm"]) == 1
        # Row-parallel weight: K (sublane) dim sliced instead.
        widx = stats["layers.wo.packed"]
        assert len(widx) == TP
        assert all(i[-1] == slice(None, None, None) for i in widx)

    def test_tp_mismatch_rejected(self, mesh, tmp_path):
        import dataclasses

        cfg1 = dataclasses.replace(TINY_TP, tp_shards=1)
        path = str(tmp_path / "tp1.safetensors")
        save_packed(path, init_params(cfg1, seed=0), cfg1)
        with pytest.raises(ValueError, match="tp_shards"):
            load_packed_sharded(path, mesh)

    def test_forward_matches_single_device(self, mesh, ckpt):
        path, params = ckpt
        sharded, cfg = load_packed_sharded(path, mesh)
        tokens = (
            jnp.arange(12, dtype=jnp.int32).reshape(2, 6) % cfg.vocab_size
        )
        ref_logits, _ = prefill(params, TINY_TP, tokens)
        logits, _ = tp_prefill(localize_params(sharded, TP), cfg, mesh, tokens)
        np.testing.assert_allclose(
            np.asarray(logits, np.float32),
            np.asarray(ref_logits, np.float32),
            atol=2e-2,
        )

    def test_overrides_apply(self, mesh, ckpt):
        path, _ = ckpt
        _, cfg = load_packed_sharded(path, mesh, kv_quant=True, max_seq_len=16)
        assert cfg.kv_quant and cfg.max_seq_len == 16


class TestServeCLISharded:
    def test_cli_tp_serves_matching_pack(self, mesh, ckpt):
        """--packed (tp-packed) --tp/--dp: shard-on-read into the engine;
        completions token-identical to a single-device engine."""
        del mesh  # guards device count
        import json
        import urllib.request

        from nf4_tpu.serve.__main__ import main
        from nf4_tpu.serve.engine import Engine

        path, params = ckpt
        if path.endswith(".npz"):
            pytest.skip("one CLI round-trip suffices")
        server = main(
            ["--packed", path, "--tp", str(TP), "--dp", "2",
             "--port", "0", "--batch-size", "2", "--eos", "-1"],
            block=False,
        )
        try:
            prompt = [3, 1, 4, 1, 5]
            req = urllib.request.Request(
                f"http://127.0.0.1:{server.port}/v1/completions",
                data=json.dumps(
                    {"model": "m", "prompt": prompt, "max_tokens": 5}
                ).encode(),
                headers={"Content-Type": "application/json"},
                method="POST",
            )
            with urllib.request.urlopen(req, timeout=300) as resp:
                body = json.loads(resp.read())
        finally:
            server.stop()
        twin = Engine(params, TINY_TP, batch_size=2, eos_token=-1)
        expected = twin.generate([prompt], max_new_tokens=5)[0].tokens
        assert body["choices"][0]["tokens"] == list(expected)

    def test_cli_tp_repacks_mismatched_pack(self, mesh, tmp_path):
        """--packed (tp_shards=1) --tp 4: falls back to eager load +
        repack_tp and still serves."""
        del mesh
        import dataclasses
        import json
        import urllib.request

        from nf4_tpu.serve.__main__ import main

        cfg1 = dataclasses.replace(TINY_TP, tp_shards=1)
        path = str(tmp_path / "tp1.safetensors")
        save_packed(path, init_params(cfg1, seed=0), cfg1)
        server = main(
            ["--packed", path, "--tp", str(TP),
             "--port", "0", "--batch-size", "2", "--eos", "-1"],
            block=False,
        )
        try:
            with urllib.request.urlopen(
                f"http://127.0.0.1:{server.port}/health", timeout=30
            ) as r:
                assert json.loads(r.read())["status"] == "ok"
        finally:
            server.stop()
