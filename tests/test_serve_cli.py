"""Serving CLI (python -m nf4_tpu.serve) + self-describing packed checkpoints.

The reference package has no server or checkpoint artifacts at all; these
pin the operational path a deployment actually uses: quantize offline ->
packed file -> `python -m nf4_tpu.serve --packed ...` -> OpenAI-compatible
HTTP responses, with the architecture config riding the artifact itself.
"""

import dataclasses
import json
import urllib.request

import numpy as np
import pytest

from nf4_tpu.models import configs
from nf4_tpu.models.llama import init_params
from nf4_tpu.models.loader import (
    config_from_dict,
    config_to_dict,
    load_packed_auto,
    save_packed,
)
from nf4_tpu.serve.engine import Engine


class TestConfigRoundTrip:
    def test_all_fields_survive_json(self):
        import jax.numpy as jnp

        cfg = dataclasses.replace(
            configs.TINY_TEST,
            rope_scaling=("llama3", 8.0, 1.0, 4.0, 8192),
            sliding_window=256,
            attn_bias=True,
            quant_type="fp4",
            kv_quant=True,
            dtype=jnp.float32,
        )
        back = config_from_dict(json.loads(json.dumps(config_to_dict(cfg))))
        assert back == cfg  # frozen dataclass equality covers every field

    def test_nested_longrope_tuples(self):
        cfg = dataclasses.replace(
            configs.TINY_TEST,
            rope_scaling=("longrope", (1.0, 2.0), (3.0, 4.0), 4096, 1.19),
        )
        back = config_from_dict(json.loads(json.dumps(config_to_dict(cfg))))
        assert back.rope_scaling == cfg.rope_scaling
        assert isinstance(back.rope_scaling[1], tuple)

    def test_runtime_ep_axis_dropped(self):
        cfg = dataclasses.replace(configs.TINY_TEST, ep_axis="tp")
        d = config_to_dict(cfg)
        assert "ep_axis" not in d
        assert config_from_dict(d).ep_axis is None

    def test_unknown_future_field_ignored(self):
        d = config_to_dict(configs.TINY_TEST)
        d["some_future_knob"] = 7
        assert config_from_dict(d) == configs.TINY_TEST


class TestLoadPackedAuto:
    @pytest.mark.parametrize("ext", ["npz", "safetensors"])
    def test_round_trip_without_config(self, tmp_path, ext):
        cfg = configs.TINY_TEST
        params = init_params(cfg, seed=0)
        path = str(tmp_path / f"ckpt.{ext}")
        save_packed(path, params, cfg)
        params2, cfg2 = load_packed_auto(path)
        assert cfg2 == cfg
        np.testing.assert_array_equal(
            np.asarray(params.layers.wqkv.packed),
            np.asarray(params2.layers.wqkv.packed),
        )

    def test_overrides_apply(self, tmp_path):
        cfg = configs.TINY_TEST
        save_packed(str(tmp_path / "c.npz"), init_params(cfg, seed=0), cfg)
        _, cfg2 = load_packed_auto(
            str(tmp_path / "c.npz"), kv_quant=True, max_seq_len=96
        )
        assert cfg2.kv_quant and cfg2.max_seq_len == 96

    def test_pre_config_checkpoint_rejected(self, tmp_path):
        cfg = configs.TINY_TEST
        path = str(tmp_path / "old.npz")
        save_packed(path, init_params(cfg, seed=0), cfg)
        # Strip the embedded config to simulate a round-3 artifact.
        with np.load(path, allow_pickle=False) as data:
            arrays = {k: data[k] for k in data.files}
        meta = json.loads(bytes(arrays["__meta__"]).decode())
        del meta["config"]
        arrays["__meta__"] = np.frombuffer(
            json.dumps(meta).encode(), dtype=np.uint8
        )
        np.savez(path, **arrays)
        with pytest.raises(ValueError, match="self-describing"):
            load_packed_auto(path)


@pytest.fixture(scope="module")
def cli_server(tmp_path_factory):
    """python -m nf4_tpu.serve --packed ... driven in-process (block=False)."""
    from nf4_tpu.serve.__main__ import main

    cfg = configs.TINY_TEST
    params = init_params(cfg, seed=0)
    path = str(tmp_path_factory.mktemp("cli") / "tiny.safetensors")
    save_packed(path, params, cfg)
    server = main(
        [
            "--packed", path,
            "--port", "0",
            "--batch-size", "2",
            "--eos", "-1",
            "--model-name", "tiny-nf4",
        ],
        block=False,
    )
    twin = Engine(params, cfg, batch_size=2, eos_token=-1)
    yield f"http://127.0.0.1:{server.port}", twin, server
    server.stop()


class TestServeCLI:
    def test_models_endpoint(self, cli_server):
        url, _, _ = cli_server
        with urllib.request.urlopen(url + "/v1/models", timeout=30) as r:
            body = json.loads(r.read())
        assert body["data"][0]["id"] == "tiny-nf4"

    def test_completion_matches_engine(self, cli_server):
        url, twin, _ = cli_server
        prompt = [3, 1, 4, 1, 5]
        req = urllib.request.Request(
            url + "/v1/completions",
            data=json.dumps(
                {"model": "tiny-nf4", "prompt": prompt, "max_tokens": 6}
            ).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=300) as resp:
            body = json.loads(resp.read())
        expected = twin.generate([prompt], max_new_tokens=6)[0].tokens
        assert body["choices"][0]["tokens"] == list(expected)

    def test_source_validation(self):
        from nf4_tpu.serve.__main__ import main

        with pytest.raises(SystemExit):
            main(["--port", "0"], block=False)  # no weight source
        with pytest.raises(SystemExit):
            main(["--synthetic", "--port", "0"], block=False)  # no --model


def test_cli_synthetic_source():
    """--model NAME --synthetic stands a server up with random weights."""
    from nf4_tpu.serve.__main__ import main

    server = main(
        ["--model", "tiny-test", "--synthetic", "--port", "0",
         "--batch-size", "2", "--eos", "-1"],
        block=False,
    )
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{server.port}/health", timeout=30
        ) as r:
            assert json.loads(r.read())["status"] == "ok"
    finally:
        server.stop()
