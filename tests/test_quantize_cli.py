"""The offline quantization CLI (python -m nf4_tpu.quantize)."""

import json

import numpy as np
import pytest

pytest.importorskip("safetensors")

from test_bnb_checkpoint import (  # noqa: E402
    dense_llama_weights,
    tiny_hf_config,
    write_bnb_checkpoint,
)

from nf4_tpu.models import configs  # noqa: E402


def _write_dense(cfg, tmp_path):
    from safetensors.numpy import save_file

    layers, embed, norm = dense_llama_weights(cfg, seed=0)
    tensors = {
        "model.embed_tokens.weight": embed,
        "model.norm.weight": norm,
    }
    for i, lw in enumerate(layers):
        p = f"model.layers.{i}."
        for k, w in lw.items():
            tensors[p + k] = w
        tensors[p + "input_layernorm.weight"] = np.ones(
            cfg.hidden_size, np.float32
        )
        tensors[p + "post_attention_layernorm.weight"] = np.ones(
            cfg.hidden_size, np.float32
        )
    save_file(tensors, str(tmp_path / "model.safetensors"))
    hf = tiny_hf_config(cfg)
    del hf["quantization_config"]
    (tmp_path / "config.json").write_text(json.dumps(hf))


def test_quantize_cli_roundtrip(tmp_path, capsys):
    from nf4_tpu.quantize import main

    cfg = configs.TINY_TEST
    _write_dense(cfg, tmp_path)
    out = str(tmp_path / "packed.npz")
    rc = main(["--hf-dir", str(tmp_path), "--out", out])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["quant_type"] == "nf4"
    assert report["packed_bytes"] > 0

    # The artifact reloads and generates.
    from nf4_tpu.models.loader import hf_config_to_llama, load_packed
    from nf4_tpu.serve.engine import Engine

    lcfg = hf_config_to_llama(str(tmp_path / "config.json"))
    params = load_packed(out, lcfg)
    r = Engine(params, lcfg, batch_size=1, eos_token=-1).generate(
        [[1, 2, 3]], max_new_tokens=3
    )
    assert len(r[0].tokens) == 3


def test_quantize_cli_bnb_input(tmp_path, capsys):
    """A pre-quantized bnb checkpoint converts offline too (repack only)."""
    from nf4_tpu.quantize import main

    cfg = configs.TINY_TEST
    write_bnb_checkpoint(cfg, tmp_path)
    out = str(tmp_path / "packed.npz")
    rc = main(["--hf-dir", str(tmp_path), "--out", out])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["quant_type"] == "nf4"
