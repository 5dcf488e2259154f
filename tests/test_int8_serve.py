"""int8-recode serving mode (ops.int8_serve)."""

import numpy as np
import pytest

import jax.numpy as jnp

from nf4_tpu.nf4.format import quantize_for_tpu
from nf4_tpu.nf4.reference import dequantize_nf4, quantize_nf4
from nf4_tpu.ops.int8_serve import int8_matmul, recode_int8_weight


class TestInt8Recode:
    def test_values_on_recoded_grid(self, rng):
        w = (rng.standard_normal((128, 1024)) * 0.05).astype(np.float32)
        pw = quantize_for_tpu(w)
        p8 = recode_int8_weight(pw)
        assert p8.values.dtype == jnp.int8
        assert p8.values.shape == (pw.padded_shape[1], pw.padded_shape[0])
        # Reconstructed weight within int8-recode error of the exact NF4.
        exact = dequantize_nf4(quantize_nf4(w), dtype=np.float32)
        v = np.asarray(p8.values, np.float32)
        s = np.asarray(p8.scales, np.float32)
        rec = (v.reshape(-1, 64, v.shape[1]) * s[:, None, :]).reshape(v.shape)
        rec = rec[: w.shape[1], : w.shape[0]].T
        denom = max(1e-6, np.abs(exact).max())
        assert np.abs(rec - exact).max() / denom < 5e-3  # <=0.4% + margin

    @pytest.mark.parametrize("bshape", [(4,), (1,), (2, 3)])
    def test_matmul_close_to_nf4(self, rng, bshape):
        w = (rng.standard_normal((256, 1024)) * 0.05).astype(np.float32)
        pw = quantize_for_tpu(w)
        p8 = recode_int8_weight(pw)
        x = rng.standard_normal((*bshape, 1024)).astype(np.float32)
        y8 = np.asarray(int8_matmul(jnp.asarray(x, jnp.bfloat16), p8), np.float32)
        exact = dequantize_nf4(quantize_nf4(w), dtype=np.float32)
        yref = x.astype(np.float32) @ exact.T
        rel = np.abs(y8 - yref).max() / max(1e-6, np.abs(yref).max())
        assert rel < 3e-2  # bf16 activations + recode error
        assert y8.shape == (*bshape, 256)

    def test_model_recode_roundtrip(self):
        from nf4_tpu.models import configs
        from nf4_tpu.models.llama import (
            init_kv_cache,
            init_params,
            prefill,
            recode_params_int8,
        )
        from nf4_tpu.ops.int8_serve import PackedInt8

        cfg = configs.TINY_TEST
        params = init_params(cfg, seed=0)
        p8 = recode_params_int8(params)
        assert isinstance(p8.layers.wqkv, PackedInt8)
        tokens = jnp.arange(6, dtype=jnp.int32)[None, :] % cfg.vocab_size
        l4, _ = prefill(params, cfg, tokens)
        l8, _ = prefill(p8, cfg, tokens)
        l4 = np.asarray(l4, np.float32)
        l8 = np.asarray(l8, np.float32)
        corr = np.corrcoef(l4.ravel(), l8.ravel())[0, 1]
        assert corr > 0.999  # int8 recode barely perturbs logits
