"""Resumable training: save_train_state / load_train_state round-trips.

The resume contract is behavioral, not just structural: a run saved at
step k and resumed must produce the SAME adapters and losses as the
uninterrupted run (bitwise — same jitted step program, same inputs).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from nf4_tpu.models.configs import TINY_TEST
from nf4_tpu.models.llama import init_params
from nf4_tpu.train import (
    LoraConfig,
    init_lora,
    load_train_state,
    make_train_step,
    save_train_state,
)
from nf4_tpu.train.lora import load_lora

CFG = TINY_TEST


@pytest.fixture(scope="module")
def model():
    return init_params(CFG, seed=0)


@pytest.fixture(scope="module")
def tokens():
    rng = np.random.default_rng(3)
    return jnp.asarray(rng.integers(0, CFG.vocab_size, (2, 16)), jnp.int32)


def _tree_equal(a, b):
    fa, fb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(fa) == len(fb)
    for x, y in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


class TestTrainStateRoundtrip:
    def test_resume_is_bitwise_identical(self, model, tokens, tmp_path):
        """Train 2 steps, checkpoint, train 2 more; vs save/load at the
        checkpoint and training the same 2 steps: identical losses and
        adapters (Adam moments restored exactly)."""
        lcfg = LoraConfig(rank=4, alpha=8.0)
        opt = optax.adamw(1e-2)
        step = make_train_step(CFG, opt)

        lora = init_lora(CFG, lcfg, seed=0)
        os_ = opt.init(lora)
        for _ in range(2):
            lora, os_, _ = step(model, lora, os_, tokens)

        path = str(tmp_path / "state.npz")
        save_train_state(path, lora, lcfg, os_, step=2)

        # Uninterrupted continuation.
        lora_c, os_c = lora, os_
        losses_c = []
        for _ in range(2):
            lora_c, os_c, l = step(model, lora_c, os_c, tokens)
            losses_c.append(float(l))

        # Resumed continuation.
        lora_r, lcfg_r, os_r, k = load_train_state(path, opt)
        assert k == 2
        assert lcfg_r.rank == lcfg.rank and lcfg_r.alpha == lcfg.alpha
        _tree_equal(lora_r, lora)
        _tree_equal(os_r, os_)
        losses_r = []
        for _ in range(2):
            lora_r, os_r, l = step(model, lora_r, os_r, tokens)
            losses_r.append(float(l))

        assert losses_r == losses_c
        _tree_equal(lora_r, lora_c)

    def test_checkpoint_is_also_a_servable_adapter(self, model, tokens, tmp_path):
        """The .lora.npz sibling file loads through plain load_lora."""
        lcfg = LoraConfig(rank=4)
        lora = init_lora(CFG, lcfg, seed=1)
        opt = optax.sgd(1e-2)
        path = str(tmp_path / "s.npz")
        save_train_state(path, lora, lcfg, opt.init(lora), step=0)
        lora2, lcfg2 = load_lora(path + ".lora.npz")
        assert lcfg2.rank == lcfg.rank
        _tree_equal(lora2, lora)

    def test_wrong_optimizer_raises(self, tmp_path):
        lcfg = LoraConfig(rank=2)
        lora = init_lora(CFG, lcfg, seed=0)
        adam = optax.adamw(1e-3)
        path = str(tmp_path / "s.npz")
        save_train_state(path, lora, lcfg, adam.init(lora), step=1)
        with pytest.raises(ValueError, match="leaves"):
            load_train_state(path, optax.sgd(1e-3))

    def test_wrong_rank_raises(self, tmp_path):
        """Same optimizer but a different adapter rank at save time than
        the checkpoint's .lora implies -> shape mismatch is impossible by
        construction (template comes FROM the restored adapters); instead
        corrupt a leaf to prove the shape check fires."""
        lcfg = LoraConfig(rank=2)
        lora = init_lora(CFG, lcfg, seed=0)
        opt = optax.adamw(1e-3)
        path = str(tmp_path / "s.npz")
        save_train_state(path, lora, lcfg, opt.init(lora), step=0)
        with np.load(path) as z:
            arrays = dict(z)
        # Find an adapter-shaped moment leaf and truncate it.
        for k, v in arrays.items():
            if k.startswith("leaf_") and v.ndim >= 2:
                arrays[k] = v[..., :-1]
                break
        np.savez(path, **arrays)
        with pytest.raises(ValueError, match="shape mismatch"):
            load_train_state(path, opt)
