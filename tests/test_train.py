"""QLoRA fine-tuning stack: differentiable fused matmul, LoRA adapters,
train step, remat, merging, and the dp-sharded step.

The reference package's downstream role is feeding Unsloth's 4-bit LoRA
fine-tuning (reference ``README.md:3``); this suite covers the TPU-native
trainer built for the same contract (``nf4_tpu/train/``).
"""

import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp

from nf4_tpu import dequantize, nf4_matmul, quantize_for_tpu
from nf4_tpu.models import configs
from nf4_tpu.models.llama import init_params, prefill, train_forward
from nf4_tpu.train import (
    LoraConfig,
    init_lora,
    lm_loss,
    load_lora,
    make_train_step,
    merge_lora,
    save_lora,
)

CFG = configs.TINY_TEST


@pytest.fixture(scope="module")
def model():
    return init_params(CFG, seed=0)


@pytest.fixture(scope="module")
def tokens():
    rng = np.random.default_rng(1)
    return jnp.asarray(rng.integers(0, CFG.vocab_size, (2, 16)), jnp.int32)


class TestMatmulVJP:
    """nf4_matmul's custom VJP: dx = g @ W with W dequantized exactly."""

    def test_grad_matches_dequant_reference(self, rng):
        w = (rng.standard_normal((256, 384)) * 0.02).astype(np.float32)
        pw = quantize_for_tpu(w, dtype=jnp.bfloat16, method="oracle")
        x = jnp.asarray(rng.standard_normal((4, 384)) * 0.1, jnp.float32)
        g = jnp.asarray(rng.standard_normal((4, 256)), jnp.float32)

        dx = jax.grad(lambda x: (nf4_matmul(x, pw) * g).sum())(x)
        want = np.asarray(g) @ np.asarray(dequantize(pw, dtype=jnp.float32))
        np.testing.assert_allclose(np.asarray(dx), want, atol=1e-4)

    def test_grad_through_sharded_weight(self, rng):
        w = (rng.standard_normal((128, 2048)) * 0.02).astype(np.float32)
        pw = quantize_for_tpu(w, dtype=jnp.bfloat16, shards=2, method="oracle")
        x = jnp.asarray(rng.standard_normal((3, 2048)) * 0.1, jnp.float32)
        g = jnp.asarray(rng.standard_normal((3, 128)), jnp.float32)

        dx = jax.grad(lambda x: (nf4_matmul(x, pw) * g).sum())(x)
        want = np.asarray(g) @ np.asarray(dequantize(pw, dtype=jnp.float32))
        np.testing.assert_allclose(np.asarray(dx), want, atol=1e-4)

    def test_grad_dtype_follows_x(self, rng):
        w = (rng.standard_normal((128, 128)) * 0.02).astype(np.float32)
        pw = quantize_for_tpu(w, dtype=jnp.bfloat16, method="oracle")
        x = jnp.asarray(rng.standard_normal((2, 128)), jnp.bfloat16)
        dx = jax.jit(jax.grad(lambda x: nf4_matmul(x, pw).sum()))(x)
        assert dx.dtype == jnp.bfloat16

    def test_forward_value_unchanged_by_vjp_wrapper(self, rng):
        """The custom_vjp wrapper must not perturb inference numerics."""
        w = (rng.standard_normal((128, 192)) * 0.02).astype(np.float32)
        pw = quantize_for_tpu(w, dtype=jnp.bfloat16, method="oracle")
        x = jnp.asarray(rng.standard_normal((2, 192)), jnp.float32)
        y1 = nf4_matmul(x, pw)
        y2, _ = jax.vjp(lambda x: nf4_matmul(x, pw), x)
        assert np.array_equal(np.asarray(y1), np.asarray(y2))


class TestTrainForward:
    def test_matches_prefill_logits(self, model, tokens):
        ref, _ = prefill(model, CFG, tokens)
        got = train_forward(model, CFG, tokens)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4
        )

    def test_zero_init_lora_is_identity(self, model, tokens):
        base = train_forward(model, CFG, tokens)
        lora = init_lora(CFG, LoraConfig(rank=4), seed=0)
        adapted = train_forward(model, CFG, tokens, lora=lora)
        assert np.array_equal(np.asarray(base), np.asarray(adapted))

    def test_remat_matches(self, model, tokens):
        lora = init_lora(CFG, LoraConfig(rank=4), seed=0)
        g1 = jax.grad(lambda lo: lm_loss(model, lo, CFG, tokens))(lora)
        g2 = jax.grad(lambda lo: lm_loss(model, lo, CFG, tokens, remat=True))(lora)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5
            )

    def test_subset_targets(self, model, tokens):
        lcfg = LoraConfig(rank=4, targets=("wqkv", "w_down"))
        lora = init_lora(CFG, lcfg, seed=0)
        assert lora.layers.o is None and lora.layers.gateup is None
        g = jax.grad(lambda lo: lm_loss(model, lo, CFG, tokens))(lora)
        assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))

    def test_bad_target_raises(self):
        with pytest.raises(ValueError, match="unknown LoRA targets"):
            LoraConfig(targets=("wq",))


class TestTrainStep:
    def test_loss_decreases(self, model, tokens):
        lcfg = LoraConfig(rank=4)
        lora = init_lora(CFG, lcfg, seed=0)
        opt = optax.adamw(1e-2)
        step = make_train_step(CFG, opt)
        opt_state = opt.init(lora)
        l0 = float(lm_loss(model, lora, CFG, tokens))
        for _ in range(15):
            lora, opt_state, loss = step(model, lora, opt_state, tokens)
        assert float(loss) < l0 - 0.5, (l0, float(loss))

    def test_loss_mask(self, model, tokens):
        """Fully-masked-out rows contribute nothing: loss over row 0 only
        equals loss of a batch containing row 0 only."""
        lora = init_lora(CFG, LoraConfig(rank=4), seed=0)
        mask = jnp.asarray(np.stack([np.ones(16), np.zeros(16)]), jnp.float32)
        masked = float(lm_loss(model, lora, CFG, tokens, loss_mask=mask))
        solo = float(lm_loss(model, lora, CFG, tokens[:1]))
        np.testing.assert_allclose(masked, solo, rtol=1e-5)

    def test_dp_step_matches_single_device(self, model):
        """Per-step losses on a dp=8 mesh track the single-device step
        (bf16 reassociation noise only — the optimizer math is identical)."""
        from nf4_tpu.parallel.mesh import make_mesh

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 devices")
        rng = np.random.default_rng(2)
        toks = jnp.asarray(rng.integers(0, CFG.vocab_size, (8, 16)), jnp.int32)
        lcfg = LoraConfig(rank=4)
        opt = optax.adamw(1e-2)

        lora_s = init_lora(CFG, lcfg, seed=0)
        step_s = make_train_step(CFG, opt)
        os_s = opt.init(lora_s)

        mesh = make_mesh(dp=8)
        lora_d = init_lora(CFG, lcfg, seed=0)
        step_d = make_train_step(CFG, opt, mesh=mesh)
        os_d = opt.init(lora_d)

        for _ in range(3):
            lora_s, os_s, ls = step_s(model, lora_s, os_s, toks)
            lora_d, os_d, ld = step_d(model, lora_d, os_d, toks)
            np.testing.assert_allclose(float(ls), float(ld), rtol=1e-3)

        # Raw gradients agree to bf16 noise at a common adapter point.
        from jax.sharding import PartitionSpec as P

        lora0 = init_lora(CFG, lcfg, seed=0)
        g_ref = jax.grad(lambda lo: lm_loss(model, lo, CFG, toks))(lora0)

        def sharded(params, lo, tk):
            g = jax.grad(lambda lo: lm_loss(params, lo, CFG, tk))(lo)
            return jax.tree.map(lambda x: jax.lax.pmean(x, "dp"), g)

        g_dp = jax.jit(
            jax.shard_map(
                sharded,
                mesh=mesh,
                in_specs=(P(), P(), P("dp")),
                out_specs=P(),
                check_vma=False,
            )
        )(model, lora0, toks)
        for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_dp)):
            a, b = np.asarray(a), np.asarray(b)
            scale = max(np.abs(a).max(), 1e-6)
            assert np.abs(a - b).max() / scale < 2e-2


class TestGradAccum:
    def test_accum_matches_full_batch(self, model):
        """accum_steps=2 on one batch == the plain step on the same batch:
        batch rows are independent, so the averaged microbatch gradients
        equal the full-batch gradient (reassociation noise only)."""
        rng = np.random.default_rng(5)
        toks = jnp.asarray(rng.integers(0, CFG.vocab_size, (4, 16)), jnp.int32)
        lcfg = LoraConfig(rank=4)
        opt = optax.adamw(1e-2)

        lora_p = init_lora(CFG, lcfg, seed=0)
        step_p = make_train_step(CFG, opt)
        os_p = opt.init(lora_p)

        lora_a = init_lora(CFG, lcfg, seed=0)
        step_a = make_train_step(CFG, opt, accum_steps=2)
        os_a = opt.init(lora_a)

        for _ in range(3):
            lora_p, os_p, lp = step_p(model, lora_p, os_p, toks)
            lora_a, os_a, la = step_a(model, lora_a, os_a, toks)
            np.testing.assert_allclose(float(lp), float(la), rtol=1e-3)

        # Gradient math directly: one SGD(1.0) step makes the updated
        # adapter init - grad, so the plain/accum difference IS the grad
        # difference — compared to grad scale, without Adam's sqrt(v)
        # normalization amplifying bf16 forward noise on tiny gradients.
        sgd = optax.sgd(1.0)
        g_p = jax.tree.map(
            jnp.subtract,
            init_lora(CFG, lcfg, seed=0),
            make_train_step(CFG, sgd)(
                model, init_lora(CFG, lcfg, seed=0),
                sgd.init(init_lora(CFG, lcfg, seed=0)), toks,
            )[0],
        )
        g_a = jax.tree.map(
            jnp.subtract,
            init_lora(CFG, lcfg, seed=0),
            make_train_step(CFG, sgd, accum_steps=2)(
                model, init_lora(CFG, lcfg, seed=0),
                sgd.init(init_lora(CFG, lcfg, seed=0)), toks,
            )[0],
        )
        for a, b in zip(jax.tree.leaves(g_p), jax.tree.leaves(g_a)):
            a, b = np.asarray(a), np.asarray(b)
            scale = max(np.abs(a).max(), 1e-6)
            assert np.abs(a - b).max() / scale < 2e-2

    def test_accum_respects_loss_mask(self, model):
        """Masked rows stay ignored when they land in their own microbatch."""
        rng = np.random.default_rng(6)
        toks = jnp.asarray(rng.integers(0, CFG.vocab_size, (2, 16)), jnp.int32)
        lora = init_lora(CFG, LoraConfig(rank=4), seed=0)
        opt = optax.adamw(1e-2)
        step = make_train_step(CFG, opt, accum_steps=2)
        mask = jnp.asarray(np.stack([np.ones(16), np.zeros(16)]), jnp.float32)
        _, _, masked = step(model, lora, opt.init(lora), toks, mask)
        solo = float(lm_loss(model, lora, CFG, toks[:1]))
        # accum averages microbatch means; the zero row's mean is 0/eps = 0,
        # so the accum loss is half the solo loss.
        np.testing.assert_allclose(float(masked), solo / 2, rtol=1e-5)

    def test_accum_over_mesh(self, model):
        from nf4_tpu.parallel.mesh import make_mesh

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 devices")
        rng = np.random.default_rng(7)
        toks = jnp.asarray(rng.integers(0, CFG.vocab_size, (16, 16)), jnp.int32)
        lcfg = LoraConfig(rank=4)
        opt = optax.adamw(1e-2)
        lora = init_lora(CFG, lcfg, seed=0)
        step = make_train_step(CFG, opt, mesh=make_mesh(dp=8), accum_steps=2)
        os_ = opt.init(lora)
        lora, os_, loss = step(model, lora, os_, toks)
        assert np.isfinite(float(loss))

        lora_s = init_lora(CFG, lcfg, seed=0)
        step_s = make_train_step(CFG, opt)
        _, _, loss_s = step_s(model, lora_s, opt.init(lora_s), toks)
        np.testing.assert_allclose(float(loss), float(loss_s), rtol=1e-3)

    def test_accum_bad_batch_raises(self, model, tokens):
        opt = optax.adamw(1e-2)
        step = make_train_step(CFG, opt, accum_steps=3)
        lora = init_lora(CFG, LoraConfig(rank=4), seed=0)
        with pytest.raises(AssertionError, match="divide"):
            step(model, lora, opt.init(lora), tokens)  # batch 2, accum 3


class TestTPTrain:
    """Tensor-parallel LoRA training on the CPU mesh: the tp step must
    track single-device training (same checkpoint via repack_tp)."""

    def _tp_setup(self, tp):
        from nf4_tpu.parallel.tp import repack_tp

        base = init_params(CFG, seed=0)
        params_tp, cfg_tp = repack_tp(base, CFG, tp)
        return base, params_tp, cfg_tp

    def test_tp_loss_matches_single_device_at_init(self, model, tokens):
        """Zero-init adapters: the tp step's global-softmax loss equals
        plain lm_loss on the same checkpoint."""
        from nf4_tpu.parallel.mesh import make_mesh

        if len(jax.devices()) < 2:
            pytest.skip("needs 2 devices")
        base, params_tp, cfg_tp = self._tp_setup(2)
        mesh = make_mesh(tp=2)
        opt = optax.sgd(0.0)  # lr 0: loss only, adapters untouched
        lora = init_lora(cfg_tp, LoraConfig(rank=4), seed=0)
        step = make_train_step(cfg_tp, opt, mesh=mesh)
        _, _, loss_tp = step(params_tp, lora, opt.init(lora), tokens)
        ref = float(lm_loss(base, None, CFG, tokens))
        np.testing.assert_allclose(float(loss_tp), ref, rtol=1e-3)

    def test_tp_training_tracks_single_device(self, model, tokens):
        """Per-step losses of tp=2 training match single-device training
        step for step (both from the zero adapter, same data)."""
        from nf4_tpu.parallel.mesh import make_mesh

        if len(jax.devices()) < 2:
            pytest.skip("needs 2 devices")
        base, params_tp, cfg_tp = self._tp_setup(2)
        opt = optax.adamw(1e-2)

        lora_s = init_lora(CFG, LoraConfig(rank=4), seed=0)
        step_s = make_train_step(CFG, opt)
        os_s = opt.init(lora_s)

        mesh = make_mesh(tp=2)
        lora_t = init_lora(cfg_tp, LoraConfig(rank=4), seed=0)
        step_t = make_train_step(cfg_tp, opt, mesh=mesh)
        os_t = opt.init(lora_t)

        for i in range(4):
            lora_s, os_s, ls = step_s(base, lora_s, os_s, tokens)
            lora_t, os_t, lt = step_t(params_tp, lora_t, os_t, tokens)
            # TP re-partitions the bf16 matmuls (different partial-sum
            # association); Adam normalizes tiny grads, so the relative
            # drift compounds ~0.1-0.2%/step. 6e-3 over 4 steps is noise.
            np.testing.assert_allclose(float(ls), float(lt), rtol=6e-3)

    def test_dp_tp_mesh_with_accum(self, model):
        """dp=2 x tp=2 with accum_steps=2: runs, finite, tracks the plain
        step on the same global batch."""
        from nf4_tpu.parallel.mesh import make_mesh

        if len(jax.devices()) < 4:
            pytest.skip("needs 4 devices")
        base, params_tp, cfg_tp = self._tp_setup(2)
        rng = np.random.default_rng(9)
        toks = jnp.asarray(rng.integers(0, CFG.vocab_size, (8, 16)), jnp.int32)
        opt = optax.adamw(1e-2)

        mesh = make_mesh(dp=2, tp=2)
        lora = init_lora(cfg_tp, LoraConfig(rank=4), seed=0)
        step = make_train_step(cfg_tp, opt, mesh=mesh, accum_steps=2)
        lora, _, loss = step(params_tp, lora, opt.init(lora), toks)

        lora_s = init_lora(CFG, LoraConfig(rank=4), seed=0)
        step_s = make_train_step(CFG, opt, accum_steps=2)
        _, _, loss_s = step_s(base, lora_s, opt.init(lora_s), toks)
        np.testing.assert_allclose(float(loss), float(loss_s), rtol=2e-3)

    def test_tp_trained_adapter_merges_and_serves(self, model, tokens):
        """Adapters trained under tp merge into the tp-basis checkpoint
        and the merged model's loss matches merging the single-device-
        trained adapters (same training trajectory, two shardings)."""
        from nf4_tpu.parallel.mesh import make_mesh

        if len(jax.devices()) < 2:
            pytest.skip("needs 2 devices")
        base, params_tp, cfg_tp = self._tp_setup(2)
        opt = optax.adamw(1e-2)

        lora_s = init_lora(CFG, LoraConfig(rank=4), seed=0)
        step_s = make_train_step(CFG, opt)
        os_s = opt.init(lora_s)
        mesh = make_mesh(tp=2)
        lora_t = init_lora(cfg_tp, LoraConfig(rank=4), seed=0)
        step_t = make_train_step(cfg_tp, opt, mesh=mesh)
        os_t = opt.init(lora_t)
        for _ in range(3):
            lora_s, os_s, _ = step_s(base, lora_s, os_s, tokens)
            lora_t, os_t, _ = step_t(params_tp, lora_t, os_t, tokens)

        merged_s = merge_lora(base, lora_s, CFG, quantize=False)
        merged_t = merge_lora(
            params_tp, jax.device_get(lora_t), cfg_tp, quantize=False
        )
        ls = float(lm_loss(merged_s, None, CFG, tokens))
        lt = float(lm_loss(merged_t, None, cfg_tp, tokens))
        np.testing.assert_allclose(lt, ls, rtol=5e-3)


class TestSaveLoad:
    def test_roundtrip(self, model, tokens, tmp_path):
        lcfg = LoraConfig(rank=4, alpha=8.0, targets=("wqkv", "wo"))
        lora = init_lora(CFG, lcfg, seed=3)
        # Make B nonzero so the roundtrip is meaningful.
        opt = optax.adamw(1e-2)
        step = make_train_step(CFG, opt)
        lora, _, _ = step(model, lora, opt.init(lora), tokens)

        path = str(tmp_path / "adapter.npz")
        save_lora(path, lora, lcfg)
        lora2, lcfg2 = load_lora(path)
        assert lcfg2 == lcfg
        y1 = train_forward(model, CFG, tokens, lora=lora)
        y2 = train_forward(model, CFG, tokens, lora=lora2)
        assert np.array_equal(np.asarray(y1), np.asarray(y2))


class TestMerge:
    def test_dense_merge_matches_adapter_forward(self, model, tokens):
        lcfg = LoraConfig(rank=4)
        lora = init_lora(CFG, lcfg, seed=0)
        opt = optax.adamw(1e-2)
        step = make_train_step(CFG, opt)
        opt_state = opt.init(lora)
        for _ in range(5):
            lora, opt_state, _ = step(model, lora, opt_state, tokens)

        ya = np.asarray(train_forward(model, CFG, tokens, lora=lora))
        merged = merge_lora(model, lora, CFG, quantize=False)
        ym = np.asarray(train_forward(merged, CFG, tokens))
        # bf16 weight rounding is the only difference.
        assert np.abs(ym - ya).max() / np.abs(ya).max() < 0.05

    def test_quantized_merge_serves(self, model, tokens):
        """Requantized merge keeps PackedNF4 weights (TP/serving-ready) and
        stays close to the adapter forward (NF4 cell rounding)."""
        from nf4_tpu.nf4.format import PackedNF4

        lcfg = LoraConfig(rank=4)
        lora = init_lora(CFG, lcfg, seed=0)
        opt = optax.adamw(1e-2)
        step = make_train_step(CFG, opt)
        opt_state = opt.init(lora)
        for _ in range(5):
            lora, opt_state, _ = step(model, lora, opt_state, tokens)

        merged = merge_lora(model, lora, CFG, quantize=True, method="oracle")
        assert isinstance(merged.layers.wqkv, PackedNF4)
        assert merged.layers.wqkv.packed.shape == model.layers.wqkv.packed.shape
        ya = np.asarray(train_forward(model, CFG, tokens, lora=lora))
        ym = np.asarray(train_forward(merged, CFG, tokens))
        assert np.isfinite(ym).all()
        # Same prediction structure: top-1 agreement on most positions.
        agree = (ym.argmax(-1) == ya.argmax(-1)).mean()
        assert agree > 0.9, agree

    def test_merge_zero_adapter_roundtrip(self, model, tokens):
        """Merging a zero adapter and requantizing stays within a scale
        re-compression of the base model.  NOT bit-exact by design: NF4
        values land back on their own grid points, but the per-block
        absmax is re-compressed through the uint8 double-quantization
        (code2/offset), which is not idempotent."""
        lora = init_lora(CFG, LoraConfig(rank=4), seed=0)
        merged = merge_lora(model, lora, CFG, quantize=True, method="oracle")
        base, _ = prefill(model, CFG, tokens)
        got, _ = prefill(merged, CFG, tokens)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(base), atol=0.08, rtol=0.02
        )
