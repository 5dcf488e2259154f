"""Packed SFT: segment-masked attention, data packing, packed == per-row.

The packing contract (train/data.py): a packed row computes the SAME
per-example math as separate rows — block-diagonal attention via
segment_ids plus segment-relative RoPE positions — unlike naive packing,
which leaks attention across example boundaries.
"""

import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp

from nf4_tpu.models import configs
from nf4_tpu.models.llama import init_params, train_forward
from nf4_tpu.ops.attention import chunked_attention, naive_attention
from nf4_tpu.train import (
    LoraConfig,
    init_lora,
    lm_loss,
    make_train_step,
    pack_sft,
    pad_sft,
)

CFG = configs.TINY_TEST


def _ref_segmented(q, k, v, seg, scale):
    """Explicit-mask numpy oracle: slot-causal AND same-segment."""
    b, nh, s, d = q.shape
    nkv = k.shape[1]
    g = nh // nkv
    qg = q.reshape(b, nkv, g, s, d)
    sc = np.einsum("bkgsd,bktd->bkgst", qg, k, dtype=np.float64) * scale
    t_ids = np.arange(s)
    mask = (t_ids[None, None, :] <= t_ids[None, :, None]) & (
        seg[:, :, None] == seg[:, None, :]
    )  # [B, S, T]
    sc = np.where(mask[:, None, None, :, :], sc, -np.inf)
    sc = sc - sc.max(axis=-1, keepdims=True)
    p = np.exp(sc)
    denom = p.sum(axis=-1, keepdims=True)
    out = np.einsum("bkgst,bktd->bkgsd", p / np.maximum(denom, 1e-30), v)
    return out.reshape(b, nh, s, d)


def _segments(rng, b, s, max_segs=3):
    seg = np.zeros((b, s), np.int32)
    for r in range(b):
        cuts = np.sort(rng.choice(np.arange(1, s), size=max_segs - 1, replace=False))
        seg[r] = np.searchsorted(cuts, np.arange(s), side="right")
    return seg


class TestSegmentedAttention:
    @pytest.mark.parametrize("impl", ["naive", "chunked"])
    def test_matches_explicit_mask_oracle(self, rng, impl):
        b, nh, nkv, s, d = 2, 4, 2, 20, 16
        q = rng.standard_normal((b, nh, s, d)).astype(np.float32)
        k = rng.standard_normal((b, nkv, s, d)).astype(np.float32)
        v = rng.standard_normal((b, nkv, s, d)).astype(np.float32)
        seg = _segments(rng, b, s)
        slot = np.broadcast_to(np.arange(s, dtype=np.int32), (b, s))
        lens = np.full((b,), s, np.int32)

        kw = dict(scale=d**-0.5, segment_ids=jnp.asarray(seg))
        if impl == "naive":
            got = naive_attention(
                jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                jnp.asarray(slot), jnp.asarray(lens), **kw,
            )
        else:
            got = chunked_attention(
                jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                jnp.asarray(slot), jnp.asarray(lens),
                q_chunk=8, kv_chunk=8, **kw,  # padding + multiple tiles
            )
        want = _ref_segmented(q, k, v, seg, d**-0.5)
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=2e-5)

    def test_no_segments_unchanged(self, rng):
        """segment_ids=None stays the exact pre-existing math (all-zero
        segments are also equivalent)."""
        b, nh, nkv, s, d = 1, 2, 1, 12, 8
        q = rng.standard_normal((b, nh, s, d)).astype(np.float32)
        k = rng.standard_normal((b, nkv, s, d)).astype(np.float32)
        v = rng.standard_normal((b, nkv, s, d)).astype(np.float32)
        slot = np.broadcast_to(np.arange(s, dtype=np.int32), (b, s))
        lens = np.full((b,), s, np.int32)
        base = naive_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(slot), jnp.asarray(lens), scale=d**-0.5,
        )
        zeros = naive_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(slot), jnp.asarray(lens), scale=d**-0.5,
            segment_ids=jnp.zeros((b, s), jnp.int32),
        )
        np.testing.assert_allclose(np.asarray(base), np.asarray(zeros), atol=1e-6)


EXAMPLES = [
    ([11, 12, 13], [14, 15]),
    ([21, 22], [23, 24, 25, 26]),
    ([31], [32, 33]),
]


class TestPacking:
    def test_pad_geometry(self):
        b = pad_sft(EXAMPLES, seq_len=10, pad_id=0)
        assert b.tokens.shape == (3, 10)
        np.testing.assert_array_equal(b.tokens[0, :5], [11, 12, 13, 14, 15])
        np.testing.assert_array_equal(b.loss_mask[0, :6], [0, 0, 0, 1, 1, 0])
        np.testing.assert_array_equal(b.segment_ids[0, :6], [0, 0, 0, 0, 0, -1])
        np.testing.assert_array_equal(b.positions[0, :5], np.arange(5))
        assert b.spans == ((0, 0, 5), (1, 0, 6), (2, 0, 3))

    def test_pack_geometry(self):
        b = pack_sft(EXAMPLES, seq_len=9, pad_id=0)
        # FFD: ex1 (6) opens row 0; ex0 (5) opens row 1; ex2 (3) fits row 0.
        assert b.tokens.shape == (2, 9)
        assert b.efficiency == pytest.approx(14 / 18)
        for i, (p, c) in enumerate(EXAMPLES):
            row, start, n = b.spans[i]
            assert n == len(p) + len(c)
            np.testing.assert_array_equal(
                b.tokens[row, start : start + n], list(p) + list(c)
            )
            np.testing.assert_array_equal(
                b.positions[row, start : start + n], np.arange(n)
            )
            seg = b.segment_ids[row, start : start + n]
            assert (seg == seg[0]).all() and seg[0] >= 0
            np.testing.assert_array_equal(
                b.loss_mask[row, start : start + n],
                [0.0] * len(p) + [1.0] * len(c),
            )
        # Distinct examples sharing a row carry distinct segment ids.
        r0 = [i for i, sp in enumerate(b.spans) if sp[0] == 0]
        segs = {b.segment_ids[0, b.spans[i][1]] for i in r0}
        assert len(segs) == len(r0) == 2
        # Padding slots: seg -1, mask 0.
        assert (b.loss_mask[b.segment_ids < 0] == 0).all()

    def test_validation(self):
        with pytest.raises(ValueError, match="empty prompt"):
            pad_sft([([], [1])], 8)
        with pytest.raises(ValueError, match="empty completion"):
            pad_sft([([1], [])], 8)
        with pytest.raises(ValueError, match="truncate"):
            pack_sft([([1, 2, 3], [4, 5, 6])], 4)


class TestPackedForward:
    @pytest.fixture(scope="class")
    def model(self):
        return init_params(CFG, seed=0)

    def test_packed_logits_match_per_row(self, model):
        """The packing contract itself: every example's logits in a packed
        row equal its logits alone in a padded row (bf16 noise only)."""
        packed = pack_sft(EXAMPLES, seq_len=9)
        padded = pad_sft(EXAMPLES, seq_len=9)
        lg_packed = np.asarray(
            train_forward(
                model, CFG, jnp.asarray(packed.tokens),
                positions=jnp.asarray(packed.positions),
                segment_ids=jnp.asarray(packed.segment_ids),
            )
        )
        lg_padded = np.asarray(
            train_forward(
                model, CFG, jnp.asarray(padded.tokens),
                positions=jnp.asarray(padded.positions),
                segment_ids=jnp.asarray(padded.segment_ids),
            )
        )
        for i in range(len(EXAMPLES)):
            row, start, n = packed.spans[i]
            a = lg_packed[row, start : start + n]
            b = lg_padded[i, :n]
            scale = np.abs(b).max()
            assert np.abs(a - b).max() / scale < 2e-2, i
            assert (a.argmax(-1) == b.argmax(-1)).mean() > 0.95, i

    def test_packed_loss_matches_padded(self, model):
        """Identical weighted target sets => identical masked mean loss."""
        packed = pack_sft(EXAMPLES, seq_len=9)
        padded = pad_sft(EXAMPLES, seq_len=9)
        lora = init_lora(CFG, LoraConfig(rank=4), seed=0)
        lp = float(
            lm_loss(
                model, lora, CFG, jnp.asarray(packed.tokens),
                loss_mask=jnp.asarray(packed.loss_mask),
                positions=jnp.asarray(packed.positions),
                segment_ids=jnp.asarray(packed.segment_ids),
            )
        )
        ld = float(
            lm_loss(
                model, lora, CFG, jnp.asarray(padded.tokens),
                loss_mask=jnp.asarray(padded.loss_mask),
                positions=jnp.asarray(padded.positions),
                segment_ids=jnp.asarray(padded.segment_ids),
            )
        )
        np.testing.assert_allclose(lp, ld, rtol=2e-2)

    def test_train_step_on_packed_batch(self, model):
        """End-to-end: packed batch through the jitted step (accum + dp
        mesh when available) — finite and decreasing."""
        from nf4_tpu.parallel.mesh import make_mesh

        examples = [
            ([1 + i, 2 + i, 3 + i], [4 + i, 5 + i, 6 + i, 7 + i])
            for i in range(8)
        ]
        b = pack_sft(examples, seq_len=14)
        # 8 examples, 7 slots each -> 4 rows of 2. Pad rows to a dp batch.
        assert b.tokens.shape[0] == 4
        # accum=2 splits the 4 rows into microbatches of 2 -> dp=2.
        mesh = make_mesh(dp=2) if len(jax.devices()) >= 2 else None
        lora = init_lora(CFG, LoraConfig(rank=4), seed=0)
        opt = optax.adamw(1e-2)
        step = make_train_step(CFG, opt, mesh=mesh, accum_steps=2)
        ost = opt.init(lora)
        losses = []
        for _ in range(4):
            lora, ost, loss = step(
                model, lora, ost,
                jnp.asarray(b.tokens),
                jnp.asarray(b.loss_mask),
                jnp.asarray(b.positions),
                jnp.asarray(b.segment_ids),
            )
            losses.append(float(loss))
        assert all(np.isfinite(losses)) and losses[-1] < losses[0], losses
