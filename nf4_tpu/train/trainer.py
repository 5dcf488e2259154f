"""Jit-compiled LoRA training step over frozen NF4 weights.

The loss is next-token cross entropy through ``models.llama.train_forward``
(cache-free, differentiable attention); gradients are taken with respect
to the LoRA adapters ONLY — the packed base weights ride along as frozen
jit arguments (never closed over: baking ~GB of weights into the HLO
breaks the remote-compile path, see CLAUDE.md), and ``nf4_matmul``'s
custom VJP stops at activations.

Data parallelism: pass a mesh (``parallel.mesh.make_mesh``) and the step
shards the batch over its ``dp`` axis with ``shard_map``, ``pmean``-ing
loss and adapter gradients over ICI before a replicated optimizer update —
the optimizer math stays identical to single-device (tested on the 8-way
CPU mesh).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from ..models.llama import LlamaConfig, LlamaParams, train_forward
from .lora import LoraAB, LoraParams

__all__ = ["lm_loss", "make_train_step", "lora_partition_specs"]


def _map_ab(lora: LoraParams, f):
    """Rebuild ``lora`` with each target's LoraAB replaced by
    ``f(field_name, ab)`` (None targets stay None)."""
    ll = lora.layers
    return LoraParams(
        tp_basis=lora.tp_basis,
        layers=ll.replace(
            **{
                name: (None if getattr(ll, name) is None else f(name, getattr(ll, name)))
                for name in ("qkv", "o", "gateup", "down")
            }
        )
    )


# Which side of each adapter is TP-sharded.  Column-parallel projections
# (qkv, gateup) shard B on out_features — pack-time row interleaving
# (models.llama.fuse_rows) makes each device's contiguous slice its own
# [q;k;v] / [gate;up] block, so adapters initialized against the same
# cfg.tp_shards slice contiguously too.  Row-parallel projections (o,
# down) shard A on in_features; their delta joins the base partial sum
# before the block's psum (models.llama._layer_forward).
_COL_TARGETS = ("qkv", "gateup")


def lora_partition_specs(lora: LoraParams, axis: str = "tp") -> LoraParams:
    """LoraParams-shaped pytree of PartitionSpecs for TP train/serve."""
    return _map_ab(
        lora,
        lambda name, ab: LoraAB(
            a=P(None, None, None) if name in _COL_TARGETS else P(None, None, axis),
            b=P(None, axis, None) if name in _COL_TARGETS else P(None, None, None),
            scaling=ab.scaling,
        ),
    )


def _lora_replicated_mask(lora: LoraParams) -> LoraParams:
    """True where an adapter leaf is REPLICATED across tp — such leaves
    receive only their device's gradient contribution inside shard_map and
    need a psum; sharded leaves' gradients are already exact locally."""
    return _map_ab(
        lora,
        lambda name, ab: LoraAB(
            a=name in _COL_TARGETS, b=name not in _COL_TARGETS,
            scaling=ab.scaling,
        ),
    )


def lm_loss(
    params: LlamaParams,
    lora: Optional[LoraParams],
    cfg: LlamaConfig,
    tokens: jax.Array,  # [B, S] int32
    loss_mask: Optional[jax.Array] = None,  # [B, S] — weight of each TARGET token
    remat: bool = False,
    positions: Optional[jax.Array] = None,  # [B, S] (packed rows)
    segment_ids: Optional[jax.Array] = None,  # [B, S] (packed rows)
) -> jax.Array:
    """Mean next-token cross entropy (fp32 scalar).

    Position ``t`` of ``loss_mask`` weights the prediction OF token ``t``
    (from position ``t-1``); position 0 is ignored.  Without a mask, all
    ``B*(S-1)`` predictions count equally.  ``positions``/``segment_ids``
    come from ``train.data.pack_sft`` (packed rows: block-diagonal
    attention + segment-relative RoPE); its loss mask already zeroes
    cross-segment targets.
    """
    logits = train_forward(
        params, cfg, tokens[:, :-1], lora=lora, remat=remat,
        positions=None if positions is None else positions[:, :-1],
        segment_ids=None if segment_ids is None else segment_ids[:, :-1],
    )
    targets = tokens[:, 1:]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    if loss_mask is None:
        return nll.mean()
    m = loss_mask[:, 1:].astype(jnp.float32)
    return (nll * m).sum() / jnp.maximum(m.sum(), 1.0)


def _tp_lm_loss(
    params_local,
    lora,
    cfg_local,
    tokens,
    loss_mask,
    positions,
    segment_ids,
    remat: bool,
    axis: str,
):
    """lm_loss inside a TP shard_map: the forward runs on per-device local
    weights with a psum reduce_fn, and the returned logits cover only this
    device's lm_head vocab shard — the softmax normalizer and the target
    logit are assembled with collectives (exact global cross entropy)."""
    logits = train_forward(
        params_local, cfg_local, tokens[:, :-1], lora=lora, remat=remat,
        positions=None if positions is None else positions[:, :-1],
        segment_ids=None if segment_ids is None else segment_ids[:, :-1],
        reduce_fn=lambda t: jax.lax.psum(t, axis),
    )
    lg = logits.astype(jnp.float32)  # [B, S-1, V_local]
    v_local = lg.shape[-1]
    # Globally-stable logsumexp: the shared max is a constant wrt the
    # gradient (d lse / d m = 0 analytically).  pmax has no AD rule, so
    # the global max rides an all_gather over a stop_gradient'd operand
    # ([B, S-1] — tiny next to the logits).
    m = jnp.max(
        jax.lax.all_gather(jax.lax.stop_gradient(lg.max(axis=-1)), axis),
        axis=0,
    )
    lse = (
        jnp.log(jax.lax.psum(jnp.exp(lg - m[..., None]).sum(axis=-1), axis)) + m
    )
    targets = tokens[:, 1:]
    local_idx = targets - jax.lax.axis_index(axis) * v_local
    in_shard = (local_idx >= 0) & (local_idx < v_local)
    picked = jnp.take_along_axis(
        lg, jnp.clip(local_idx, 0, v_local - 1)[..., None], axis=-1
    )[..., 0]
    target_logit = jax.lax.psum(jnp.where(in_shard, picked, 0.0), axis)
    nll = lse - target_logit
    w = loss_mask[:, 1:].astype(jnp.float32)
    return (nll * w).sum() / jnp.maximum(w.sum(), 1.0)


def make_train_step(
    cfg: LlamaConfig,
    optimizer: optax.GradientTransformation,
    remat: bool = False,
    mesh=None,
    data_axis: str = "dp",
    model_axis: str = "tp",
    accum_steps: int = 1,
):
    """Build ``step(params, lora, opt_state, tokens, loss_mask=None) ->
    (lora, opt_state, loss)``, jit-compiled.

    With ``mesh``, ``tokens``/``loss_mask`` are consumed shard-wise over
    ``data_axis`` (global batch must divide the axis size); adapters,
    base params, and optimizer state are replicated.

    A TP-SHARDED checkpoint (``cfg.tp_shards > 1`` — quantize with
    ``tp_shards=tp`` or ``repack_tp`` first) plus a mesh whose
    ``model_axis`` matches turns on TENSOR-PARALLEL training
    (fine-tuning models bigger than one chip): the base packed
    weights shard exactly like serving (``parallel.tp.param_specs``),
    adapters
    shard per :func:`lora_partition_specs`, the loss is an exact global
    cross entropy over the vocab-sharded lm_head, and replicated adapter
    leaves' gradients are psum'd over tp before the (replicated)
    optimizer update.  Composes with ``data_axis`` (dp x tp) and
    ``accum_steps``.

    ``accum_steps > 1`` splits the batch into that many microbatches and
    runs them sequentially under ``lax.scan``, averaging gradients before
    ONE optimizer update — activation memory scales with the microbatch,
    so the effective batch is bounded by HBM only through ``B / accum``.
    The batch (per-shard batch, under a mesh) must divide evenly; as with
    data parallelism, a masked loss averages per-microbatch means, so
    weight microbatches evenly for exact global-mean semantics.
    """

    # TP training keys off the CHECKPOINT being tp-sharded, not off the
    # mesh alone: make_mesh(dp=N) leaves a size->1 tp axis behind, and a
    # tp_shards=1 checkpoint on such a mesh must keep plain dp training
    # (params replicated, tp devices redundant) — the serving Engine uses
    # the same convention.
    tp = 1
    if mesh is not None and model_axis in mesh.shape and cfg.tp_shards > 1:
        tp = mesh.shape[model_axis]
        assert tp in (1, cfg.tp_shards), (
            f"checkpoint tp_shards={cfg.tp_shards} but mesh {model_axis}="
            f"{tp}: repack_tp the checkpoint or resize the mesh"
        )

    def grads_of(params, lora, tokens, loss_mask, positions, segment_ids):
        return jax.value_and_grad(
            lambda lo: lm_loss(
                params, lo, cfg, tokens, loss_mask, remat=remat,
                positions=positions, segment_ids=segment_ids,
            )
        )(lora)

    if tp > 1:
        from ..parallel.tp import localize_params, param_specs, tp_local_config

        assert cfg.vocab_size % tp == 0, (
            f"vocab {cfg.vocab_size} % tp {tp} != 0 (lm_head is vocab-sharded)"
        )
        # A PACKED lm_head pads out_features to 128 lanes; unless the vocab
        # shards are 128-aligned, device boundaries fall inside the padding
        # and the global cross entropy would silently index wrong vocab
        # entries (local_idx assumes contiguous vocab/tp starts).
        assert not cfg.quantize_lm_head or cfg.vocab_size % (tp * 128) == 0, (
            f"quantize_lm_head under tp={tp} needs vocab_size % {tp * 128} "
            f"== 0 (got {cfg.vocab_size}) so packed-lane shard boundaries "
            "match vocab shard boundaries"
        )
        cfg_local = tp_local_config(cfg, tp, model_axis)
        da = (
            data_axis
            if data_axis in mesh.shape and mesh.shape[data_axis] > 1
            else None
        )

        def loss_and_grads(params, lora, tokens, loss_mask, positions, segs):
            assert lora.tp_basis == cfg.tp_shards, (
                f"adapter tp_basis={lora.tp_basis} != cfg.tp_shards="
                f"{cfg.tp_shards}: init_lora against the tp-repacked cfg "
                "(a tp_shards=1 adapter's fused rows are interleaved "
                "differently and would silently train wrong channels)"
            )
            p_local = localize_params(params, tp, cfg.moe_shard)
            lspecs = lora_partition_specs(lora, model_axis)
            rep = _lora_replicated_mask(lora)

            def tp_grads(params, lora, tokens, loss_mask, positions, segs):
                loss, grads = jax.value_and_grad(
                    lambda lo: _tp_lm_loss(
                        params, lo, cfg_local, tokens, loss_mask,
                        positions, segs, remat, model_axis,
                    )
                )(lora)
                grads = jax.tree.map(
                    lambda g, r: jax.lax.psum(g, model_axis) if r else g,
                    grads,
                    rep,
                )
                if da is not None:
                    loss = jax.lax.pmean(loss, da)
                    grads = jax.lax.pmean(grads, da)
                return loss, grads

            return jax.shard_map(
                tp_grads,
                mesh=mesh,
                in_specs=(
                    param_specs(p_local, model_axis, cfg.moe_shard), lspecs,
                    P(da, None), P(da, None), P(da, None), P(da, None),
                ),
                out_specs=(P(), lspecs),
                check_vma=False,
            )(p_local, lora, tokens, loss_mask, positions, segs)

    elif mesh is None:
        loss_and_grads = grads_of
    else:

        def sharded_grads(params, lora, tokens, loss_mask, positions, segs):
            loss, grads = grads_of(params, lora, tokens, loss_mask, positions, segs)
            # Equal shard sizes => pmean of per-shard means IS the global
            # mean (exactly, for the unmasked loss; for masked losses each
            # shard's mask-weighted mean is pmean'd — weight shards evenly).
            loss = jax.lax.pmean(loss, data_axis)
            grads = jax.lax.pmean(grads, data_axis)
            return loss, grads

        def loss_and_grads(params, lora, tokens, loss_mask, positions, segs):
            return jax.shard_map(
                sharded_grads,
                mesh=mesh,
                in_specs=(
                    P(), P(), P(data_axis), P(data_axis),
                    P(data_axis), P(data_axis),
                ),
                out_specs=(P(), P()),
                check_vma=False,
            )(params, lora, tokens, loss_mask, positions, segs)

    def accum_loss_and_grads(params, lora, tokens, loss_mask, positions, segs):
        b, s = tokens.shape
        assert b % accum_steps == 0, (
            f"batch {b} must divide accum_steps {accum_steps}"
        )
        micro = jax.tree.map(
            lambda a: a.reshape(accum_steps, b // accum_steps, s),
            (tokens, loss_mask, positions, segs),
        )

        def body(acc, mb):
            t, m, p, sg = mb
            loss, grads = loss_and_grads(params, lora, t, m, p, sg)
            acc_loss, acc_grads = acc
            return (
                acc_loss + loss,
                jax.tree.map(jnp.add, acc_grads, grads),
            ), None

        zeros = jax.tree.map(jnp.zeros_like, lora)
        (loss, grads), _ = jax.lax.scan(
            body, (jnp.zeros((), jnp.float32), zeros), micro
        )
        inv = 1.0 / accum_steps
        return loss * inv, jax.tree.map(lambda g: g * inv, grads)

    total = accum_loss_and_grads if accum_steps > 1 else loss_and_grads
    # The plain single-device, accum=1 path keeps None optionals None (no
    # masking/packing overhead); the mesh and scan paths need concrete
    # arrays (uniform shard specs / scan xs), so defaults are materialized
    # — all-ones mask, slot-index positions, all-zero segments are exactly
    # the unpacked semantics.
    materialize = mesh is not None or accum_steps > 1

    @jax.jit
    def step(
        params, lora, opt_state, tokens,
        loss_mask=None, positions=None, segment_ids=None,
    ):
        if materialize:
            b, s = tokens.shape
            if loss_mask is None:
                loss_mask = jnp.ones((b, s), jnp.float32)
            if positions is None:
                positions = jnp.broadcast_to(
                    jnp.arange(s, dtype=jnp.int32), (b, s)
                )
            if segment_ids is None:
                segment_ids = jnp.zeros((b, s), jnp.int32)
        loss, grads = total(
            params, lora, tokens, loss_mask, positions, segment_ids
        )
        updates, opt_state = optimizer.update(grads, opt_state, lora)
        return optax.apply_updates(lora, updates), opt_state, loss

    return step
