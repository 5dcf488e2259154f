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
from .lora import LoraParams

__all__ = ["lm_loss", "make_train_step"]


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


def make_train_step(
    cfg: LlamaConfig,
    optimizer: optax.GradientTransformation,
    remat: bool = False,
    mesh=None,
    data_axis: str = "dp",
    accum_steps: int = 1,
):
    """Build ``step(params, lora, opt_state, tokens, loss_mask=None) ->
    (lora, opt_state, loss)``, jit-compiled.

    With ``mesh``, ``tokens``/``loss_mask`` are consumed shard-wise over
    ``data_axis`` (global batch must divide the axis size); adapters,
    base params, and optimizer state are replicated.

    ``accum_steps > 1`` splits the batch into that many microbatches and
    runs them sequentially under ``lax.scan``, averaging gradients before
    ONE optimizer update — activation memory scales with the microbatch,
    so the effective batch is bounded by HBM only through ``B / accum``.
    The batch (per-shard batch, under a mesh) must divide evenly; as with
    data parallelism, a masked loss averages per-microbatch means, so
    weight microbatches evenly for exact global-mean semantics.
    """

    def grads_of(params, lora, tokens, loss_mask, positions, segment_ids):
        return jax.value_and_grad(
            lambda lo: lm_loss(
                params, lo, cfg, tokens, loss_mask, remat=remat,
                positions=positions, segment_ids=segment_ids,
            )
        )(lora)

    if mesh is None:
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
