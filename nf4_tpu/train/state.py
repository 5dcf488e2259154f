"""Resumable training state: one-file save/restore of a fine-tuning run.

The reference ecosystem's training loops (Unsloth / PEFT over bnb NF4)
lean on HF ``Trainer`` checkpoints for crash recovery; this framework's
train step is a bare optax loop, so resume support lives here.  A train
state is (adapters, optimizer state, step counter) — the multi-GB frozen
base checkpoint is deliberately NOT part of it (it never changes; it is
shared across every run and already has its own packed save/load in
``models.loader``).

Design: the optimizer-state pytree is serialized leaf-by-leaf and
restored against a template built by ``optimizer.init(lora)`` — the
treedef is never pickled, so files stay plain ``.npz`` (no arbitrary
code execution on load) and remain loadable across optax versions as
long as the optimizer produces the same leaf sequence (count + shapes
are checked, with a clear error otherwise).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .lora import LoraConfig, LoraParams, load_lora, save_lora

__all__ = ["save_train_state", "load_train_state"]

_FMT = 1


def save_train_state(
    path: str,
    lora: LoraParams,
    lcfg: LoraConfig,
    opt_state: Any,
    step: int = 0,
) -> None:
    """Write adapters + optimizer state + step counter to ``path``.

    Two sibling files: ``path`` holds the optimizer leaves and metadata,
    ``path + ".lora.npz"`` holds the adapters in the standard
    :func:`~nf4_tpu.train.lora.save_lora` format (so a train-state
    checkpoint is ALSO a servable adapter file — ``load_lora`` on it
    works without the optimizer half).
    """
    save_lora(path + ".lora.npz", lora, lcfg)
    leaves = jax.tree.leaves(opt_state)
    arrays = {
        "__fmt__": np.int64(_FMT),
        "__step__": np.int64(step),
        "__n_leaves__": np.int64(len(leaves)),
    }
    for i, leaf in enumerate(leaves):
        arrays[f"leaf_{i}"] = np.asarray(leaf)
    np.savez(path, **arrays)


def load_train_state(
    path: str,
    optimizer: optax.GradientTransformation,
) -> Tuple[LoraParams, LoraConfig, Any, int]:
    """Inverse of :func:`save_train_state`.

    ``optimizer`` must be the same transformation used when saving: its
    ``init`` on the restored adapters rebuilds the state's tree
    structure, and the saved leaves are poured back in positionally.
    Returns ``(lora, lcfg, opt_state, step)`` ready to resume
    ``step(params, lora, opt_state, ...)`` exactly where it left off.
    """
    lora, lcfg = load_lora(path + ".lora.npz")
    with np.load(path) as z:
        fmt = int(z["__fmt__"])
        if fmt != _FMT:
            raise ValueError(f"unknown train-state format {fmt} (expected {_FMT})")
        step = int(z["__step__"])
        n = int(z["__n_leaves__"])
        saved = [z[f"leaf_{i}"] for i in range(n)]
    template = optimizer.init(lora)
    t_leaves, treedef = jax.tree.flatten(template)
    if len(t_leaves) != n:
        raise ValueError(
            f"optimizer state has {len(t_leaves)} leaves but the checkpoint "
            f"has {n} — pass the SAME optax transformation used at save time"
        )
    leaves = []
    for i, (t, s) in enumerate(zip(t_leaves, saved)):
        t_shape = jnp.shape(t)
        if tuple(t_shape) != tuple(s.shape):
            raise ValueError(
                f"optimizer-state leaf {i} shape mismatch: checkpoint "
                f"{tuple(s.shape)} vs optimizer {tuple(t_shape)} — adapter "
                "config or optimizer differs from save time"
            )
        leaves.append(jnp.asarray(s, dtype=jnp.asarray(t).dtype))
    return lora, lcfg, jax.tree.unflatten(treedef, leaves), step
