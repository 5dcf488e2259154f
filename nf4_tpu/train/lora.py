"""LoRA adapters over frozen packed-NF4 weights (the QLoRA recipe).

The reference kernel's downstream consumer is Unsloth's 4-bit LoRA
fine-tuning (reference ``README.md:3``); this module is the TPU-native
version of that contract: the NF4 base weights stay packed and frozen
(``ops.matmul.nf4_matmul``'s custom VJP propagates gradients to
activations only), and training updates low-rank ``B @ A`` deltas added
to the adapted projections' outputs.

Design notes:

* Adapters live in the model's FUSED row basis (``wqkv`` = interleaved
  [q;k;v], ``w_gateup`` = [gate;up] — ``models.llama.fuse_rows``): one
  adapter per fused projection means two extra skinny matmuls per group,
  matching the base stack's one-kernel-per-group shape discipline.
* A is ``N(0, 1/in)``, B is zeros — the delta starts exactly 0, so an
  adapted model is bit-identical to the base model at step 0 (tested).
* Parameters are fp32 (optimizer precision); the apply path casts to the
  activation dtype (bf16) per use — the QLoRA convention.
* ``merge_lora`` folds trained deltas back into the packed weights
  (dequantize → add → requantize, one layer at a time on host), so
  adapted models serve through every production path (TP, int8-recode,
  speculative) with zero adapter overhead.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..models.llama import LlamaConfig, LlamaParams
from ..nf4.format import PackedNF4, quantize_for_tpu

__all__ = [
    "LoraConfig",
    "LoraAB",
    "LoraLayer",
    "LoraParams",
    "init_lora",
    "stack_adapters",
    "merge_lora",
    "save_lora",
    "load_lora",
]

_TARGETS = ("wqkv", "wo", "w_gateup", "w_down")
_TARGET_FIELD = {"wqkv": "qkv", "wo": "o", "w_gateup": "gateup", "w_down": "down"}


@dataclasses.dataclass(frozen=True)
class LoraConfig:
    """Adapter hyper-parameters (hashable; safe as a jit static arg)."""

    rank: int = 8
    alpha: float = 16.0
    # Which projections get adapters, by LayerParams field name.
    targets: Tuple[str, ...] = _TARGETS

    @property
    def scaling(self) -> float:
        return self.alpha / self.rank

    def __post_init__(self):
        bad = set(self.targets) - set(_TARGETS)
        if bad:
            raise ValueError(f"unknown LoRA targets {sorted(bad)}; pick from {_TARGETS}")


@struct.dataclass
class LoraAB:
    """One projection's low-rank pair: ``delta(x) = (x @ A^T) @ B^T * scaling``."""

    a: jax.Array  # [r, in]  (stacked: [L, r, in])
    b: jax.Array  # [out, r] (stacked: [L, out, r])
    scaling: float = struct.field(pytree_node=False)


@struct.dataclass
class LoraLayer:
    """Per-layer adapters; ``None`` = projection not adapted."""

    qkv: Optional[LoraAB] = None
    o: Optional[LoraAB] = None
    gateup: Optional[LoraAB] = None
    down: Optional[LoraAB] = None


@struct.dataclass
class LoraParams:
    """The trainable pytree: stacked per-layer adapters ([L, ...] leaves).

    ``tp_basis`` records the ``cfg.tp_shards`` the adapters were
    initialized against: the fused projections' OUT-row order is
    interleaved per shard (models.llama.fuse_rows), so A/B matrices of
    different bases have identical shapes but mean different output
    channels — the field lets the TP trainer and merge_lora refuse a
    silent basis mismatch instead of corrupting quietly."""

    layers: LoraLayer
    tp_basis: int = struct.field(pytree_node=False, default=1)

    @property
    def num_params(self) -> int:
        return sum(x.size for x in jax.tree.leaves(self))


def _target_dims(cfg: LlamaConfig, name: str) -> Tuple[int, int]:
    """(out_features, in_features) of each adaptable projection."""
    return {
        "wqkv": (cfg.q_dim + 2 * cfg.kv_dim, cfg.hidden_size),
        "wo": (cfg.hidden_size, cfg.q_dim),
        "w_gateup": (2 * cfg.intermediate_size, cfg.hidden_size),
        "w_down": (cfg.hidden_size, cfg.intermediate_size),
    }[name]


def init_lora(cfg: LlamaConfig, lcfg: LoraConfig, seed: int = 0) -> LoraParams:
    """Initialize stacked adapters for every layer: A gaussian, B zero."""
    if cfg.num_experts > 1 and (
        "w_gateup" in lcfg.targets or "w_down" in lcfg.targets
    ):
        raise ValueError(
            "LoRA on MoE expert MLPs is not supported; use "
            "LoraConfig(targets=('wqkv', 'wo'))"
        )
    rng = np.random.default_rng(seed)
    L, r = cfg.num_layers, lcfg.rank
    fields = {}
    for name in _TARGETS:
        if name not in lcfg.targets:
            fields[_TARGET_FIELD[name]] = None
            continue
        out_d, in_d = _target_dims(cfg, name)
        a = rng.standard_normal((L, r, in_d)).astype(np.float32) * (in_d**-0.5)
        fields[_TARGET_FIELD[name]] = LoraAB(
            a=jnp.asarray(a),
            b=jnp.zeros((L, out_d, r), dtype=jnp.float32),
            scaling=lcfg.scaling,
        )
    return LoraParams(layers=LoraLayer(**fields), tp_basis=cfg.tp_shards)


def stack_adapters(loras) -> LoraParams:
    """Stack independent adapter sets into one multi-LoRA BANK.

    Input: a sequence of :class:`LoraParams` (each with ``[L, ...]``
    leaves, e.g. from :func:`init_lora` / :func:`load_lora` — possibly
    different ranks and scalings).  Output: one LoraParams whose leaves
    carry an adapter axis — ``a: [L, A, r_max, in]``, ``b: [L, A, out,
    r_max]`` — suitable for per-request adapter serving
    (``serve.engine.Engine(lora_bank=...)``).

    Normalizations that make the bank uniform without changing any
    adapter's function:

    * each adapter's ``scaling`` is folded into its ``a`` (the delta is
      linear in A), so the bank's scaling is exactly 1.0;
    * ranks are zero-padded to the max rank (zero A rows contribute 0);
    * a projection adapted by only SOME adapters gets all-zero pairs for
      the others (delta 0 == not adapted).
    """
    loras = list(loras)
    assert loras, "stack_adapters needs at least one adapter"
    bases = {lo.tp_basis for lo in loras}
    assert len(bases) == 1, (
        f"adapters were initialized against different tp_shards bases "
        f"{sorted(bases)} — their fused-row layouts are incompatible"
    )

    def bank_for(name: str):
        abs_ = [getattr(lo.layers, name) for lo in loras]
        if all(ab is None for ab in abs_):
            return None
        # Dims from any present pair; L/in/out agree (same base model).
        ref = next(ab for ab in abs_ if ab is not None)
        L, _, in_d = ref.a.shape
        out_d = ref.b.shape[1]
        rmax = max(ab.a.shape[1] for ab in abs_ if ab is not None)
        a_rows, b_rows = [], []
        for ab in abs_:
            if ab is None:
                a_rows.append(jnp.zeros((L, rmax, in_d), jnp.float32))
                b_rows.append(jnp.zeros((L, out_d, rmax), jnp.float32))
                continue
            r = ab.a.shape[1]
            a = ab.a.astype(jnp.float32) * jnp.float32(ab.scaling)
            b = ab.b.astype(jnp.float32)
            if r < rmax:
                a = jnp.pad(a, ((0, 0), (0, rmax - r), (0, 0)))
                b = jnp.pad(b, ((0, 0), (0, 0), (0, rmax - r)))
            a_rows.append(a)
            b_rows.append(b)
        return LoraAB(
            a=jnp.stack(a_rows, axis=1),  # [L, A, rmax, in]
            b=jnp.stack(b_rows, axis=1),  # [L, A, out, rmax]
            scaling=1.0,
        )

    return LoraParams(
        layers=LoraLayer(
            **{f: bank_for(f) for f in ("qkv", "o", "gateup", "down")}
        ),
        tp_basis=loras[0].tp_basis,
    )


def save_lora(path: str, lora: LoraParams, lcfg: LoraConfig) -> None:
    """Write adapters + config to one ``.npz`` (tiny — rank-r pairs only;
    the multi-GB base checkpoint is shared across every adapter set, the
    same separation bitsandbytes/PEFT users get from ``save_pretrained``
    on an adapter)."""
    arrays = {
        "__rank__": np.int64(lcfg.rank),
        "__alpha__": np.float64(lcfg.alpha),
        "__tp_basis__": np.int64(lora.tp_basis),
    }
    targets = []
    for name in _TARGETS:
        ab = getattr(lora.layers, _TARGET_FIELD[name])
        if ab is None:
            continue
        targets.append(name)
        arrays[f"{name}.a"] = np.asarray(ab.a)
        arrays[f"{name}.b"] = np.asarray(ab.b)
    arrays["__targets__"] = np.asarray(targets)
    np.savez(path, **arrays)


def load_lora(path: str) -> Tuple[LoraParams, LoraConfig]:
    """Inverse of :func:`save_lora`; adapters come back fp32 on device."""
    with np.load(path) as z:
        targets = tuple(str(t) for t in z["__targets__"])
        lcfg = LoraConfig(
            rank=int(z["__rank__"]), alpha=float(z["__alpha__"]), targets=targets
        )
        tp_basis = int(z["__tp_basis__"]) if "__tp_basis__" in z else 1
        fields = {}
        for name in _TARGETS:
            if name not in targets:
                fields[_TARGET_FIELD[name]] = None
                continue
            fields[_TARGET_FIELD[name]] = LoraAB(
                a=jnp.asarray(z[f"{name}.a"]),
                b=jnp.asarray(z[f"{name}.b"]),
                scaling=lcfg.scaling,
            )
    return LoraParams(layers=LoraLayer(**fields), tp_basis=tp_basis), lcfg


def _layer_weight(pw: PackedNF4, layer: int) -> PackedNF4:
    """Per-layer view of a stacked ([L, ...]-leaf) packed weight."""
    return pw.replace(packed=pw.packed[layer], scales=pw.scales[layer])


def merge_lora(
    params: LlamaParams,
    lora: LoraParams,
    cfg: LlamaConfig,
    quantize: bool = True,
    method: str = "auto",
) -> LlamaParams:
    """Fold adapters into the base weights: ``W' = W + scaling * B @ A``.

    ``quantize=True`` requantizes each merged weight back to packed NF4
    (keeping its shard count), one layer at a time on host — peak extra
    memory is a single dense projection.  The requantization moves merged
    values to the nearest point of the new NF4 grid: a quantization-cell
    rounding, the same error class as quantizing a fine-tuned dense
    checkpoint.  ``quantize=False`` returns dense ``cfg.dtype`` weights
    (useful for exact-merge tests and bf16 serving).

    The merged model needs no LoRA at inference: serve it through any
    path, including tensor parallelism and int8 recode.
    """
    from ..ops.dequant import dequantize

    assert lora.tp_basis == cfg.tp_shards, (
        f"adapter tp_basis={lora.tp_basis} but cfg.tp_shards="
        f"{cfg.tp_shards}: the fused-row interleave differs — merge with "
        "the cfg the adapter was trained against, then repack_tp"
    )
    merged_layers = []
    for l in range(cfg.num_layers):
        new = {}
        for name in _TARGETS:
            pw = getattr(params.layers, name)
            ab = getattr(lora.layers, _TARGET_FIELD[name])
            pw_l = _layer_weight(pw, l) if isinstance(pw, PackedNF4) else pw[l]
            if ab is None:
                new[name] = pw_l
                continue
            if isinstance(pw_l, PackedNF4):
                w = np.asarray(dequantize(pw_l, dtype=jnp.float32))
            else:
                w = np.asarray(pw_l, dtype=np.float32)
            delta = ab.scaling * (
                np.asarray(ab.b[l], np.float32) @ np.asarray(ab.a[l], np.float32)
            )
            merged = w + delta
            if quantize:
                shards = pw_l.shards if isinstance(pw_l, PackedNF4) else 1
                qt = (
                    pw_l.quant_type
                    if isinstance(pw_l, PackedNF4)
                    else cfg.quant_type
                )
                new[name] = quantize_for_tpu(
                    merged, dtype=cfg.dtype, shards=shards, method=method,
                    quant_type=qt,
                )
            else:
                new[name] = jnp.asarray(merged, dtype=cfg.dtype)
        merged_layers.append(
            params.layers.replace(
                wqkv=new["wqkv"],
                wo=new["wo"],
                w_gateup=new["w_gateup"],
                w_down=new["w_down"],
                input_norm=params.layers.input_norm[l],
                post_attn_norm=params.layers.post_attn_norm[l],
                qkv_bias=(
                    None
                    if params.layers.qkv_bias is None
                    else params.layers.qkv_bias[l]
                ),
            )
        )
    stacked = jax.tree.map(
        lambda *xs: jnp.stack(xs)
        if isinstance(xs[0], jax.Array)
        else xs[0].replace(
            packed=jnp.stack([x.packed for x in xs]),
            scales=jnp.stack([x.scales for x in xs]),
        ),
        *merged_layers,
        is_leaf=lambda x: isinstance(x, PackedNF4),
    )
    return params.replace(layers=stacked)
