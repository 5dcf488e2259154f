"""QLoRA-style fine-tuning on frozen NF4 weights.

The reference package exists to accelerate exactly this workflow — its
dequantization kernel feeds Unsloth's 4-bit LoRA fine-tuning (reference
``README.md:3``, ``benchmark.py:1-10``); the reference itself contains no
trainer.  This package supplies the TPU-native training loop the ecosystem
role implies: low-rank adapters over the packed weights (``lora``), a
jit-compiled optax training step with optional per-layer rematerialization
and data-parallel sharding (``trainer``), and adapter merging back into
packed checkpoints for TP serving.
"""

from .data import SFTBatch, pack_sft, pad_sft
from .lora import (
    LoraAB,
    LoraConfig,
    LoraLayer,
    LoraParams,
    init_lora,
    load_lora,
    merge_lora,
    save_lora,
    stack_adapters,
)
from .state import load_train_state, save_train_state
from .trainer import lm_loss, lora_partition_specs, make_train_step

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
    "lm_loss",
    "make_train_step",
    "lora_partition_specs",
    "save_train_state",
    "load_train_state",
    "SFTBatch",
    "pad_sft",
    "pack_sft",
]
