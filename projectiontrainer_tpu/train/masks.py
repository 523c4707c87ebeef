"""Freezing policies as trainable-mask pytrees.

Every ``requires_grad_`` mutation in the reference becomes a pure function from config to a
bool/label pytree over the params (SURVEY §7.1.4). The optimizer consumes labels via
``optax.multi_transform``; frozen leaves get ``optax.set_to_zero`` so no optimizer state is
allocated for them and XLA dead-code-eliminates their gradient computation entirely.

Policies replicated:
- Stage 1: projector-only (reference: Stage1/projector_trainer.py:114-117).
- Stage 2: any subset {llm | lora, projector, vision}; ``--train_ve_first_epoch`` swaps
  masks at the epoch-0 boundary — two compiled step variants, not runtime branching
  (reference: Stage2/trainer.py:189-246,267-289).
- Stage 0: full SigLIP minus frozen text tower / logit_scale / first-k vision layers
  (reference: Stage0/train_vision_encoder_stage0.py:555-576).
- cls_evaluate: head always trainable; backbone per freeze mode with discriminative LRs
  (reference: cls_evaluate/train_utils.py:219-259,286-308).
"""

from __future__ import annotations

import dataclasses
from typing import Mapping

import jax

from projectiontrainer_tpu.core.pytree import path_str

FROZEN = "frozen"
TRAINABLE = "trainable"


def _labels(tree, fn):
    return jax.tree_util.tree_map_with_path(lambda p, _: fn(path_str(p)), tree)


def stage1_labels(params) -> Mapping:
    """Train the projector; freeze vision tower and LLM."""
    return _labels(params, lambda p: TRAINABLE if p.startswith("projector/") else FROZEN)


@dataclasses.dataclass(frozen=True)
class Stage2Freeze:
    """Derived freeze policy (reference: Stage2/train_vqa_stage2.py:121-134)."""

    train_llm: bool = True          # full LLM fine-tune (ignored when use_lora)
    use_lora: bool = False          # LoRA adapters are the only trainable LLM params
    train_projector: bool = False   # --unfreeze_projection_layer
    train_vision: bool = False      # epoch-0 state of --train_ve_first_epoch


def stage2_labels(params, policy: Stage2Freeze) -> Mapping:
    def fn(p: str) -> str:
        if p.startswith("projector/"):
            return TRAINABLE if policy.train_projector else FROZEN
        if p.startswith("vision/"):
            return TRAINABLE if policy.train_vision else FROZEN
        if "/lora/" in p or p.startswith("lora/"):
            return TRAINABLE if policy.use_lora else FROZEN
        if p.startswith("llm/"):
            return TRAINABLE if (policy.train_llm and not policy.use_lora) else FROZEN
        return FROZEN

    return _labels(params, fn)


def stage0_labels(
    params,
    *,
    freeze_text: bool = True,
    freeze_logit_scale: bool = True,
    freeze_layers_ratio: float = 0.0,
    num_vision_layers: int | None = None,
) -> Mapping:
    """Full contrastive model; text tower / logit_scale / first-k vision layers frozen."""
    n_freeze = 0
    if freeze_layers_ratio > 0.0 and num_vision_layers:
        n_freeze = int(num_vision_layers * freeze_layers_ratio)

    def fn(p: str) -> str:
        if p.startswith("text/"):
            return FROZEN if freeze_text else TRAINABLE
        if p.startswith("logit_scale"):
            return FROZEN if freeze_logit_scale else TRAINABLE
        if p.startswith("vision/layers/"):
            layer_idx = int(p.split("/")[2])
            if layer_idx < n_freeze:
                return FROZEN
        return TRAINABLE

    return _labels(params, fn)


HEAD = "head"
BACKBONE = "backbone"


def classifier_labels(params, *, freeze_vision: bool) -> Mapping:
    """Labels {head, backbone, frozen}: head trains at lr, backbone at bb_lr (discriminative
    LRs) or is frozen entirely."""
    def fn(p: str) -> str:
        if p.startswith("vision/"):
            return FROZEN if freeze_vision else BACKBONE
        return HEAD

    return _labels(params, fn)


def bool_mask(labels) -> Mapping:
    """Labels -> bool trainable mask (anything not FROZEN trains)."""
    return jax.tree.map(lambda l: l != FROZEN, labels)
