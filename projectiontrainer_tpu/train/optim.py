"""Optimizers and schedules replicating the reference's training recipe in optax.

- AdamW (torch defaults: betas 0.9/0.999, eps 1e-8, weight_decay flag, default 0.01).
- Cosine schedule with linear warmup — exact HF ``get_cosine_schedule_with_warmup``
  semantics (used by all reference trainers, e.g. Stage1/projector_trainer.py:91-96);
  warmup steps = ``ceil(warmup_ratio * max_steps)``.
- Gradient clipping: global-norm over trainables (Stage 1, 5.0) or *per top-level module*
  (Stage 2, 1.0 per module — reference clips each trainable module separately,
  Stage2/trainer.py:427-439).
- Gradient accumulation via ``optax.MultiSteps`` (replaces ``accelerator.accumulate``).
- Frozen subtrees get ``optax.set_to_zero`` through ``multi_transform`` — no optimizer
  state, and XLA prunes their backward graph.
"""

from __future__ import annotations

import math
from typing import Mapping, Optional

import jax
import jax.numpy as jnp
import optax

from projectiontrainer_tpu.core.pytree import path_str
from projectiontrainer_tpu.train import masks as M


def cosine_schedule_with_warmup(
    base_lr: float, *, warmup_ratio: float, total_steps: int, num_cycles: float = 0.5,
    warmup_rounding: str = "ceil"
) -> optax.Schedule:
    """``warmup_rounding``: the reference computes warmup steps per stage — stages 1/2
    use ``math.ceil(ratio * max_steps)`` (Stage1/projector_trainer.py:87,
    Stage2/trainer.py:157) while stage 0 uses ``int(...)`` i.e. floor
    (Stage0/train_vision_encoder_stage0.py:598) — an off-by-one LR difference whenever
    the product is fractional."""
    rounding = {"ceil": math.ceil, "floor": math.floor}[warmup_rounding]
    warmup_steps = rounding(warmup_ratio * total_steps)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(1.0, warmup_steps)
        progress = (step - warmup_steps) / jnp.maximum(1.0, total_steps - warmup_steps)
        cos = jnp.maximum(0.0, 0.5 * (1.0 + jnp.cos(jnp.pi * 2.0 * num_cycles * progress)))
        return base_lr * jnp.where(step < warmup_steps, warm, cos)

    return schedule


def clip_by_module_norm(max_norm: float) -> optax.GradientTransformation:
    """Clip the global norm of each top-level param group (first path component)
    independently — the Stage-2 per-module clipping semantics."""

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        # group norms keyed by first path segment
        sq = {}
        for path, leaf in jax.tree_util.tree_leaves_with_path(updates):
            group = path_str(path).split("/", 1)[0]
            sq.setdefault(group, []).append(jnp.sum(jnp.square(leaf.astype(jnp.float32))))
        norms = {g: jnp.sqrt(sum(v)) for g, v in sq.items()}

        def scale(path, leaf):
            g = path_str(path).split("/", 1)[0]
            factor = jnp.minimum(1.0, max_norm / (norms[g] + 1e-6))
            return (leaf.astype(jnp.float32) * factor).astype(leaf.dtype)

        return jax.tree_util.tree_map_with_path(scale, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def adamw_with_schedule(
    lr: float,
    *,
    total_steps: int,
    warmup_ratio: float = 0.0,
    weight_decay: float = 0.01,
    clip_norm: Optional[float] = None,
    clip_per_module: bool = False,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    warmup_rounding: str = "ceil",
    schedule_kind: str = "cosine",
) -> tuple[optax.GradientTransformation, optax.Schedule]:
    if schedule_kind == "constant":
        # cls_evaluate trains at a CONSTANT lr — AdamW is built without any scheduler
        # and run_training_loop never steps one (cls_evaluate/train_utils.py:257-261)
        schedule = lambda step: jnp.asarray(lr, jnp.float32)  # noqa: E731
    elif schedule_kind == "cosine":
        schedule = cosine_schedule_with_warmup(
            lr, warmup_ratio=warmup_ratio, total_steps=total_steps,
            warmup_rounding=warmup_rounding)
    else:
        raise ValueError(f"schedule_kind must be 'cosine' or 'constant', got {schedule_kind!r}")
    chain = []
    if clip_norm is not None:
        chain.append(
            clip_by_module_norm(clip_norm) if clip_per_module
            else optax.clip_by_global_norm(clip_norm)
        )
    chain.append(optax.adamw(schedule, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay))
    return optax.chain(*chain), schedule


def masked_optimizer(
    labels: Mapping,
    tx_by_label: Mapping[str, optax.GradientTransformation],
    *,
    accum_steps: int = 1,
) -> optax.GradientTransformation:
    """multi_transform over a label pytree; unknown labels are frozen. Wraps the whole
    thing in MultiSteps when accumulating (updates apply every ``accum_steps`` calls,
    averaged — matching loss/accum scaling in the reference)."""
    transforms = dict(tx_by_label)
    transforms.setdefault(M.FROZEN, optax.set_to_zero())
    tx = optax.multi_transform(transforms, labels)
    if accum_steps > 1:
        tx = _float_safe_multi_steps(tx, accum_steps)
    return tx


def _float_safe_multi_steps(tx, accum_steps: int) -> optax.GradientTransformation:
    """``optax.MultiSteps`` whose gradient accumulator is always float.

    MultiSteps inits ``acc_grads = zeros_like(params)``; with an int8-quantized QLoRA
    base the int8 leaves make the accumulation cond's branches disagree (running-mean
    math promotes to f32, the emit branch returns int8 zeros) and jit fails. Frozen
    integer leaves carry no gradient anyway — store their accumulator slots as f32.
    """
    ms = optax.MultiSteps(tx, every_k_schedule=accum_steps)

    def init_fn(params):
        state = ms.init(params)
        acc = jax.tree.map(
            lambda x: x if jnp.issubdtype(x.dtype, jnp.inexact)
            else jnp.zeros(x.shape, jnp.float32),
            state.acc_grads,
        )
        return state._replace(acc_grads=acc)

    return optax.GradientTransformation(init_fn, ms.update)


def single_group_optimizer(
    labels: Mapping,
    lr: float,
    *,
    total_steps: int,
    warmup_ratio: float = 0.0,
    weight_decay: float = 0.01,
    clip_norm: Optional[float] = None,
    clip_per_module: bool = False,
    accum_steps: int = 1,
    warmup_rounding: str = "ceil",
):
    """The common case: one trainable group + frozen rest. Returns (tx, schedule)."""
    tx, schedule = adamw_with_schedule(
        lr, total_steps=total_steps, warmup_ratio=warmup_ratio,
        weight_decay=weight_decay, clip_norm=clip_norm, clip_per_module=clip_per_module,
        warmup_rounding=warmup_rounding,
    )
    return masked_optimizer(labels, {M.TRAINABLE: tx}, accum_steps=accum_steps), schedule


def discriminative_optimizer(
    labels: Mapping,
    *,
    head_lr: float,
    backbone_lr: float,
    total_steps: int,
    weight_decay: float = 0.01,
    accum_steps: int = 1,
):
    """cls_evaluate's discriminative-LR AdamW: head at ``lr``, backbone at ``bb_lr``
    (reference: cls_evaluate/train_utils.py:219-259). The LRs are CONSTANT — the
    reference builds AdamW with no scheduler and never steps one (:257-261) — so
    there is no warmup knob here."""
    head_tx, head_sched = adamw_with_schedule(
        head_lr, total_steps=total_steps,
        weight_decay=weight_decay, schedule_kind="constant"
    )
    bb_tx, _ = adamw_with_schedule(
        backbone_lr, total_steps=total_steps,
        weight_decay=weight_decay, schedule_kind="constant"
    )
    tx = masked_optimizer(labels, {M.HEAD: head_tx, M.BACKBONE: bb_tx}, accum_steps=accum_steps)
    return tx, head_sched
