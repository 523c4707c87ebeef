"""VLM assembly: vision tower -> projector -> decoder with concatenated embeddings.

Replicates the reference's input construction exactly (semantics change loss values, so
quirks are deliberate — SURVEY §7.3.2):

- Stage 1 (reference: Stage1/projector_trainer.py:167-233): sequence = [visual; caption],
  labels = [-100...; caption ids with pad->-100], attention mask = [ones; caption != pad].
- Stage 2 (reference: Stage2/trainer.py:313-418): sequence = [visual; question; answer],
  labels = [-100; -100; answer with pad->-100], mask analogous.
- Visual tokens are the vision tower's last_hidden_state with token 0 dropped.

All shapes are static: captions are fixed-length (the reference already pads Stage 1 to
512); Stage 2 Q/A land in buckets (data/bucketing.py) instead of dynamic per-batch padding.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp

from projectiontrainer_tpu.models import decoder as dec
from projectiontrainer_tpu.models import projector as proj
from projectiontrainer_tpu.models import siglip

IGNORE_INDEX = -100


@dataclasses.dataclass(frozen=True)
class VLMConfig:
    vision: siglip.VisionConfig
    projector: proj.ProjectorConfig
    llm: dec.DecoderConfig
    drop_first_patch: bool = True  # the reference's "discard CLS" quirk


def num_visual_tokens(cfg: VLMConfig) -> int:
    n = cfg.vision.num_patches
    return n - 1 if cfg.drop_first_patch else n


def init(key, cfg: VLMConfig, dtype=jnp.float32):
    import jax

    kv, kp, kl = jax.random.split(key, 3)
    return {
        "vision": siglip.init_vision(kv, cfg.vision, dtype),
        "projector": proj.init(kp, cfg.projector, dtype),
        "llm": dec.init(kl, cfg.llm, dtype),
    }


def visual_embeds(params, cfg: VLMConfig, pixel_values, *, remat: bool = False):
    """[B,H,W,C] -> projected visual embeddings [B, V, llm_dim]."""
    hidden, _ = siglip.vision_forward(params["vision"], cfg.vision, pixel_values, remat=remat)
    if cfg.drop_first_patch:
        hidden = hidden[:, 1:, :]
    return proj.forward(params["projector"], hidden)


@functools.partial(jax.jit, static_argnames=("cfg",))
def visual_prefix(params, cfg: VLMConfig, pixel_values):
    """Visual-only generation prefix -> (embeds [B,V,D], all-ones mask [B,V]),
    jitted as one program (see question_prefix) — the Stage-1 inference path
    generates from visual embeds alone (Stage1/projector_trainer.py:386-393)."""
    visual = visual_embeds(params, cfg, pixel_values)
    return visual, jnp.ones(visual.shape[:2], jnp.int32)


@functools.partial(jax.jit, static_argnames=("cfg", "pad_token_id"))
def question_prefix(params, cfg: VLMConfig, pixel_values, question_ids,
                    pad_token_id: int):
    """[visual; question] generation prefix -> (embeds [B,P,D], mask [B,P]).

    Jitted as ONE program (configs are frozen dataclasses): inference CLIs and the
    serving worker build this prefix outside any jit, and an eager vision tower +
    embed + concat costs seconds per call in per-op dispatch on the tunneled
    runtime. ``question_ids`` must be LEFT-padded (generation semantics — the
    reference forces padding_side='left', Stage2/trainer.py:499-505)."""
    visual = visual_embeds(params, cfg, pixel_values)
    q_emb = dec.embed(params["llm"], cfg.llm, question_ids).astype(visual.dtype)
    embeds = jnp.concatenate([visual, q_emb], axis=1)
    mask = jnp.concatenate(
        [jnp.ones(visual.shape[:2], jnp.int32),
         (question_ids != pad_token_id).astype(jnp.int32)],
        axis=1,
    )
    return embeds, mask


def build_sequence(
    params,
    cfg: VLMConfig,
    visual: jnp.ndarray,                    # [B, V, D] projected visual embeds
    *,
    pad_token_id: int,
    caption_ids: Optional[jnp.ndarray] = None,   # Stage 1: [B, Tc]
    question_ids: Optional[jnp.ndarray] = None,  # Stage 2: [B, Tq]
    answer_ids: Optional[jnp.ndarray] = None,    # Stage 2: [B, Ta]
):
    """Concat embeds + attention mask + labels for the CLM loss.

    Returns (inputs_embeds, attention_mask, labels). Text segments are embedded through the
    decoder's (possibly scaled) embedding table; gradients flow only where the trainable
    mask allows, so no grad-gating is needed here.
    """
    b, v, _ = visual.shape
    segs_embeds = [visual]
    segs_mask = [jnp.ones((b, v), jnp.int32)]
    segs_labels = [jnp.full((b, v), IGNORE_INDEX, jnp.int32)]

    def text_seg(ids, *, supervised: bool):
        emb = dec.embed(params["llm"], cfg.llm, ids).astype(visual.dtype)
        mask = (ids != pad_token_id).astype(jnp.int32)
        if supervised:
            labels = jnp.where(ids == pad_token_id, IGNORE_INDEX, ids)
        else:
            labels = jnp.full(ids.shape, IGNORE_INDEX, jnp.int32)
        return emb, mask, labels

    if caption_ids is not None:
        e, m, l = text_seg(caption_ids, supervised=True)
        segs_embeds.append(e); segs_mask.append(m); segs_labels.append(l)
    if question_ids is not None:
        e, m, l = text_seg(question_ids, supervised=False)
        segs_embeds.append(e); segs_mask.append(m); segs_labels.append(l)
    if answer_ids is not None:
        e, m, l = text_seg(answer_ids, supervised=True)
        segs_embeds.append(e); segs_mask.append(m); segs_labels.append(l)

    return (
        jnp.concatenate(segs_embeds, axis=1),
        jnp.concatenate(segs_mask, axis=1),
        jnp.concatenate(segs_labels, axis=1),
    )


def forward_logits(params, cfg: VLMConfig, inputs_embeds, attention_mask, *, remat: bool = False):
    hidden, _ = dec.forward(
        params["llm"], cfg.llm, inputs_embeds=inputs_embeds,
        attention_mask=attention_mask, remat=remat,
    )
    return dec.logits(params["llm"], cfg.llm, hidden)
