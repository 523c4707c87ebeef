"""Jitted autoregressive generation from embedding prefixes with a static KV cache.

Powers every reference inference path (SURVEY §3.4): Stage-1 caption generation from
visual-only embeds (Stage1/inference_stage1.py:176-186), Stage-2 VQA generation from
[visual; question] embeds (Stage2/inference_vqa_stage2.py:271-277), and in-training eval
generation (Stage2/trainer.py:596-626, left-padding forced at :499-505).

TPU-first design:
- the cache is a fixed [B, prefix+max_new] buffer; one compilation per (prefix bucket,
  max_new) pair — no dynamic shapes anywhere;
- decode is a ``lax.scan`` over steps with donated carry; done-sequences keep writing pad;
- the prefix is *embeddings* (there may be no prompt ids at all), with left-padded masks
  so the last prefix slot is always the last valid token;
- samplers: greedy, temperature/top-k/top-p sampling with repetition penalty (HF
  semantics), and beam search with HF length-penalty finalization.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from projectiontrainer_tpu.models import decoder as dec

NEG_INF = -1e9


@dataclasses.dataclass(frozen=True)
class GenerationConfig:
    max_new_tokens: int = 64
    do_sample: bool = False
    temperature: float = 1.0
    top_k: Optional[int] = None
    top_p: Optional[float] = None
    repetition_penalty: float = 1.0
    num_beams: int = 1
    length_penalty: float = 1.0
    eos_token_id: Optional[int] = None
    pad_token_id: int = 0


# ---------------------------------------------------------------------------- logit ops


def _apply_repetition_penalty(logits, generated, penalty):
    """HF semantics: previously generated token logits are divided by the penalty when
    positive, multiplied when negative. ``generated`` is [B, L] with pad slots = -1."""
    if penalty == 1.0:
        return logits
    b, v = logits.shape
    onehot = jax.nn.one_hot(jnp.maximum(generated, 0), v, dtype=bool)
    seen = jnp.any(onehot & (generated >= 0)[..., None], axis=1)
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen, penalized, logits)


def _top_k_filter(logits, k):
    vals, _ = jax.lax.top_k(logits, k)
    cutoff = vals[..., -1:]
    return jnp.where(logits < cutoff, NEG_INF, logits)


def _top_p_filter(logits, p):
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep smallest set with cumulative prob >= p (always keep the top token)
    keep_sorted = cum - probs < p
    cutoff_idx = jnp.sum(keep_sorted, axis=-1) - 1
    cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx[..., None], axis=-1)
    return jnp.where(logits < cutoff, NEG_INF, logits)


def _sample_token(logits, cfg: GenerationConfig, generated, key):
    logits = logits.astype(jnp.float32)
    logits = _apply_repetition_penalty(logits, generated, cfg.repetition_penalty)
    if not cfg.do_sample:
        return jnp.argmax(logits, axis=-1)
    if cfg.temperature != 1.0:
        logits = logits / cfg.temperature
    if cfg.top_k:
        logits = _top_k_filter(logits, cfg.top_k)
    if cfg.top_p is not None and cfg.top_p < 1.0:
        logits = _top_p_filter(logits, cfg.top_p)
    return jax.random.categorical(key, logits, axis=-1)


# ---------------------------------------------------------------------------- prefill


def _prefill(params, llm_cfg, inputs_embeds, attention_mask, total_len):
    """Run the prefix through the decoder, filling cache[0:P]. Returns
    (cache, last_logits, prefix_positions_last)."""
    b, p, _ = inputs_embeds.shape
    cache = dec.init_cache(llm_cfg, b, total_len, dtype=inputs_embeds.dtype)
    positions = jnp.maximum(jnp.cumsum(attention_mask, axis=-1) - 1, 0)
    full_mask = jnp.zeros((b, total_len), jnp.int32)
    full_mask = jax.lax.dynamic_update_slice(full_mask, attention_mask.astype(jnp.int32), (0, 0))
    hidden, cache = dec.forward(
        params, llm_cfg, inputs_embeds=inputs_embeds, attention_mask=full_mask,
        positions=positions, cache=cache, q_offset=0,
    )
    logits = dec.logits(params, llm_cfg, hidden[:, -1:, :])[:, 0]
    return cache, logits, positions[:, -1], full_mask


# ---------------------------------------------------------------------------- greedy/sample


def _generate_sample(params, llm_cfg, inputs_embeds, attention_mask, cfg, key):
    b, p, _ = inputs_embeds.shape
    total = p + cfg.max_new_tokens
    cache, logits, last_pos, full_mask = _prefill(
        params, llm_cfg, inputs_embeds, attention_mask, total
    )

    generated0 = jnp.full((b, cfg.max_new_tokens), -1, jnp.int32)
    done0 = jnp.zeros((b,), bool)

    def body(carry, t):
        cache, logits, generated, done, key, full_mask = carry
        key, sub = jax.random.split(key)
        token = _sample_token(logits, cfg, generated, sub).astype(jnp.int32)
        if cfg.eos_token_id is not None:
            token = jnp.where(done, cfg.pad_token_id, token)
        generated = jax.lax.dynamic_update_slice(generated, token[:, None], (0, t))
        if cfg.eos_token_id is not None:
            done = done | (token == cfg.eos_token_id)

        # next step forward
        emb = dec.embed(params, llm_cfg, token[:, None]).astype(inputs_embeds.dtype)
        full_mask = jax.lax.dynamic_update_slice(
            full_mask, jnp.ones((b, 1), jnp.int32), (0, p + t)
        )
        positions = (last_pos + 1 + t)[:, None]
        hidden, cache = dec.forward(
            params, llm_cfg, inputs_embeds=emb, attention_mask=full_mask,
            positions=positions, cache=cache, q_offset=p + t,
        )
        logits = dec.logits(params, llm_cfg, hidden[:, -1:, :])[:, 0]
        return (cache, logits, generated, done, key, full_mask), None

    carry = (cache, logits, generated0, done0, key, full_mask)
    (cache, logits, generated, done, key, full_mask), _ = jax.lax.scan(
        body, carry, jnp.arange(cfg.max_new_tokens)
    )
    # replace the -1 "unwritten" sentinel (shouldn't remain) and pad after eos
    return jnp.where(generated < 0, cfg.pad_token_id, generated)


# ---------------------------------------------------------------------------- beam search


def _generate_beam(params, llm_cfg, inputs_embeds, attention_mask, cfg, key):
    """Standard beam search (deterministic), HF-style length-penalty finalization."""
    del key
    b, p, d = inputs_embeds.shape
    nb = cfg.num_beams
    total = p + cfg.max_new_tokens

    # expand prefix to beams: [B*nb, ...]
    def expand(x):
        return jnp.repeat(x, nb, axis=0)

    cache, logits, last_pos, full_mask = _prefill(
        params, llm_cfg, expand(inputs_embeds), expand(attention_mask), total
    )

    beam_scores = jnp.tile(jnp.array([0.0] + [NEG_INF] * (nb - 1), jnp.float32), (b,))  # [B*nb]
    generated0 = jnp.full((b * nb, cfg.max_new_tokens), cfg.pad_token_id, jnp.int32)
    done0 = jnp.zeros((b * nb,), bool)
    lengths0 = jnp.zeros((b * nb,), jnp.int32)

    vocab = llm_cfg.vocab_size

    def body(carry, t):
        cache, logits, scores, generated, done, lengths, full_mask = carry
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)  # [B*nb, V]
        # done beams: only pad continues, with score unchanged
        pad_only = jnp.full((vocab,), NEG_INF).at[cfg.pad_token_id].set(0.0)
        logp = jnp.where(done[:, None], pad_only[None, :], logp)
        cand = scores[:, None] + logp  # [B*nb, V]
        cand = cand.reshape(b, nb * vocab)
        top_scores, top_idx = jax.lax.top_k(cand, nb)  # [B, nb]
        beam_idx = top_idx // vocab          # which source beam
        token = (top_idx % vocab).astype(jnp.int32)

        flat_src = (jnp.arange(b)[:, None] * nb + beam_idx).reshape(-1)  # [B*nb]
        token = token.reshape(-1)
        scores = top_scores.reshape(-1)

        # reorder beam state
        generated = generated[flat_src]
        done = done[flat_src]
        lengths = lengths[flat_src]
        cache = jax.tree.map(lambda c: c[flat_src], cache)
        full_mask = full_mask[flat_src]

        generated = jax.lax.dynamic_update_slice(generated, token[:, None], (0, t))
        newly_done = (token == cfg.eos_token_id) if cfg.eos_token_id is not None else jnp.zeros_like(done)
        lengths = jnp.where(done, lengths, t + 1)
        done = done | newly_done

        emb = dec.embed(params, llm_cfg, token[:, None]).astype(inputs_embeds.dtype)
        full_mask = jax.lax.dynamic_update_slice(
            full_mask, jnp.ones((b * nb, 1), jnp.int32), (0, p + t)
        )
        positions = (last_pos + 1 + t)[:, None]
        hidden, cache = dec.forward(
            params, llm_cfg, inputs_embeds=emb, attention_mask=full_mask,
            positions=positions, cache=cache, q_offset=p + t,
        )
        logits = dec.logits(params, llm_cfg, hidden[:, -1:, :])[:, 0]
        return (cache, logits, scores, generated, done, lengths, full_mask), None

    carry = (cache, logits, beam_scores, generated0, done0, lengths0, full_mask)
    (cache, logits, scores, generated, done, lengths, full_mask), _ = jax.lax.scan(
        body, carry, jnp.arange(cfg.max_new_tokens)
    )

    # finalize: score / length^length_penalty, pick best beam per batch
    lengths = jnp.where(done, lengths, cfg.max_new_tokens)
    final = scores / jnp.power(jnp.maximum(lengths, 1).astype(jnp.float32), cfg.length_penalty)
    final = final.reshape(b, nb)
    best = jnp.argmax(final, axis=-1)
    generated = generated.reshape(b, nb, -1)
    return jnp.take_along_axis(generated, best[:, None, None], axis=1)[:, 0]


# ---------------------------------------------------------------------------- public API


def generate(
    params,          # decoder params (the ``llm`` subtree of a VLM param tree)
    llm_cfg,
    inputs_embeds,   # [B, P, D] embedding prefix (visual, or visual+question)
    attention_mask,  # [B, P] — left-padded: last slot must be a valid token
    cfg: GenerationConfig,
    key=None,
):
    """Returns generated token ids [B, max_new_tokens] (pad after EOS)."""
    if key is None:
        key = jax.random.key(0)
    if cfg.num_beams > 1:
        return _generate_beam(params, llm_cfg, inputs_embeds, attention_mask, cfg, key)
    return _generate_sample(params, llm_cfg, inputs_embeds, attention_mask, cfg, key)
