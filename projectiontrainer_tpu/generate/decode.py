"""Jitted autoregressive generation from embedding prefixes with a static KV cache.

Powers every reference inference path (SURVEY §3.4): Stage-1 caption generation from
visual-only embeds (Stage1/inference_stage1.py:176-186), Stage-2 VQA generation from
[visual; question] embeds (Stage2/inference_vqa_stage2.py:271-277), and in-training eval
generation (Stage2/trainer.py:596-626, left-padding forced at :499-505).

TPU-first design:
- the KV cache is SPLIT (ops/decode_attention.py): a per-sample prefix cache [B, P]
  written once at prefill and never reordered, plus a per-row generated cache
  [B*beams, G]. One compilation per (prefix bucket, max_new) pair — no dynamic shapes;
- decode is a ``lax.while_loop`` over steps; done-sequences keep writing pad;
- the prefix is *embeddings* (there may be no prompt ids at all), with left-padded masks
  so the last prefix slot is always the last valid token;
- samplers: greedy, temperature/top-k/top-p sampling with repetition penalty (HF
  semantics), and beam search — deterministic or beam-multinomial (``do_sample`` with
  ``num_beams>1``, the reference's default eval/inference config) — with the processors
  and warpers applied inside the beam loop and HF live/finished-hypothesis semantics.
"""

from __future__ import annotations

import dataclasses
import functools
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
    # Opt-in: use jax.lax.approx_max_k for the per-beam top-k candidate scan in
    # SAMPLED beam search (the one exact top-k over the full vocab per step). TPU's
    # approximate top-k is several times faster at large vocabs; recall ~0.95 means a
    # tail candidate can occasionally be missed — acceptable for sampling (the path is
    # stochastic anyway), NOT used for deterministic beam search, whose HF parity is
    # exact. Default off so every decode reproduces HF semantics bit-for-bit.
    approx_top_k: bool = False


# ---------------------------------------------------------------------------- logit ops


def _apply_repetition_penalty(logits, generated, penalty):
    """HF semantics: previously generated token logits are divided by the penalty when
    positive, multiplied when negative. ``generated`` is [B, L] with pad slots = -1.

    Implemented as an O(B·L) boolean scatter — the one-hot formulation materializes
    [B, L, V] (1.6 GB/step at a 262k vocab inside the decode loop)."""
    if penalty == 1.0:
        return logits
    b, v = logits.shape
    rows = jnp.broadcast_to(jnp.arange(b)[:, None], generated.shape)
    seen = jnp.zeros((b, v), bool).at[rows, jnp.maximum(generated, 0)].max(generated >= 0)
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen, penalized, logits)


def _top_p_filter(logits, p, *, k_hint: Optional[int] = None):
    """Nucleus filter. ``k_hint`` is the number of non-NEG_INF entries a preceding
    top-k filter left per row: sorting those k values (via lax.top_k, which returns
    them sorted) is exact and avoids a full-vocab sort in the decode loop — at a 262k
    vocab the full sort dominates the per-token step time."""
    if k_hint is not None and k_hint < logits.shape[-1]:
        sorted_logits, _ = jax.lax.top_k(logits, k_hint)
    else:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep smallest set with cumulative prob >= p (always keep the top token)
    keep_sorted = cum - probs < p
    cutoff_idx = jnp.sum(keep_sorted, axis=-1) - 1
    cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx[..., None], axis=-1)
    return jnp.where(logits < cutoff, NEG_INF, logits)


def _top_p_on_sorted(sorted_vals, p):
    """Nucleus filter applied to a descending-sorted (compact) score set — identical
    cutoff semantics to :func:`_top_p_filter` (entries equal to the cutoff survive)."""
    probs = jax.nn.softmax(sorted_vals, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    keep = cum - probs < p
    cutoff_idx = jnp.sum(keep, axis=-1) - 1
    cutoff = jnp.take_along_axis(sorted_vals, cutoff_idx[..., None], axis=-1)
    return jnp.where(sorted_vals < cutoff, NEG_INF, sorted_vals)


def _sample_token(logits, cfg: GenerationConfig, generated, key):
    logits = logits.astype(jnp.float32)
    logits = _apply_repetition_penalty(logits, generated, cfg.repetition_penalty)
    if not cfg.do_sample:
        return jnp.argmax(logits, axis=-1)
    if cfg.temperature != 1.0:
        logits = logits / cfg.temperature
    if cfg.top_k:
        # compact path: one top-k, then nucleus + categorical on [B, k] instead of the
        # full vocab (the per-step full-width ops dominate decode at a 262k vocab)
        k = min(cfg.top_k, logits.shape[-1])
        vals, vidx = jax.lax.top_k(logits, k)
        if cfg.top_p is not None and cfg.top_p < 1.0:
            vals = _top_p_on_sorted(vals, cfg.top_p)
        choice = jax.random.categorical(key, vals, axis=-1)
        return jnp.take_along_axis(vidx, choice[:, None], axis=-1)[:, 0]
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


def _cache_pad() -> int:
    """Prefix/generated cache length padding. The Pallas decode kernel needs
    128-multiple lengths (padded slots are masked, never attended); exact shapes
    elsewhere — the XLA fallback takes any length."""
    return 128 if jax.default_backend() == "tpu" else 1


# ---------------------------------------------------------------------------- greedy/sample


def _generate_sample(params, llm_cfg, inputs_embeds, attention_mask, cfg, key,
                     *, with_stats: bool = False):
    b, p, _ = inputs_embeds.shape
    cache, logits, last_pos, _ = _prefill(
        params, llm_cfg, inputs_embeds, attention_mask, p
    )
    cache, pmask = dec.split_cache(
        cache, llm_cfg, b, cfg.max_new_tokens,
        prefix_mask=attention_mask, pad_to=_cache_pad(),
    )

    generated0 = jnp.full((b, cfg.max_new_tokens), -1, jnp.int32)
    done0 = jnp.zeros((b,), bool)

    def cond(carry):
        t = carry[0]
        done = carry[4]
        # early exit once every sequence hit EOS (HF `this_peer_finished`): done rows
        # only write pad, so stopping early is output-identical and skips the
        # remaining decoder steps entirely.
        return (t < cfg.max_new_tokens) & ~jnp.all(done)

    def body(carry):
        t, cache, logits, generated, done, key = carry
        key, sub = jax.random.split(key)
        token = _sample_token(logits, cfg, generated, sub).astype(jnp.int32)
        if cfg.eos_token_id is not None:
            token = jnp.where(done, cfg.pad_token_id, token)
        generated = jax.lax.dynamic_update_slice(generated, token[:, None], (0, t))
        if cfg.eos_token_id is not None:
            done = done | (token == cfg.eos_token_id)

        # next step forward (split cache: q_offset = decode step t, prefix mask static)
        emb = dec.embed(params, llm_cfg, token[:, None]).astype(inputs_embeds.dtype)
        positions = (last_pos + 1 + t)[:, None]
        hidden, cache = dec.forward(
            params, llm_cfg, inputs_embeds=emb, attention_mask=pmask,
            positions=positions, cache=cache, q_offset=t, prefix_len=p,
        )
        logits = dec.logits(params, llm_cfg, hidden[:, -1:, :])[:, 0]
        return (t + 1, cache, logits, generated, done, key)

    carry = (jnp.zeros((), jnp.int32), cache, logits, generated0, done0, key)
    steps_taken, cache, logits, generated, done, key = jax.lax.while_loop(
        cond, body, carry
    )
    # replace the -1 "unwritten" sentinel (rows stopped early / shouldn't remain)
    out = jnp.where(generated < 0, cfg.pad_token_id, generated)
    return (out, steps_taken) if with_stats else out


# ---------------------------------------------------------------------------- beam search


def _reorder_cache(cache, flat_src, *, naive: bool = False):
    """Reorder the GENERATED caches to follow beam selection.

    With the split prefix/generated cache (ops/decode_attention.py) only the small
    ``kg``/``vg`` leaves ([B*beams, G]) carry per-beam rows — the shared prefix cache
    is per-sample and never reordered, which is the structural fix for the full-cache
    gather the monolithic layout paid every step. The gather is additionally SKIPPED
    entirely (``lax.cond``) on steps where every beam continues its own row — the
    common case once beams stabilize (measured on the monolithic layout: 6.44s vs
    6.60s p50). ``naive=True`` keeps the unconditional gather for parity tests and as
    the bench baseline.
    """

    def gather(c):
        return [
            {**layer,
             "kg": jnp.take(layer["kg"], flat_src, axis=0),
             "vg": jnp.take(layer["vg"], flat_src, axis=0)}
            for layer in c
        ]

    if naive:
        return gather(cache)
    identity = jnp.all(flat_src == jnp.arange(flat_src.shape[0]))
    return jax.lax.cond(identity, lambda c: c, gather, cache)


def _generate_beam(params, llm_cfg, inputs_embeds, attention_mask, cfg, key,
                   *, naive_reorder: bool = False, with_stats: bool = False):
    """Beam search with the full HF decoding surface inside the loop.

    Matches HF ``GenerationMixin._beam_search`` semantics (the reference's default eval
    and inference config passes ``do_sample=True, num_beams=3`` together with
    temperature/top-k/top-p/repetition_penalty — Stage2/trainer.py:604-614,
    Stage2/inference_vqa_stage2.py:428-437):

    - scores are log-softmax'd logits; the repetition penalty (a logits *processor*)
      applies to them against each beam's own generated ids (the prompt is an embedding
      prefix, so — exactly like HF generate from ``inputs_embeds`` with no prompt ids —
      only generated tokens are penalized);
    - when ``do_sample``, the *warpers* (temperature → top-k → top-p) apply next, and the
      2·nb successor candidates are drawn WITHOUT replacement from
      softmax(beam_score + warped_scores) over the flattened nb·V candidates via the
      Gumbel-top-k trick (the jit-friendly equivalent of ``torch.multinomial``), then
      sorted by true score like HF; deterministic beam search takes top-k instead;
    - EOS candidates ranked within the top nb move to a per-batch finished set of nb
      hypotheses scored ``sum_logprob / len^length_penalty`` with ``len`` INCLUDING the
      just-generated EOS — HF's vectorized ``_update_finished_beams`` divides by
      ``cur_len + 1 - decoder_prompt_len`` = t + 1 generated tokens at step t; live
      beams continue from the best non-EOS candidates;
    - finalization inserts the surviving live beams (penalized at ``max_new_tokens``)
      and returns each batch's best hypothesis — HF ``BeamSearchScorer.finalize``.
    """
    b, p, d = inputs_embeds.shape
    nb = cfg.num_beams
    max_new = cfg.max_new_tokens
    vocab = llm_cfg.vocab_size
    k2 = 2 * nb

    # Prefill ONCE per sample: every beam of a batch shares the identical prefix, so
    # running the [B*nb]-row prefix through the decoder (as HF does via
    # `expand_inputs_for_generation`) recomputes the same attention nb times. The split
    # cache keeps the prefix at B rows for the WHOLE decode — beams never get their own
    # prefix copy at all (exact; at the reference config — 831-token prefix, 3 beams,
    # an 8B decoder — this removes 2/3 of the prefill FLOPs the reference pays at
    # Stage2/inference_vqa_stage2.py:271-277, and 2/3 of the per-step cache reads).
    def expand(x):
        return jnp.repeat(x, nb, axis=0)

    cache, logits, last_pos, _ = _prefill(
        params, llm_cfg, inputs_embeds, attention_mask, p
    )
    cache, pmask = dec.split_cache(
        cache, llm_cfg, b * nb, max_new,
        prefix_mask=attention_mask, pad_to=_cache_pad(),
    )
    logits, last_pos = expand(logits), expand(last_pos)

    # after prefill every beam of a batch is identical: only beam 0 may win step 0
    live_scores0 = jnp.tile(jnp.array([0.0] + [NEG_INF] * (nb - 1), jnp.float32), (b, 1))
    live_gen0 = jnp.full((b, nb, max_new), -1, jnp.int32)   # -1 sentinel = unwritten
    fin_scores0 = jnp.full((b, nb), NEG_INF, jnp.float32)
    fin_gen0 = jnp.full((b, nb, max_new), -1, jnp.int32)

    def cond(carry):
        t = carry[0]
        heur_unsat = carry[-1]
        # HF `_beam_search_has_unfinished_sequences`: halt when NO batch can still
        # improve on its finished set (early_stopping=False heuristic, the
        # reference's setting) — this is what cuts wasted decode steps at the
        # reference inference config (1024 new tokens, 3 beams).
        return (t < max_new) & jnp.any(heur_unsat)

    def body(carry):
        (t, cache, logits, live_scores, live_gen, fin_scores, fin_gen,
         key, heur_unsat) = carry
        key, sub = jax.random.split(key)

        scores = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)  # [B*nb, V]
        scores = _apply_repetition_penalty(
            scores, live_gen.reshape(b * nb, max_new), cfg.repetition_penalty
        )
        if cfg.do_sample and cfg.top_k:
            # compact candidate set: ONE top-k per beam, then warp/gumbel/select on
            # [B, nb*k] instead of [B, nb*V] — exact (filtered entries could never be
            # selected) and much cheaper per step at a 262k vocab
            if cfg.temperature != 1.0:
                scores = scores / cfg.temperature
            k = min(cfg.top_k, vocab)
            if cfg.approx_top_k and k < vocab:
                vals, vidx = jax.lax.approx_max_k(scores, k)  # [B*nb, k] sorted desc
                vidx = vidx.astype(jnp.int32)
            else:
                vals, vidx = jax.lax.top_k(scores, k)        # [B*nb, k] sorted desc
            if cfg.top_p is not None and cfg.top_p < 1.0:
                vals = _top_p_on_sorted(vals, cfg.top_p)
            cand = (vals + live_scores.reshape(-1)[:, None]).reshape(b, nb * k)
            gumbel = jax.random.gumbel(sub, cand.shape)
            _, top_cidx = jax.lax.top_k(cand + gumbel, k2)   # sample w/o replacement
            top_scores = jnp.take_along_axis(cand, top_cidx, axis=-1)
            order = jnp.argsort(-top_scores, axis=-1)        # HF sorts sampled by score
            top_scores = jnp.take_along_axis(top_scores, order, axis=-1)
            top_cidx = jnp.take_along_axis(top_cidx, order, axis=-1)
            src = top_cidx // k                              # [B, 2nb] source beam
            flat_rows = jnp.arange(b)[:, None] * nb + src
            tok = vidx[flat_rows, top_cidx % k].astype(jnp.int32)
        else:
            if cfg.do_sample:
                if cfg.temperature != 1.0:
                    scores = scores / cfg.temperature
                if cfg.top_p is not None and cfg.top_p < 1.0:
                    scores = _top_p_filter(scores, cfg.top_p)
            cand = (scores + live_scores.reshape(-1)[:, None]).reshape(b, nb * vocab)
            if cfg.do_sample:
                gumbel = jax.random.gumbel(sub, cand.shape)
                _, top_idx = jax.lax.top_k(cand + gumbel, k2)
                top_scores = jnp.take_along_axis(cand, top_idx, axis=-1)
                order = jnp.argsort(-top_scores, axis=-1)
                top_scores = jnp.take_along_axis(top_scores, order, axis=-1)
                top_idx = jnp.take_along_axis(top_idx, order, axis=-1)
            else:
                top_scores, top_idx = jax.lax.top_k(cand, k2)    # [B, 2nb]
            src = top_idx // vocab
            tok = (top_idx % vocab).astype(jnp.int32)
        if cfg.eos_token_id is not None:
            is_eos = tok == cfg.eos_token_id
        else:
            is_eos = jnp.zeros(tok.shape, bool)

        # -------- finished set: EOS candidates ranked within the top nb are stored
        # with score / len^lp, len INCLUDING the just-generated EOS — HF's vectorized
        # `_update_finished_beams` divides by (cur_len + 1 - decoder_prompt_len),
        # which is t + 1 generated tokens at 0-indexed step t
        gen_len = (t + 1).astype(jnp.float32)
        ins_mask = is_eos & (jnp.arange(k2) < nb)[None, :]
        # once a batch's early-stop heuristic is satisfied its finished set is frozen
        # (HF `_update_finished_beams`: `+ ~is_early_stop_heuristic_unsatisfied * -1e9`)
        ins_mask = ins_mask & heur_unsat[:, None]
        ins_scores = jnp.where(
            ins_mask, top_scores / jnp.power(gen_len, cfg.length_penalty), NEG_INF
        )
        cand_gen = jnp.take_along_axis(live_gen, src[..., None], axis=1)  # [B, 2nb, L]
        cand_gen = jax.lax.dynamic_update_slice(cand_gen, tok[..., None], (0, 0, t))
        all_scores = jnp.concatenate([fin_scores, ins_scores], axis=1)
        all_gen = jnp.concatenate([fin_gen, cand_gen], axis=1)
        fin_scores, fidx = jax.lax.top_k(all_scores, nb)
        fin_gen = jnp.take_along_axis(all_gen, fidx[..., None], axis=1)

        # -------- live continuation: best nb non-EOS candidates
        live_cand = jnp.where(is_eos, NEG_INF, top_scores)
        live_scores, lidx = jax.lax.top_k(live_cand, nb)     # [B, nb]
        live_src = jnp.take_along_axis(src, lidx, axis=-1)
        live_tok = jnp.take_along_axis(tok, lidx, axis=-1)
        live_gen = jnp.take_along_axis(live_gen, live_src[..., None], axis=1)
        live_gen = jax.lax.dynamic_update_slice(live_gen, live_tok[..., None], (0, 0, t))

        flat_src = (jnp.arange(b)[:, None] * nb + live_src).reshape(-1)  # [B*nb]
        cache = _reorder_cache(cache, flat_src, naive=naive_reorder)
        # the prefix cache/mask and last_pos are beam-invariant — no reorder needed.

        token = live_tok.reshape(-1)
        emb = dec.embed(params, llm_cfg, token[:, None]).astype(inputs_embeds.dtype)
        positions = (last_pos + 1 + t)[:, None]
        hidden, cache = dec.forward(
            params, llm_cfg, inputs_embeds=emb, attention_mask=pmask,
            positions=positions, cache=cache, q_offset=t, prefix_len=p,
        )
        logits = dec.logits(params, llm_cfg, hidden[:, -1:, :])[:, 0]

        # -------- early-stop heuristic (HF `_check_early_stop_heuristic`,
        # early_stopping=False): the best running beam, scored at the CURRENT
        # generated length, must still beat the worst finished hypothesis for the
        # batch to keep improving. Monotone (&=): once satisfied, stays satisfied.
        cur_gen_len = (t + 1).astype(jnp.float32)
        best_possible = live_scores[:, 0] / jnp.power(cur_gen_len, cfg.length_penalty)
        worst_finished = jnp.min(fin_scores, axis=-1)  # NEG_INF while any slot empty
        heur_unsat = heur_unsat & (best_possible > worst_finished)

        return (t + 1, cache, logits, live_scores, live_gen, fin_scores, fin_gen,
                key, heur_unsat)

    heur_unsat0 = jnp.ones((b,), bool)
    carry = (jnp.zeros((), jnp.int32), cache, logits, live_scores0, live_gen0,
             fin_scores0, fin_gen0, key, heur_unsat0)
    (steps_taken, cache, logits, live_scores, live_gen, fin_scores, fin_gen,
     key, heur_unsat) = jax.lax.while_loop(cond, body, carry)

    # finalize: surviving live beams enter the finished set penalized at max_new
    # tokens — but ONLY for batches that ran to max_new (heuristic still
    # unsatisfied). A heuristic-stopped batch's finished set is frozen in HF
    # (`_update_finished_beams` masks insertions), so its live beams must not
    # compete here either: with lp > 1 a live beam divided by the larger max_new
    # length could otherwise overtake the finished winner HF returns.
    live_final = jnp.where(
        heur_unsat[:, None],
        live_scores / jnp.power(jnp.asarray(max_new, jnp.float32), cfg.length_penalty),
        NEG_INF,
    )
    all_scores = jnp.concatenate([fin_scores, live_final], axis=1)
    all_gen = jnp.concatenate([fin_gen, live_gen], axis=1)
    best = jnp.argmax(all_scores, axis=-1)
    out = jnp.take_along_axis(all_gen, best[:, None, None], axis=1)[:, 0]
    out = jnp.where(out < 0, cfg.pad_token_id, out)
    return (out, steps_taken) if with_stats else out


# ---------------------------------------------------------------------------- public API


@functools.partial(
    jax.jit, static_argnames=("llm_cfg", "cfg", "naive_cache_reorder")
)
def _generate_compiled(params, llm_cfg, inputs_embeds, attention_mask, cfg, key,
                       naive_cache_reorder=False):
    if cfg.num_beams > 1:
        return _generate_beam(params, llm_cfg, inputs_embeds, attention_mask, cfg, key,
                              naive_reorder=naive_cache_reorder)
    return _generate_sample(params, llm_cfg, inputs_embeds, attention_mask, cfg, key)


def generate(
    params,          # decoder params (the ``llm`` subtree of a VLM param tree)
    llm_cfg,
    inputs_embeds,   # [B, P, D] embedding prefix (visual, or visual+question)
    attention_mask,  # [B, P] — left-padded: last slot must be a valid token
    cfg: GenerationConfig,
    key=None,
    *,
    naive_cache_reorder: bool = False,  # full-cache gather per beam step (bench/debug)
):
    """Returns generated token ids [B, max_new_tokens] (pad after EOS).

    Jitted HERE, at the public boundary (configs are frozen dataclasses — static
    args; one compile per (shape, config) pair): callers like the inference CLIs
    and the serving worker must not pay eager per-op dispatch for the prefill +
    decode loop — measured 4.7 s/sample eager vs ~0.1 s jitted at max_new=64 on
    the tunneled v5e, the whole gap being host round-trips. Callers that wrap
    generate in their own jit (bench, dryrun) simply inline this one."""
    if key is None:
        key = jax.random.key(0)
    return _generate_compiled(params, llm_cfg, inputs_embeds, attention_mask, cfg,
                              key, naive_cache_reorder=naive_cache_reorder)
